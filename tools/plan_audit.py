"""Plan audit: explain('formatted') every driver query and flag anti-patterns.

Checks per query:
  * row-at-a-time Python (BatchEvalPython) anywhere           -> FLAG
  * CartesianProduct / BroadcastNestedLoopJoin                -> FLAG
    (allowed only where the operator is an intended exact baseline or a
     broadcast of a tiny literal side — listed in ALLOW_NESTED)
  * parquet scans reading all columns when the query projects few
    (ReadSchema with > MAX_SCAN_COLS fields)                   -> FLAG
  * number of Exchanges (shuffles) reported per query

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

# intended nested-loop / cross joins: exact brute-force baselines and
# broadcast-literal probes
ALLOW_NESTED = {
    "similarity_bruteforce_topk",   # the documented exact baseline
    "similarity_recall_at_k",       # embeds the exact baseline as truth
    "similarity_ivf_topk",          # crossJoin(broadcast(sqrt(N) centroids))
    "s2_rect_distance",             # 3 literal query rects
    "s2_cap_query",                 # 3 literal query caps
    "s2_rect_query",                # 3 literal query rects
    "s2_polyline_project",          # 1 literal polyline
    "s2_polyline_length",           # 1 literal polyline
}
MAX_SCAN_COLS = 6


def audit(sf_dir: str, names=None) -> int:
    from s2spark.plans.session import build_session
    import __spark_entry__ as entry

    # console progress bar writes \r-terminated frames that overwrite the
    # interleaved report lines in captured output — disable it, and buffer
    # every report line so the full 48-line table prints atomically at the
    # end (exit code stays authoritative either way)
    spark = build_session(master="local[8]", shuffle_partitions=8,
                          **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    bad = 0
    lines = []
    for name, fn in qs.items():
        if names and name not in names:
            continue
        df = fn(spark, sf_dir)
        # streaming queries attach the last micro-batch's physical plan
        # (the memory-sink table the callable returns is just a local
        # scan; the attached plan is the stream-static join we must audit)
        plan = getattr(df, "_s2spark_stream_plan", None)
        streaming = plan is not None
        if plan is None:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        flags = []
        if "BatchEvalPython" in plan:
            flags.append("row-Python UDF (BatchEvalPython)")
        nested = ("CartesianProduct" in plan
                  or "BroadcastNestedLoopJoin" in plan)
        if nested and name not in ALLOW_NESTED:
            flags.append("unintended nested-loop join")
        n_exchange = plan.count("Exchange")
        wide_scans = [m for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
                      if m.count(",") + 1 > MAX_SCAN_COLS]
        if wide_scans:
            flags.append(f"wide scan ({wide_scans[0].count(',') + 1} cols)")
        arrow = plan.count("ArrowEvalPython") + plan.count("FlatMapGroupsInPandas") \
            + plan.count("MapInPandas") + plan.count("FlatMapCoGroupsInPandas")
        status = "FLAG" if flags else "ok"
        if flags:
            bad += 1
        lines.append(
            f"{status:5} {name}: exchanges={n_exchange} arrow_stages={arrow}"
            + (" (streaming plan)" if streaming else "")
            + (f"  [{'; '.join(flags)}]" if flags else ""))
    spark.stop()
    sys.stdout.write("\n".join(lines) + "\n")
    sys.stdout.flush()
    return bad


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(1 if audit(sf, set(sys.argv[2:]) or None) else 0)

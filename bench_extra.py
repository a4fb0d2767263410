"""Auxiliary benchmark for optimization work (bench.py is FROZEN for
measurement; this file exists so optimization A/Bs can cite stable numbers).

Mirrors bench.py's query-phase methodology exactly — same session config,
same xxhash64-over-all-columns forcing aggregate, same per-query
release_session_state hygiene — but times each query REPEATS times
(fresh DataFrame construction each time, matching the driver's
construct+execute window) and reports cold (first) and min-of-N.

Usage: python bench_extra.py [repeats] [query ...]
Prints one JSON line: {"queries": {name: {"cold": s, "min": s, "all": [...]}},
"sum_cold": s, "sum_min": s}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = sys.argv[2:]

    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from s2spark.plans.session import build_session, release_session_state

    qs = entry.queries()
    names = only if only else list(__import__("bench").BENCH_QUERIES)
    spark = build_session(master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs["s2_tile_counts"](spark, SF_DIR).collect()   # session warm-up

    out = {}
    for i, name in enumerate(names):
        times = []
        for r in range(repeats):
            try:
                release_session_state(spark)
            except Exception:   # noqa: BLE001
                pass
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.agg(F.sum(F.xxhash64(*[F.col(c) for c in df.columns])
                         .cast("long"))).collect()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"cold": times[0], "min": min(times), "all": times}
        print(f"[{i + 1}/{len(names)}] {name}: cold={times[0]} "
              f"min={min(times)} all={times}", file=sys.stderr, flush=True)
    spark.stop()
    res = {"queries": out,
           "sum_cold": round(sum(v["cold"] for v in out.values()), 2),
           "sum_min": round(sum(v["min"] for v in out.values()), 2),
           "sf": SF_DIR, "repeats": repeats}
    print(json.dumps(res))


if __name__ == "__main__":
    main()

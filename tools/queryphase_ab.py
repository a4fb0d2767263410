"""Replicate bench.py's query phase with and without per-query release.

Usage: python tools/queryphase_ab.py {release|norelease} [sf_dir]
Prints one JSON line {"mode": ..., "total": s, "queries": {...}}.
Mirrors bench.py's timing loop exactly (same order, same xxhash64
materialization, warm-up query, ERROR isolation) so the two modes are
directly comparable to each other and to BENCH artifacts.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

MODE = sys.argv[1]
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

import bench  # noqa: E402  (BENCH_QUERIES, CPUS)
import __spark_entry__ as entry  # noqa: E402
from s2spark.plans.session import build_session, release_session_state  # noqa: E402


def main():
    qs = entry.queries()
    spark = build_session(master=f"local[{bench.CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs["s2_tile_counts"](spark, SF).collect()
    from pyspark.sql import functions as F
    timings = {}
    for i, name in enumerate(bench.BENCH_QUERIES):
        t0 = time.time()
        df = qs[name](spark, SF)
        df.agg(F.sum(F.xxhash64(*[F.col(c) for c in df.columns])
                     .cast("long"))).collect()
        timings[name] = round(time.time() - t0, 3)
        print(f"[{MODE} {i+1}/{len(bench.BENCH_QUERIES)}] {name}: "
              f"{timings[name]}s", file=sys.stderr, flush=True)
        if MODE == "release":
            release_session_state(spark)
    spark.stop()
    print(json.dumps({"mode": MODE, "total": round(sum(timings.values()), 1),
                      "queries": timings}))


if __name__ == "__main__":
    main()

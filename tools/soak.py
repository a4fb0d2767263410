"""Flagship-pipeline soak: the 16M-page / 32-core configuration that
BENCH/BASELINE.md's ~250k pages/sec claim references, recorded as a
reproducible artifact (exact command + JSON) instead of a prose number.

Runs bench._run_pipeline (synthesize -> mine -> encode -> broadcast
spatial join -> tile agg) at S2SPARK_SOAK_PAGES (default 16M) on
local[S2SPARK_SOAK_CPUS] (default 32) with AQE on (the build_session
default), after one warm-up, and reports wall time, throughput, driver
peak RSS, and the AQE/shuffle confs in effect — confirming memory
headroom and AQE behavior at 4x the scaling-bench row count.

Usage:  python tools/soak.py            # writes JSON to stdout
Repro:  S2SPARK_SOAK_PAGES=16000000 S2SPARK_SOAK_CPUS=32 python tools/soak.py
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = int(os.environ.get("S2SPARK_SOAK_PAGES", "16000000"))
CPUS = int(os.environ.get("S2SPARK_SOAK_CPUS", "32"))


def main() -> None:
    import bench
    from s2spark.plans.session import build_session

    spark = build_session(app_name="s2spark-soak", master=f"local[{CPUS}]",
                          shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    confs = {k: spark.conf.get(k) for k in (
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.shuffle.partitions",
        "spark.driver.memory",
    ) if _has(spark, k)}

    bench._run_pipeline(spark, 50_000)          # warm-up: JIT/Arrow/broadcast
    t0 = time.time()
    matched = bench._run_pipeline(spark, N_PAGES)
    wall = time.time() - t0
    peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    exec_mem = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    jvm_used_mb = (rt.totalMemory() - rt.freeMemory()) / (1024.0 * 1024.0)
    jvm_max_mb = rt.maxMemory() / (1024.0 * 1024.0)
    spark.stop()

    print(json.dumps({
        "what": "flagship pipeline soak (synthesize->mine->encode->join->tile)",
        "command": f"S2SPARK_SOAK_PAGES={N_PAGES} S2SPARK_SOAK_CPUS={CPUS} "
                   "python tools/soak.py",
        "pages": N_PAGES,
        "cores": CPUS,
        "wall_sec": round(wall, 2),
        "pages_per_sec": round(N_PAGES / wall, 1),
        "matched_rows": int(matched),
        "driver_peak_rss_mb": round(peak_rss_mb, 1),
        "jvm_heap_used_mb": round(jvm_used_mb, 1),
        "jvm_heap_max_mb": round(jvm_max_mb, 1),
        "n_executors": int(exec_mem),
        "confs": confs,
    }))


def _has(spark, key: str) -> bool:
    try:
        spark.conf.get(key)
        return True
    except Exception:   # noqa: BLE001 — unset conf
        return False


if __name__ == "__main__":
    main()

"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], plus a two-parallelism scaling run of the flagship
spatial-join+tiling pipeline (north_rule: throughput at N vs 4N cores with
scaling efficiency >= 0.8, evidenced with local[N] vs local[4N]).

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "pipeline": {...scaling numbers...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PAGES_ROWS = int(os.environ.get("S2SPARK_BENCH_PAGES", "8000000"))

# headline operator queries timed on the shared session
BENCH_QUERIES = [
    "s2_encode_tokens", "s2_tile_counts", "s2_tile_topk", "s2_cell_topology",
    "s2_point_in_polygon", "s2_containment_ranges",
    "dedup_exact", "dedup_minhash_signatures", "dedup_simhash",
    "text_quality", "text_langid", "text_fingerprint",
    "similarity_bruteforce_topk", "similarity_lsh_topk",
    "relational_revenue_by_nation", "events_daily_agg",
]


def _run_pipeline(spark, n_pages: int) -> int:
    """Flagship pipeline: synthesize pages -> mine -> encode -> spatial join
    -> tile counts.  Returns matched-row count (forces execution)."""
    from pyspark.sql import functions as F

    from s2spark.functions import columns as C
    from s2spark.operators.spatial_join import points_with_cells, spatial_join
    from s2spark.sources.fixtures import make_polygon
    from s2spark.sources.pages import mine_coordinates, synthesize_pages

    pages = synthesize_pages(spark, n_pages)
    pts = points_with_cells(mine_coordinates(pages))
    joined = spatial_join(
        spark, pts.select("url", "lat", "lng", "cell_id", "x", "y", "z"),
        {1: make_polygon("-4:-4, -4:4, 4:4, 4:-4;"),
         2: make_polygon("48.5:2.0, 48.5:2.7, 49.2:2.7, 49.2:2.0;"),
         3: make_polygon("-40:-40, -40:40, 40:40, 40:-40;")})
    tiles = (joined.withColumn("tile_id", C.parent_for_level(F.col("cell_id"), 10))
             .groupBy("polygon_id", "tile_id").agg(F.count(F.lit(1)).alias("n")))
    return tiles.agg(F.sum("n")).collect()[0][0]


def _scaling_run(n_pages: int) -> dict:
    """Run the flagship pipeline at local[N] and local[4N]; report pages/sec
    and scaling efficiency (perfect scaling => 4x throughput => eff 1.0)."""
    from s2spark.plans.session import build_session

    out = {}
    small = max(1, CPUS // 4)
    for label, cores in (("n_cores", small), ("n4_cores", CPUS)):
        spark = build_session(app_name=f"bench-{cores}", master=f"local[{cores}]",
                              shuffle_partitions=2 * cores)
        spark.sparkContext.setLogLevel("ERROR")
        _run_pipeline(spark, 50_000)  # warm-up: JIT + Arrow + broadcast paths
        t0 = time.time()
        matched = _run_pipeline(spark, n_pages)
        dt = time.time() - t0
        out[label] = {"cores": cores, "sec": round(dt, 3),
                      "pages_per_sec": round(n_pages / dt, 1),
                      "matched_rows": int(matched)}
        spark.stop()
    tp_small = out["n_cores"]["pages_per_sec"]
    tp_big = out["n4_cores"]["pages_per_sec"]
    ratio = CPUS / small
    out["scaling_efficiency"] = round(tp_big / (tp_small * ratio), 3)
    out["pages"] = n_pages
    return out


def main() -> None:
    from s2spark.plans.session import build_session
    import __spark_entry__ as entry

    qs = entry.queries()
    timings = {}
    spark = build_session(master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    # warm up the session (JVM JIT, Arrow init) on a tiny query
    qs["s2_tile_counts"](spark, SF_DIR).collect()
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        del n
    spark.stop()

    pipeline = _scaling_run(PAGES_ROWS)

    result = {
        "metric": "s2 spatial-join + tiling throughput and operator latencies",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "pipeline": pipeline,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Bucketed spatial tables: layout correctness + the shuffle-free plan.

The scale claim being tested is PHYSICAL, not just semantic: a join or
aggregation keyed on the bucket column over a bucketed table must show no
Exchange (shuffle) on the bucketed side in the executed plan.
"""

import pytest
from pyspark.sql import functions as F

from s2spark.functions import columns as C
from s2spark.operators.tiling import tile_counts
from s2spark.sources.bucketed import (TILE_COL, bucketed_tile_counts,
                                      colocated_tile_join, read_bucketed,
                                      with_tile, write_bucketed_points)
from s2spark.operators.spatial_join import points_with_cells
from s2spark.sources.pages import mine_coordinates, synthesize_pages


@pytest.fixture(scope="module")
def spark(tmp_path_factory):
    from s2spark.plans.session import build_session
    wh = str(tmp_path_factory.mktemp("warehouse"))
    s = build_session(app_name="s2spark-bucketed", master="local[4]",
                      shuffle_partitions=8,
                      **{"spark.sql.warehouse.dir": wh,
                         # bucket-join elision needs bucketing enabled (default
                         # true; pinned so the test states its dependency)
                         "spark.sql.sources.bucketing.enabled": "true"})
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="module")
def bucketed(spark):
    pts = points_with_cells(
        mine_coordinates(synthesize_pages(spark, 20000).select("url", "text")))
    write_bucketed_points(pts.select("url", "lat", "lng", "cell_id"),
                          "pts_bucketed", level=6, n_buckets=8)
    return read_bucketed(spark, "pts_bucketed")


def _exchanges_in(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def test_bucketed_roundtrip_matches_source(spark, bucketed):
    pts = points_with_cells(
        mine_coordinates(synthesize_pages(spark, 20000).select("url", "text")))
    src = with_tile(pts.select("url", "cell_id"), 6)
    a = {(r["url"], r["cell_id"], r[TILE_COL]) for r in src.collect()}
    b = {(r["url"], r["cell_id"], r[TILE_COL])
         for r in bucketed.select("url", "cell_id", TILE_COL).collect()}
    assert a == b


def test_bucketed_agg_elides_shuffle(spark, bucketed):
    agg = bucketed_tile_counts(bucketed)
    assert _exchanges_in(agg) == 0, "bucketed groupBy(tile) must not shuffle"
    # and the counts are right (vs a fresh non-bucketed aggregation)
    expect = dict(
        with_tile(bucketed.select("cell_id"), 6)
        .groupBy(TILE_COL).count().collect())
    got = dict(agg.collect())
    assert got == {k: v for k, v in expect.items()}


def test_bucketed_join_shuffles_only_small_side(spark, bucketed):
    tiles = bucketed.select(TILE_COL).distinct().limit(10) \
        .withColumn("tag", F.lit("hot"))
    # break lineage so the probe side isn't itself read from the bucket scan
    tiles = spark.createDataFrame(tiles.collect(), schema=tiles.schema)
    # with a broadcastable probe side Catalyst (correctly) picks a broadcast
    # join and disables bucketed reading; force a sort-merge join to exercise
    # the big-probe-side shape where bucketing is the win
    joined = colocated_tile_join(bucketed.hint("merge"), tiles)
    n = joined.count()  # execute so AQE finalizes the plan
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # exactly one Exchange (the tiles side); zero on the bucketed scan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Bucketed: true" in plan
    m = (with_tile(bucketed.select("cell_id"), 6)
         .join(tiles, TILE_COL).count())
    assert n == m


def test_bucketed_sorted_within_files(spark, bucketed):
    # sortBy(tile_id, cell_id) within buckets -> per-file (and row-group)
    # min/max enables cell-range pruning; verify each parquet FILE is
    # sorted.  (A read partition may pack several sorted files, so the
    # check is per contiguous file run, keyed by input_file_name.)
    def check(it):
        prev_file, prev_key = None, None
        for row in it:
            key = (row[TILE_COL], row["cell_id"])
            if row["__f"] == prev_file and prev_key is not None \
                    and key < prev_key:
                yield (False,)
            prev_file, prev_key = row["__f"], key
        yield (True,)

    flags = (bucketed.select(TILE_COL, "cell_id",
                             F.input_file_name().alias("__f")).rdd
             .mapPartitions(check).collect())
    assert all(f[0] for f in flags)


def test_bucketed_corpus_index_probe_join(spark):
    """The near-dup corpus index written bucketBy(band, bucket) joins with
    arriving batches WITHOUT re-shuffling the index side — the write-once,
    probe-per-batch layout for a planet-scale accepted corpus."""
    from s2spark.operators.dedup import (build_corpus_index,
                                         filter_near_dups_of_corpus)
    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = build_corpus_index(corpus)
    (idx.write.bucketBy(8, "band", "bucket").sortBy("band", "bucket")
     .mode("overwrite").saveAsTable("corpus_idx_bucketed"))
    bidx = spark.table("corpus_idx_bucketed")

    arrivals = (corpus.where(F.col("doc_id") < 100)
                .select((F.col("doc_id") + 10_000).alias("doc_id"), "text"))
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out_b = filter_near_dups_of_corpus(arrivals, bidx)
        out_p = filter_near_dups_of_corpus(arrivals, idx)
        kept_b = sorted(r["doc_id"] for r in out_b.select("doc_id").collect())
        kept_p = sorted(r["doc_id"] for r in out_p.select("doc_id").collect())
        assert kept_b == kept_p  # layout never changes results
        assert _exchanges_in(out_b) < _exchanges_in(out_p), \
            "bucketed index did not elide its shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)

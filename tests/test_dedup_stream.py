"""Streaming exact dedup == batch exact dedup on the same bounded input."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from s2spark.plans.session import build_session
    s = build_session(app_name="s2spark-dedup-stream", master="local[4]",
                      shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_streaming_dedup_matches_batch(spark, tmp_path):
    from s2spark.streaming.dedup_stream import streaming_exact_dedup

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text",
                    F.current_timestamp().alias("fetched_at")))
    # inject guaranteed duplicates: every text appears at least twice
    dup = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                      "text", "fetched_at")
    src = docs.unionByName(dup)
    src_dir = str(tmp_path / "docs_src")
    src.coalesce(1).write.mode("overwrite").parquet(src_dir)

    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    out = streaming_exact_dedup(stream, ts_col="fetched_at")
    q = (out.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT content_digest FROM dedup_out")

    # one survivor per distinct digest, never more
    n_distinct = (src.select(F.xxhash64("text").alias("d"))
                  .distinct().count())
    assert got.count() == n_distinct
    assert got.distinct().count() == n_distinct

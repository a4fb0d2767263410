"""Streaming near-dup filter vs corpus == batch filter on the same rows."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from s2spark.plans.session import build_session
    s = build_session(app_name="s2spark-neardup-stream", master="local[4]",
                      shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_filter_near_dups_of_corpus(spark):
    """Exact-copy arrivals are dropped (signature estimate 1.0); novel text
    survives."""
    from s2spark.operators.dedup import (build_corpus_index,
                                         filter_near_dups_of_corpus)
    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    index = build_corpus_index(corpus).cache()

    dups = (corpus.limit(50)
            .select((F.col("doc_id") + 10_000).alias("doc_id"), "text"))
    novel = spark.range(50).select(
        (F.col("id") + 20_000).alias("doc_id"),
        F.concat(F.lit("entirely novel zebra quartz "),
                 F.sha2(F.col("id").cast("string"), 256)).alias("text"))
    arrivals = dups.unionByName(novel)

    out = filter_near_dups_of_corpus(arrivals, index)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert all(k >= 20_000 for k in kept), "an exact corpus copy survived"
    assert len(kept) == 50, "novel docs were wrongly dropped"


def test_streaming_filter_matches_batch(spark, tmp_path):
    from s2spark.operators.dedup import (build_corpus_index,
                                         filter_near_dups_of_corpus)
    from s2spark.streaming.neardup_stream import near_dup_filter_writer

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    index = build_corpus_index(corpus).cache()

    arrivals = (corpus.limit(40)
                .select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
                .unionByName(spark.range(40).select(
                    (F.col("id") + 20_000).alias("doc_id"),
                    F.concat(F.lit("fresh content kumquat "),
                             F.sha2(F.col("id").cast("string"), 256))
                    .alias("text"))))
    src_dir = str(tmp_path / "arrivals")
    arrivals.coalesce(2).write.mode("overwrite").parquet(src_dir)

    got = []

    def sink(df, batch_id):
        got.extend(r["doc_id"] for r in df.select("doc_id").collect())

    stream = spark.readStream.schema(arrivals.schema).parquet(src_dir)
    q = (stream.writeStream
         .foreachBatch(near_dup_filter_writer(index, sink))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    batch = {r["doc_id"] for r in
             filter_near_dups_of_corpus(arrivals, index)
             .select("doc_id").collect()}
    assert set(got) == batch

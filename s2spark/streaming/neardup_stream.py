"""Streaming near-duplicate filtering against a static accepted corpus.

The incremental-ingest shape at 100 TB: an accepted corpus publishes a
MinHash band-bucket index (operators.dedup.build_corpus_index, stored
bucketBy(band, bucket)); each arriving micro-batch of new documents is
signature-hashed MAP-ONLY (with_minhash_signatures — no shuffle on the
stream side), probed against the index on (band, bucket), gated by the
signature-match estimate, and only non-duplicate documents reach the sink.

The per-batch filter needs a distinct + left_anti on the batch itself,
which Structured Streaming's continuous plans disallow — so the operator
runs through foreachBatch, the standard stream-vs-static join escape
hatch: each micro-batch is a bounded DataFrame with full batch semantics,
and exactly the batch operator (filter_near_dups_of_corpus) is applied,
so stream and batch results agree by construction.

Duplicates WITHIN the stream are the job of dedup_stream (watermarked
digest state); this module handles duplicates AGAINST history.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from ..operators.dedup import filter_near_dups_of_corpus


def near_dup_filter_writer(corpus_index: DataFrame,
                           sink: Callable[[DataFrame, int], None],
                           text_col: str = "text", key_col: str = "doc_id",
                           n: int = 5, num_hashes: int = 16, bands: int = 4,
                           est_gate: float = 0.5):
    """foreachBatch function: filters each micro-batch against the corpus
    index and hands survivors to `sink(survivors_df, batch_id)`.

    Usage:
        q = (docs_stream.writeStream
             .foreachBatch(near_dup_filter_writer(index, my_sink))
             .start())
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        survivors = filter_near_dups_of_corpus(
            batch_df, corpus_index, text_col, key_col, n, num_hashes,
            bands, est_gate)
        sink(survivors, batch_id)

    return _process

"""Streaming exact deduplication over a documents stream.

Batch exact dedup (operators.dedup.exact_dedup) groups by content digest;
the streaming form keeps the digest -> seen state bounded with
`dropDuplicatesWithinWatermark`: a duplicate arriving within the watermark
horizon of the first copy is dropped, and state older than the horizon is
evicted — the state store never grows past (#distinct digests per horizon).

At 100 TB/day this is the only viable shape: an unbounded
`dropDuplicates` would accrete every digest ever seen into the state
store, while the watermarked form holds hours, not history.  Cross-horizon
duplicates are caught by the periodic BATCH exact dedup over the
accumulated table (the standard lambda split for dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(docs_stream: DataFrame,
                          ts_col: str = "fetched_at",
                          content_col: str = "text",
                          watermark: str = "1 hour") -> DataFrame:
    """First-copy-wins exact dedup keyed on content digest.

    Emits each document whose xxhash64 digest has not been seen within the
    watermark horizon.  Digesting (not raw content) keys the state store:
    16 bytes/row instead of the document body.
    """
    digested = docs_stream.withColumn(
        "content_digest", F.xxhash64(F.col(content_col)))
    return (digested
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["content_digest"]))

"""Bucketed spatial tables: shuffle-free co-located joins and aggregations.

The reference is an in-memory library, so its "storage layout" is whatever
the caller holds (SURVEY.md §2.1 — no sinks).  At 100 TB the layout IS the
query plan: a points table written bucketed by its tile key (ancestor cell
at a fixed level) lets every subsequent join or aggregation keyed on that
tile read each bucket as a pre-shuffled partition — Catalyst elides the
Exchange on the bucketed side entirely.  For a workload that repeatedly
joins the same 100 TB points table against changing polygon sets, the one
write-time shuffle is amortized across every later query.

Design notes for the cluster:
* bucket count should be sized so one bucket's rows fit an executor task
  (~128 MB-1 GB);  at 100 TB / 512 MB that is ~200k buckets — Spark handles
  this fine since buckets are files per partition, not partitions.
* the bucket KEY must be the same expression later joins use
  (`parent_for_level(cell_id, level)`) — bucketing on raw leaf cell_id
  would never match a join on tile_id.
* sorting within buckets by cell_id gives parquet min/max pruning for
  cell-range (containment) queries on top of the bucket pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import columns as C

TILE_COL = "tile_id"


def with_tile(df: DataFrame, level: int, cell_col: str = "cell_id") -> DataFrame:
    """Attach the bucket key: ancestor cell at `level` (JVM expression)."""
    return df.withColumn(TILE_COL, C.parent_for_level(F.col(cell_col), level))


def write_bucketed_points(df: DataFrame, table: str, level: int = 6,
                          n_buckets: int = 16,
                          cell_col: str = "cell_id") -> None:
    """Write `df` as a Hive-bucketed table keyed on its level-`level` tile.

    One shuffle now; zero shuffles for every later tile-keyed join/agg.
    Rows are sorted by leaf cell within each bucket so containment-range
    scans (`cell_id BETWEEN range_min AND range_max`) prune row groups.
    """
    (with_tile(df, level, cell_col)
     .repartition(n_buckets, TILE_COL)   # align write tasks with buckets
     .write.mode("overwrite")
     .bucketBy(n_buckets, TILE_COL)
     .sortBy(TILE_COL, cell_col)
     .format("parquet")
     .saveAsTable(table))


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_tile_join(bucketed_points: DataFrame, tiles: DataFrame,
                        how: str = "inner") -> DataFrame:
    """Join a bucketed points table against a per-tile table on tile_id.

    When `bucketed_points` comes from `read_bucketed`, the physical plan
    has NO Exchange on the points side (asserted in tests): Spark reads
    each bucket as an already-hash-partitioned input and only shuffles the
    (small) tile side.  This is the 100-TB repeated-join fast path.
    """
    return bucketed_points.join(tiles, TILE_COL, how)


def bucketed_tile_counts(bucketed_points: DataFrame) -> DataFrame:
    """Per-tile counts over a bucketed table: partial aggregation happens
    within buckets and the final agg needs no shuffle (bucket partitioning
    already satisfies the grouping)."""
    return (bucketed_points.groupBy(TILE_COL)
            .agg(F.count(F.lit(1)).alias("n_points")))

"""kNN / fixed-radius neighbor joins via cell-bucket + neighbor-ring expansion.

Reimplements the reference's PointIndex pattern (fixed-radius near-point
join: hash points to cells at the level where the query disc fits in one
cell, probe the 4 vertex-neighbor buckets, exact-filter by angle —
S2PolygonBuilder.cs:593-675) as relational joins:

* level selection: MIN_WIDTH.get_max_level(2r) (S2PolygonBuilder.cs:600-611)
* probe keys: vertex neighbors of the query's cell at that level (<=4), so
  every data point within r shares a bucket with the query -> one hash
  equi-join on bucket id
* exact residual: haversine <= r

kNN runs radius search with ring widening: if a query has < k matches at
radius r, double r (ring expansion via get_all_neighbors) and retry — here
expressed as a small driver loop over remaining queries (each round is one
broadcast join; typically 1-2 rounds with a sane initial radius).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import columns as C
from ..functions.udfs import vertex_neighbors_udf
from ..kernel import metrics


def _haversine_rad(lat1, lng1, lat2, lng2):
    # explicit products (not pow) so SQL oracles can match bit-for-bit
    dlat = F.sin((lat2 - lat1) / 2)
    dlng = F.sin((lng2 - lng1) / 2)
    h = dlat * dlat + F.cos(lat1) * F.cos(lat2) * (dlng * dlng)
    return 2 * F.asin(F.sqrt(F.least(F.lit(1.0), h)))


def radius_join(queries: DataFrame, data: DataFrame, radius_rad: float,
                query_key: str = "query_id", data_key: str = "data_id") -> DataFrame:
    """All (query, data) pairs within radius_rad (great-circle).

    Both inputs need lat/lng (degrees) + leaf cell_id columns.  Distance is
    computed as a JVM haversine expression; the join is an equi-join on
    bucket cells, broadcastable when queries are small.
    """
    level = min(metrics.MIN_WIDTH.get_max_level(2 * radius_rad), 30)
    # data side: one bucket per row (its ancestor at `level`)
    d = data.select(
        F.col(data_key), F.col("lat").alias("d_lat"), F.col("lng").alias("d_lng"),
        C.parent_for_level(F.col("cell_id"), level).alias("bucket"))
    # query side: <=4 vertex-neighbor buckets at `level`
    q = queries.select(
        F.col(query_key), F.col("lat").alias("q_lat"), F.col("lng").alias("q_lng"),
        F.explode(vertex_neighbors_udf(F.col("cell_id"), F.lit(level))).alias("bucket"))
    dist = _haversine_rad(F.radians(F.col("q_lat")), F.radians(F.col("q_lng")),
                          F.radians(F.col("d_lat")), F.radians(F.col("d_lng")))
    return (q.join(d, "bucket")
            .withColumn("distance_rad", dist)
            .where(F.col("distance_rad") <= radius_rad)
            .dropDuplicates([query_key, data_key])
            .drop("bucket"))


def knn_join(queries: DataFrame, data: DataFrame, k: int,
             initial_radius_rad: float = 0.0025, max_rounds: int = 6,
             query_key: str = "query_id", data_key: str = "data_id") -> DataFrame:
    """k nearest data points per query.

    Round-doubling radius search: radius r finds all true k-NN whose k-th
    neighbor is within r; queries with < k matches retry at 2r.  Each round
    is one bucket join; rows found in earlier rounds are final (a correct
    k-NN at radius r stays correct at 2r).
    """
    # The query side is small by contract (it is broadcast in radius_join);
    # manage its round-to-round state on the driver so each round's plan is
    # flat (chaining anti-joins across rounds compounds lineage and forces
    # full recomputation per round).  The DATA side — the 100 TB side —
    # stays fully distributed; each round is one bucket join over it.
    spark = queries.sparkSession
    remaining = queries.persist()
    remaining.count()
    results = None
    radius = initial_radius_rad
    for _ in range(max_rounds):
        matched = radius_join(remaining, data, radius, query_key, data_key)
        w = Window.partitionBy(query_key).orderBy(F.col("distance_rad").asc(),
                                                  F.col(data_key).asc())
        ranked = (matched.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select(query_key, data_key, "distance_rad", "rank")
                  .localCheckpoint())
        counts = {r[0]: r[1] for r in
                  ranked.groupBy(query_key).agg(F.max("rank")).collect()}
        done_ids = [qid for qid, n in counts.items() if n >= k]
        if done_ids:
            done = ranked.where(F.col(query_key).isin(done_ids))
            results = done if results is None else results.unionByName(done)
            remaining = remaining.where(~F.col(query_key).isin(done_ids)).persist()
        if remaining.limit(1).isEmpty():
            break
        radius *= 2
    if results is None:
        return queries.limit(0).select(F.col(query_key)).withColumns(
            {data_key: F.lit(None).cast("long"),
             "distance_rad": F.lit(None).cast("double"),
             "rank": F.lit(None).cast("int")})
    return results.select(query_key, data_key, "distance_rad", "rank")

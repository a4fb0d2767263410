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

import math

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
    # Clamp to MaxLevel-1 = 29 (not 30): the vertex-neighbor guarantee needs
    # a level coarser than the leaf, and get_vertex_neighbors at level 30
    # would compute a negative shift (S2PolygonBuilder PointIndex mirrors
    # this with Math.Min(..., S2CellId.MaxLevel - 1)).
    level = min(metrics.MIN_WIDTH.get_max_level(2 * radius_rad), 29)
    # data side: one bucket per row (its ancestor at `level`)
    d = data.select(
        F.col(data_key), F.col("lat").alias("d_lat"), F.col("lng").alias("d_lng"),
        C.parent_for_level(F.col("cell_id"), level).alias("bucket"))
    if 2 * radius_rad > metrics.MIN_WIDTH.get_value(0):
        # Planet-scale radius: get_max_level clamps to 0 but no cell at ANY
        # level is wide enough to contain the query disc, so the 4-vertex-
        # neighbor guarantee is void (a disc of radius > ~27 deg can reach
        # faces that never touch the query's nearest cube vertex — matches
        # on them were silently dropped).  Probe all six faces: correct by
        # construction, and the exact haversine filter does the work — the
        # honest cost of a disc covering a large fraction of the sphere.
        import numpy as np

        from ..kernel import cellid as ci
        faces6 = [int(c) for c in
                  ci.to_signed(ci.from_face_pos_level(np.arange(6), 0, 0))]
        q = queries.select(
            F.col(query_key), F.col("lat").alias("q_lat"),
            F.col("lng").alias("q_lng"),
            F.explode(F.array(*[F.lit(c) for c in faces6])).alias("bucket"))
    else:
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
             initial_radius_rad: float = 0.0025,
             max_rounds: int | None = None,
             query_key: str = "query_id", data_key: str = "data_id") -> DataFrame:
    """k nearest data points per query.

    Round-doubling radius search: radius r finds all true k-NN whose k-th
    neighbor is within r; queries with < k matches retry at 2r.  Each round
    is one bucket join; rows found in earlier rounds are final (a correct
    k-NN at radius r stays correct at 2r).

    COMPLETENESS: by default the doubling runs until the radius reaches pi
    (the all-pairs planetary regime), so every query returns min(k, |data|)
    rows no matter how far its k-th neighbor is — rounds are
    ceil(log2(pi / initial_radius)) + 1 worst-case, but the loop exits as
    soon as every query is satisfied (dense data: 2-4 rounds).  A former
    fixed 6-round default silently returned < k rows for queries whose
    k-th neighbor sat beyond initial_radius * 32 (caught by the
    operator-fuzz suite's brute-force oracle).  Pass `max_rounds` to bound
    the rounds explicitly; queries still short of k then return partial
    lists, exactly as when data itself has fewer than k points.
    """
    if max_rounds is None:
        max_rounds = max(1, math.ceil(math.log2(
            math.pi / max(initial_radius_rad, 1e-12))) + 1)
    # Round-to-round state stays DISTRIBUTED: the "done" set is a DataFrame
    # (queries whose max rank reached k), removed from `remaining` by a
    # broadcast anti-join — no collect() of per-query state on the driver,
    # so 10^6 query points don't bottleneck there.  Each round's `ranked` is
    # localCheckpoint'ed so the per-round anti-join lineage stays flat.  The
    # DATA side — the 100 TB side — stays fully distributed throughout.
    remaining = queries.localCheckpoint()
    results = None
    last_partial = None
    radius = initial_radius_rad
    for _ in range(max_rounds):
        matched = radius_join(remaining, data, radius, query_key, data_key)
        w = Window.partitionBy(query_key).orderBy(F.col("distance_rad").asc(),
                                                  F.col(data_key).asc())
        ranked = (matched.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select(query_key, data_key, "distance_rad", "rank")
                  .localCheckpoint())
        done_q = (ranked.groupBy(query_key).agg(F.max("rank").alias("n_found"))
                  .where(F.col("n_found") >= k).select(query_key))
        done = ranked.join(F.broadcast(done_q), query_key, "semi")
        results = done if results is None else results.unionByName(done)
        # partial top-k for queries not yet done (kept in case rounds run out)
        last_partial = ranked.join(F.broadcast(done_q), query_key, "left_anti")
        remaining = (remaining.join(F.broadcast(done_q), query_key, "left_anti")
                     .localCheckpoint())
        if remaining.limit(1).isEmpty():
            last_partial = None
            break
        radius *= 2
    if results is None:
        results = queries.limit(0).select(F.col(query_key)).withColumns(
            {data_key: F.lit(None).cast("long"),
             "distance_rad": F.lit(None).cast("double"),
             "rank": F.lit(None).cast("int")})
    if last_partial is not None:
        # Queries still short of k after max_rounds: return their partial
        # neighbor lists (matching exact kNN, which returns partial top-k
        # rows when fewer than k points exist in range) instead of silently
        # dropping them.
        results = results.unionByName(
            last_partial.select(query_key, data_key, "distance_rad", "rank"))
    return results.select(query_key, data_key, "distance_rad", "rank")

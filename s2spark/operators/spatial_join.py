"""Point-in-polygon spatial join: the engine's headline operator.

Plan shape (SURVEY.md §3.3, reimagining S2EdgeIndex's range-scan join,
S2EdgeIndex.cs:327-603, as relational operators):

1. BUILD (driver-side, tiny): for each query polygon run the region coverer
   twice -> exterior covering (candidate generation) + interior covering
   (exact-test bypass, mirroring S2RegionCoverer.cs:312-329).  Emit a
   coverings table: (polygon_id, cell_id, level, is_interior).  Coverings
   are <= max_cells per polygon -> always broadcastable.

2. PROBE (distributed, one pass): points carry a leaf cell_id.  For the
   small set of distinct covering levels L1..Lk, generate each point's
   ancestors at those levels (pure bit ops) and explode -> equi-join
   ancestor == covering.cell_id.  This is a broadcast HASH join (never a
   nested-loop range join), so the probe scales linearly and Catalyst can
   still prune scans.

3. REFINE: matches on interior cells are accepted outright; matches on
   exterior cells run the exact crossing-parity kernel (Arrow-batched,
   polygon vertices broadcast).  The refine fraction is the covering's
   skin, a few % of candidates for max_cells=8.

Skew: a pre-aggregated per-cell match count drives optional salting of hot
covering cells; AQE skew-join handles residual imbalance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from ..functions import columns as C
from ..kernel import cellid as ci
from ..kernel.coverer import RegionCoverer
from ..kernel.loops import Loop, Polygon


def build_coverings(polygons: dict[int, Polygon], max_cells: int = 8,
                    interior_max_cells: int | None = None) -> pd.DataFrame:
    """Exterior + interior coverings for each polygon (driver-side; each
    covering is <= max_cells rows)."""
    rows = []
    cov = RegionCoverer(max_cells=max_cells)
    icov = RegionCoverer(max_cells=interior_max_cells or 4 * max_cells)
    for pid, poly in polygons.items():
        exterior = cov.get_covering(poly)
        interior = set(int(v) for v in icov.get_interior_covering(poly))
        # interior cells are a subset of the area; emit them as accept-fast
        # rows and subtract them from the exterior's exact-test load by
        # emitting exterior cells as-is (a candidate may match both; the
        # join dedups by taking max(is_interior)).
        for cid in exterior:
            rows.append((pid, int(ci.to_signed(np.array([cid], dtype=np.uint64))[0]),
                         int(ci.level_of(np.array([cid], dtype=np.uint64))[0]), False))
        for cid in interior:
            rows.append((pid, int(ci.to_signed(np.array([cid], dtype=np.uint64))[0]),
                         int(ci.level_of(np.array([cid], dtype=np.uint64))[0]), True))
    return pd.DataFrame(rows, columns=["polygon_id", "cov_cell_id", "cov_level", "is_interior"])


def _make_contains_udf(spark: SparkSession, polygons: dict[int, Polygon]):
    """Pandas UDF (polygon_id, x, y, z) -> bool, vectorized per polygon
    group inside each Arrow batch; polygon vertices ride a broadcast."""
    spec = {int(pid): [(lp.vertices, lp.depth) for lp in poly.loops]
            for pid, poly in polygons.items()}
    bc = spark.sparkContext.broadcast(spec)

    @F.pandas_udf(BooleanType())
    def polygon_contains(pid: pd.Series, x: pd.Series, y: pd.Series,
                         z: pd.Series) -> pd.Series:
        cache: dict[int, Polygon] = {}
        out = np.zeros(len(pid), dtype=bool)
        xs = x.to_numpy(np.float64)
        ys = y.to_numpy(np.float64)
        zs = z.to_numpy(np.float64)
        pids = pid.to_numpy(np.int64)
        for p in np.unique(pids):
            poly = cache.get(int(p))
            if poly is None:
                loops = [Loop(v, depth=d) for v, d in bc.value[int(p)]]
                poly = cache[int(p)] = Polygon(loops)
            m = pids == p
            out[m] = poly.contains_points(xs[m], ys[m], zs[m])
        return pd.Series(out)

    return polygon_contains


def spatial_join(spark: SparkSession, points: DataFrame,
                 polygons: dict[int, Polygon], max_cells: int = 8,
                 cell_col: str = "cell_id") -> DataFrame:
    """points (with leaf `cell_col` and x,y,z unit-vector columns) ->
    rows augmented with polygon_id for every containing polygon.

    The covering side is broadcast; the probe explodes each point to one
    ancestor key per distinct covering level (<= ~10 keys) and hash-joins.
    """
    cov_pdf = build_coverings(polygons, max_cells=max_cells)
    cov_df = spark.createDataFrame(cov_pdf)
    levels = sorted(cov_pdf["cov_level"].unique().tolist())

    probe_keys = F.array(*[C.parent_for_level(F.col(cell_col), int(lv)) for lv in levels])
    probed = points.withColumn("probe_cell", F.explode(probe_keys))

    joined = probed.join(F.broadcast(cov_df),
                         probed["probe_cell"] == cov_df["cov_cell_id"], "inner")

    # a point can match one polygon through several covering cells
    # (interior + exterior, or multiple levels): collapse, preferring the
    # interior bypass
    point_cols = [c for c in points.columns]
    grouped = (joined.groupBy(*point_cols, "polygon_id")
               .agg(F.max("is_interior").alias("is_interior")))

    contains_udf = _make_contains_udf(spark, polygons)
    exact = grouped.where(
        F.col("is_interior")
        | contains_udf(F.col("polygon_id"), F.col("x"), F.col("y"), F.col("z")))
    return exact.drop("is_interior")


def points_with_cells(pages_geo: DataFrame, lat_col: str = "lat",
                      lng_col: str = "lng") -> DataFrame:
    """Attach leaf cell_id (JVM expression) + unit-vector columns (needed by
    the exact refine kernel) to a mined geo table."""
    df = C.with_cell_id(pages_geo, lat_col, lng_col, out="cell_id")
    phi = F.radians(F.col(lat_col).cast("double"))
    theta = F.radians(F.col(lng_col).cast("double"))
    return (df.withColumn("x", F.cos(theta) * F.cos(phi))
              .withColumn("y", F.sin(theta) * F.cos(phi))
              .withColumn("z", F.sin(phi)))

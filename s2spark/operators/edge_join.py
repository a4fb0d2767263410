"""Edge-edge crossing join: the reference's S2EdgeIndex as a hash join.

The reference builds a quad-tree of (cell, edge) pairs — each edge covered
at a level where cell width ~ edge length — and answers "which edges may
cross this edge" with ancestor probes + range scans
(S2EdgeIndex.cs:327-603).  Relationally: pick a dataset-wide level L no
finer than the longest edge's fitting level, expand every edge to the
Moore neighborhood (9 cells) of its start cell at L (a geodesic no longer
than a cell width starting in C stays inside C and its ring, so the 9-cell
set covers the whole edge — candidate generation is COMPLETE), then
equi-join on the cell key and refine candidates with the exact
RobustCrossing kernel.

Scale shape: one shuffle-free explode per side, one hash join on uniform
cell keys, Arrow-batched exact refine on candidates only.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BooleanType, LongType

from ..functions import columns as C
from ..kernel import cellid as ci
from ..kernel import metrics, sphere
from ..kernel.loops import robust_crossing_batch

EDGE_COLS = ("ax", "ay", "az", "bx", "by", "bz")


def max_edge_level(edges: DataFrame) -> int:
    """Coarsest fitting level: MIN_WIDTH.get_max_level(longest edge angle)
    (the reference's per-edge ideal level, S2EdgeIndex.cs:327-366, made
    dataset-global so the join key is a single level)."""
    row = edges.select(
        F.max(F.acos(F.least(F.lit(1.0),
                             F.col("ax") * F.col("bx") + F.col("ay") * F.col("by")
                             + F.col("az") * F.col("bz")))).alias("m")).collect()[0]
    longest = float(row["m"]) or 1e-10
    return max(0, min(30, metrics.MIN_WIDTH.get_max_level(longest)))


@F.pandas_udf(ArrayType(LongType()))
def _edge_cells_udf(ax: pd.Series, ay: pd.Series, az: pd.Series,
                    level: pd.Series) -> pd.Series:
    """9-cell Moore neighborhood of the edge start's ancestor at `level`."""
    x = ax.to_numpy(np.float64)
    if len(x) == 0:
        return pd.Series([], dtype=object)
    leaf = ci.from_point(x, ay.to_numpy(np.float64), az.to_numpy(np.float64))
    lv = level.to_numpy(np.int64)
    parents = ci.parent_for_level(leaf, lv)
    nbrs, valid = ci.get_all_neighbors(parents, lv)
    out = []
    for p, row, m in zip(ci.to_signed(parents),
                         ci.to_signed(nbrs.reshape(-1)).reshape(nbrs.shape), valid):
        out.append(list(dict.fromkeys([int(p)] + [int(v) for v in row[m]])))
    return pd.Series(out)


def edge_crossing_join(edges_a: DataFrame, edges_b: DataFrame,
                       key_a: str = "edge_a", key_b: str = "edge_b",
                       level: int | None = None) -> DataFrame:
    """All (edge_a, edge_b) pairs whose geodesic edges properly cross
    (RobustCrossing > 0; S2EdgeUtil.cs:85-123).

    Inputs carry unit-vector endpoint columns ax..bz plus a key column.
    """
    if level is None:
        level = min(max_edge_level(edges_a), max_edge_level(edges_b))

    def keyed(df: DataFrame, key: str, prefix: str) -> DataFrame:
        cells = _edge_cells_udf(F.col("ax"), F.col("ay"), F.col("az"),
                                F.lit(level))
        return df.select(
            F.col(key),
            *[F.col(c).alias(prefix + c) for c in EDGE_COLS],
            F.explode(cells).alias("cell"))

    a = keyed(edges_a, key_a, "a_")
    b = keyed(edges_b, key_b, "b_")
    cand = (a.join(b, "cell")
            .dropDuplicates([key_a, key_b]))

    @F.pandas_udf(BooleanType())
    def crosses(aax: pd.Series, aay: pd.Series, aaz: pd.Series,
                abx: pd.Series, aby: pd.Series, abz: pd.Series,
                bax: pd.Series, bay: pd.Series, baz: pd.Series,
                bbx: pd.Series, bby: pd.Series, bbz: pd.Series) -> pd.Series:
        if len(aax) == 0:
            return pd.Series([], dtype=bool)
        rc = robust_crossing_batch(
            aax.to_numpy(np.float64), aay.to_numpy(np.float64), aaz.to_numpy(np.float64),
            abx.to_numpy(np.float64), aby.to_numpy(np.float64), abz.to_numpy(np.float64),
            bax.to_numpy(np.float64), bay.to_numpy(np.float64), baz.to_numpy(np.float64),
            bbx.to_numpy(np.float64), bby.to_numpy(np.float64), bbz.to_numpy(np.float64))
        return pd.Series(rc > 0)

    return (cand.where(crosses(*[F.col("a_" + c) for c in EDGE_COLS],
                               *[F.col("b_" + c) for c in EDGE_COLS]))
            .select(key_a, key_b))

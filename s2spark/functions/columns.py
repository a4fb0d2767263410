"""Pure Spark Column expressions for S2 cell ids — the JVM fast path.

Everything here compiles into Catalyst expression trees (whole-stage
codegen, no Python, no Arrow transfer):

* :func:`s2_cell_id` — the FULL lat/lng -> leaf-cell-id Hilbert encode as a
  Column expression.  The 1024-entry Hilbert lookup table is embedded as an
  array literal and probed with ``element_at`` (8 unrolled rounds); trig and
  the quadratic projection are built-in SQL functions.  This keeps the
  hottest kernel of the whole engine inside Tungsten codegen — measured
  several times faster than an Arrow pandas UDF at scale, and it lets
  Catalyst push/prune around it.
* parent/range/level/contains — plain bit arithmetic on the biased int64
  representation (see kernel.cellid): sibling-safe because the bias only
  flips bit 63, which every mask preserves.

Semantics mirror /root/reference/S2Geometry/S2CellId.cs:412-419,875-924
(encode), :140-260 (topology) — reimplemented, not translated: the
reference is a per-row C# object walk; this is a relational expression DAG.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..kernel.hilbert import LOOKUP_POS

MAX_LEVEL = 30
MAX_SIZE = 1 << 30

_LUT = [int(v) for v in LOOKUP_POS]


def _uv_to_st(u: Column) -> Column:
    """Inverse quadratic projection (S2Projections.cs:257-265)."""
    return F.when(u >= 0, F.sqrt(1 + 3 * u) - 1).otherwise(1 - F.sqrt(1 - 3 * u))


def _st_to_ij(s: Column) -> Column:
    """Banker's rounding via bround == reference Math.Round (S2CellId.cs:1033-1042)."""
    m = MAX_SIZE // 2
    return F.least(
        F.lit(2 * m - 1).cast("long"),
        F.greatest(F.lit(0).cast("long"),
                   F.bround(F.lit(float(m)) * s + (m - 0.5)).cast("long")))


# The 1024-entry LUT rides in the SQL as ONE string literal split+cast to
# an array (2 analyzer nodes), not `array(v0,...,v1023)` (1025 nodes).  The
# optimizer constant-folds the cast(split(...)) to the identical array
# Literal before codegen, so runtime is unchanged — but the ANALYZED plan
# this expression lives in shrinks ~1000x per LUT round, and every eager
# per-transformation re-analysis downstream of the encode (Spark analyzes
# each new Dataset) gets cheaper.  Measured (local[4], warm JVM): flagship
# graph construction through points_with_cells 1.1s -> 0.8s per build;
# this is pure driver-serial time, an Amdahl term in the N-vs-4N scaling
# headline that a real 10^12-row job would pay once but the bench pays
# per child run.
_LUT_SQL = ("CAST(split('" + ",".join(str(v) for v in _LUT)
            + "', ',') AS ARRAY<BIGINT>)")
_ENCODE_SQL_CACHE: dict[tuple, str] = {}


def _encode_sql(lat_col: str, lng_col: str, out: str, keep_xyz: bool) -> str:
    """Full Hilbert-encode as ONE SQL query over a `{src}` placeholder.

    Semantics identical to the previous per-round withColumns chain (same
    expressions, same evaluation order — verified bit-identical), but the
    whole encode is a single spark.sql() call: one eager analysis instead of
    ~25 incremental ones, cutting ~1s of per-query driver fixed cost that
    doesn't parallelize (it was the measured scaling-efficiency tail).  The
    per-round CTEs keep the projection barriers that prevent Catalyst's
    3^8 expression-tree blowup; whole-stage codegen fuses them at runtime.
    """
    key = (lat_col, lng_col, out, keep_xyz)
    if key in _ENCODE_SQL_CACHE:
        return _ENCODE_SQL_CACHE[key]
    P = "__s2tmp_"
    lat = f"CAST(`{lat_col}` AS DOUBLE)"
    lng = f"CAST(`{lng_col}` AS DOUBLE)"
    ctes = [
        f"{P}s0 AS (SELECT *, cos(radians({lng}))*cos(radians({lat})) AS {P}x, "
        f"sin(radians({lng}))*cos(radians({lat})) AS {P}y, "
        f"sin(radians({lat})) AS {P}z FROM {{src}})"]
    face = (f"CASE WHEN abs({P}x) > abs({P}y) AND abs({P}x) > abs({P}z) "
            f"THEN (CASE WHEN {P}x < 0 THEN 3 ELSE 0 END) "
            f"WHEN abs({P}y) > abs({P}z) THEN (CASE WHEN {P}y < 0 THEN 4 ELSE 1 END) "
            f"ELSE (CASE WHEN {P}z < 0 THEN 5 ELSE 2 END) END")
    ctes.append(f"{P}s1 AS (SELECT *, {face} AS {P}face FROM {P}s0)")
    u = (f"CASE {P}face WHEN 0 THEN {P}y/{P}x WHEN 1 THEN -{P}x/{P}y "
         f"WHEN 2 THEN -{P}x/{P}z WHEN 3 THEN {P}z/{P}x WHEN 4 THEN {P}z/{P}y "
         f"ELSE -{P}y/{P}z END")
    v = (f"CASE {P}face WHEN 0 THEN {P}z/{P}x WHEN 1 THEN {P}z/{P}y "
         f"WHEN 2 THEN -{P}y/{P}z WHEN 3 THEN {P}y/{P}x WHEN 4 THEN -{P}x/{P}y "
         f"ELSE -{P}x/{P}z END")

    def uv_to_st(e: str) -> str:
        return (f"(CASE WHEN ({e}) >= 0 THEN sqrt(1 + 3*({e})) - 1 "
                f"ELSE 1 - sqrt(1 - 3*({e})) END)")

    m = MAX_SIZE // 2

    def st_to_ij(e: str) -> str:
        return (f"least(CAST({2 * m - 1} AS BIGINT), greatest(CAST(0 AS BIGINT), "
                f"CAST(bround({float(m)!r}D * {e} + {m - 0.5!r}D) AS BIGINT)))")

    ctes.append(
        f"{P}s2 AS (SELECT *, {st_to_ij(uv_to_st(P + 'u'))} AS {P}i, "
        f"{st_to_ij(uv_to_st(P + 'v'))} AS {P}j FROM "
        f"(SELECT *, {u} AS {P}u, {v} AS {P}v FROM {P}s1))")
    ctes.append(
        f"{P}s3 AS (SELECT *, CAST({P}face AS BIGINT) & 1 AS {P}bits, "
        f"shiftleft(CAST({P}face AS BIGINT), 60) AS {P}n FROM {P}s2)")
    prev = f"{P}s3"
    for idx, k in enumerate(range(7, -1, -1)):
        bits_in = (f"({P}bits + shiftleft(shiftright({P}i, {4 * k}) & 15, 6) "
                   f"+ shiftleft(shiftright({P}j, {4 * k}) & 15, 2))")
        ctes.append(
            f"{P}l{idx} AS (SELECT *, CAST(element_at({_LUT_SQL}, "
            f"CAST({bits_in} + 1 AS INT)) AS BIGINT) AS {P}lut{idx} FROM {prev})")
        ctes.append(
            f"{P}r{idx} AS (SELECT * EXCEPT({P}n, {P}bits, {P}lut{idx}), "
            f"{P}n | shiftleft(shiftright({P}lut{idx}, 2), {8 * k}) AS {P}n, "
            f"{P}lut{idx} & 3 AS {P}bits FROM {P}l{idx})")
        prev = f"{P}r{idx}"
    keep = (f", {P}x AS x, {P}y AS y, {P}z AS z" if keep_xyz else "")
    final = (f"SELECT * EXCEPT({P}x, {P}y, {P}z, {P}face, {P}u, {P}v, "
             f"{P}i, {P}j, {P}n, {P}bits), "
             f"({P}n - CAST({1 << 62} AS BIGINT)) * 2 + 1 AS `{out}`{keep} "
             f"FROM {prev}")
    sql = "WITH " + ",\n".join(ctes) + "\n" + final
    _ENCODE_SQL_CACHE[key] = sql
    return sql


def with_cell_id(df, lat_col: str, lng_col: str, out: str = "cell_id",
                 keep_xyz: bool = False):
    """Append the leaf S2 cell id (biased signed long) of (lat,lng) degree
    columns — entirely as JVM expressions (whole-stage codegen, no Python).

    The encode chain lat/lng -> xyz -> (face,u,v) -> (s,t) -> (i,j) ->
    Hilbert position runs as 8 unrolled LUT rounds with ``element_at`` on a
    1024-int literal array, one projection barrier per round (Catalyst
    expression trees would otherwise blow up 3x per round).  Built as a
    single spark.sql call for one-shot analysis (see _encode_sql).

    keep_xyz=True also exposes the unit-vector x/y/z columns computed inside
    the encode (the exact-refine kernels need them) without recomputation.

    Returns the DataFrame with `out` appended and no temp columns.
    """
    if out in df.columns:
        df = df.drop(out)
    return df.sparkSession.sql(_encode_sql(lat_col, lng_col, out, keep_xyz),
                               src=df)


def lowest_on_bit(cell_id: Column) -> Column:
    """id & -id — works unchanged on the biased representation."""
    return cell_id.bitwiseAND(-cell_id)


def _lsb_for_level(level: int) -> int:
    return 1 << (2 * (MAX_LEVEL - level))


def parent_for_level(cell_id: Column, level: int) -> Column:
    """Ancestor at the given level (S2CellId.cs:246-260); bias-safe."""
    lsb = _lsb_for_level(level)
    return (cell_id.bitwiseAND(F.lit(-lsb).cast("long"))
            .bitwiseOR(F.lit(lsb).cast("long")))


def range_min(cell_id: Column) -> Column:
    return cell_id - (lowest_on_bit(cell_id) - 1)


def range_max(cell_id: Column) -> Column:
    return cell_id + (lowest_on_bit(cell_id) - 1)


def cell_contains(a: Column, b: Column) -> Column:
    """True where cell a contains cell b (S2CellId.cs:510-514)."""
    return b.between(range_min(a), range_max(a))


def cell_intersects(a: Column, b: Column) -> Column:
    return (range_min(b) <= range_max(a)) & (range_max(b) >= range_min(a))


def child_begin_for_level(cell_id: Column, level: int) -> Column:
    return cell_id - lowest_on_bit(cell_id) + F.lit(_lsb_for_level(level)).cast("long")


def child_end_for_level(cell_id: Column, level: int) -> Column:
    return cell_id + lowest_on_bit(cell_id) + F.lit(_lsb_for_level(level)).cast("long")


def cell_level(cell_id: Column) -> Column:
    """Level = 30 - trailing_zeros/2; tz computed exactly as bit_count(lsb-1)."""
    tz = F.bit_count(lowest_on_bit(cell_id) - 1)
    return (F.lit(MAX_LEVEL) - F.shiftrightunsigned(tz.cast("int"), 1)).alias("level")


def cell_token(cell_id: Column) -> Column:
    """Biased id -> reference hex token (<=16 chars, trailing zeros stripped;
    S2CellId.cs:656-679).  unbias via XOR with 2^63 (= flip the sign bit)."""
    raw_hex = F.lpad(F.hex(cell_id.bitwiseXOR(F.lit(-(1 << 63)).cast("long"))), 16, "0")
    stripped = F.regexp_replace(F.lower(raw_hex), "0+$", "")
    return F.when(stripped == "", F.lit("X")).otherwise(stripped)

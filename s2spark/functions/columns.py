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


def with_cell_id(df, lat_col: str, lng_col: str, out: str = "cell_id"):
    """Append the leaf S2 cell id (biased signed long) of (lat,lng) degree
    columns — entirely as JVM Column expressions.

    The encode chain lat/lng -> xyz -> (face,u,v) -> (s,t) -> (i,j) ->
    Hilbert position runs as 8 unrolled LUT rounds with ``element_at`` on a
    1024-int literal array.  Each round is materialized as its own projected
    column: Catalyst Column objects are *trees*, so threading one Column
    through 8 rounds would duplicate subtrees ~3x per round (3^8 blowup);
    per-round projections keep every expression small while whole-stage
    codegen still fuses the projections into one pass.

    Returns the DataFrame with `out` appended and no temp columns.
    """
    P = "__s2tmp_"
    lat = F.col(lat_col).cast("double")
    lng = F.col(lng_col).cast("double")
    phi = F.radians(lat)
    theta = F.radians(lng)
    df = df.withColumns({
        P + "x": F.cos(theta) * F.cos(phi),
        P + "y": F.sin(theta) * F.cos(phi),
        P + "z": F.sin(phi),
    })
    x, y, z = F.col(P + "x"), F.col(P + "y"), F.col(P + "z")
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    axis = (F.when((ax > ay) & (ax > az), F.lit(0))
            .when(ay > az, F.lit(1)).otherwise(F.lit(2)))
    comp = F.when(axis == 0, x).when(axis == 1, y).otherwise(z)
    df = df.withColumn(P + "face", F.when(comp < 0, axis + 3).otherwise(axis))
    face = F.col(P + "face")
    u = (F.when(face == 0, y / x).when(face == 1, -x / y).when(face == 2, -x / z)
         .when(face == 3, z / x).when(face == 4, z / y).otherwise(-y / z))
    v = (F.when(face == 0, z / x).when(face == 1, z / y).when(face == 2, -y / z)
         .when(face == 3, y / x).when(face == 4, -x / y).otherwise(-x / z))
    df = df.withColumns({
        P + "i": _st_to_ij(_uv_to_st(u)),
        P + "j": _st_to_ij(_uv_to_st(v)),
        P + "bits": face.cast("long").bitwiseAND(F.lit(1).cast("long")),
        P + "n": F.shiftleft(face.cast("long"), 60),
    })
    i, j = F.col(P + "i"), F.col(P + "j")
    lut = F.lit(_LUT)
    for k in range(7, -1, -1):
        bits_in = (F.col(P + "bits")
                   + F.shiftleft(F.shiftrightunsigned(i, 4 * k).bitwiseAND(F.lit(15).cast("long")), 6)
                   + F.shiftleft(F.shiftrightunsigned(j, 4 * k).bitwiseAND(F.lit(15).cast("long")), 2))
        df = df.withColumn(P + "lut", F.element_at(lut, (bits_in + 1).cast("int")).cast("long"))
        lv = F.col(P + "lut")
        df = df.withColumns({
            P + "n": F.col(P + "n").bitwiseOR(F.shiftleft(F.shiftrightunsigned(lv, 2), 8 * k)),
            P + "bits": lv.bitwiseAND(F.lit(3).cast("long")),
        })
    # biased = raw - 2^63 = (n - 2^62)*2 + 1, computed without signed overflow
    df = df.withColumn(out, (F.col(P + "n") - F.lit(1 << 62).cast("long")) * 2 + 1)
    return df.drop(*[c for c in df.columns if c.startswith(P)])


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

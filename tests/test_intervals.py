"""R1Interval parity test ported from S2Geometry.Tests/R1IntervalTest.cs."""

from s2spark.kernel.intervals import R1Interval


def _eq(a: R1Interval, b: R1Interval) -> bool:
    return (a.lo == b.lo and a.hi == b.hi) or (a.is_empty and b.is_empty)


def _ivl_ops(x: R1Interval, y: R1Interval, rel: str):
    assert x.contains_interval(y) == (rel[0] == "T")
    assert x.interior_contains_interval(y) == (rel[1] == "T")
    assert x.intersects(y) == (rel[2] == "T")
    assert x.interior_intersects(y) == (rel[3] == "T")
    assert x.contains_interval(y) == _eq(x.union(y), x)
    assert x.intersects(y) == (not x.intersection(y).is_empty)


def test_r1_interval_basic():
    unit = R1Interval(0, 1)
    negunit = R1Interval(-1, 0)
    assert (unit.lo, unit.hi) == (0.0, 1.0)
    assert (negunit.lo, negunit.hi) == (-1.0, 0.0)

    half = R1Interval(0.5, 0.5)
    assert not unit.is_empty and not half.is_empty
    empty = R1Interval.empty()
    assert empty.is_empty

    assert unit.center == 0.5
    assert half.center == 0.5
    assert negunit.length == 1.0
    assert half.length == 0.0
    assert empty.length < 0

    assert unit.contains(0.5) and unit.interior_contains(0.5)
    assert unit.contains(0) and not unit.interior_contains(0)
    assert unit.contains(1) and not unit.interior_contains(1)

    _ivl_ops(empty, empty, "TTFF")
    _ivl_ops(empty, unit, "FFFF")
    _ivl_ops(unit, half, "TTTT")
    _ivl_ops(unit, unit, "TFTT")
    _ivl_ops(unit, empty, "TTFF")
    _ivl_ops(unit, negunit, "FFTF")
    _ivl_ops(unit, R1Interval(0, 0.5), "TFTT")
    _ivl_ops(half, R1Interval(0, 0.5), "FFTF")

    r = empty.add_point(5)
    assert (r.lo, r.hi) == (5.0, 5.0)
    r = r.add_point(-1)
    assert (r.lo, r.hi) == (-1.0, 5.0)
    r = r.add_point(0)
    assert (r.lo, r.hi) == (-1.0, 5.0)

    assert _eq(R1Interval.from_point_pair(4, 4), R1Interval(4, 4))
    assert _eq(R1Interval.from_point_pair(-1, -2), R1Interval(-2, -1))
    assert _eq(R1Interval.from_point_pair(-5, 3), R1Interval(-5, 3))

    assert _eq(empty.expanded(0.45), empty)
    assert _eq(unit.expanded(0.5), R1Interval(-0.5, 1.5))

    assert _eq(R1Interval(99, 100).union(empty), R1Interval(99, 100))
    assert _eq(empty.union(R1Interval(99, 100)), R1Interval(99, 100))
    assert R1Interval(5, 3).union(R1Interval(0, -2)).is_empty
    assert R1Interval(0, -2).union(R1Interval(5, 3)).is_empty
    assert _eq(unit.union(unit), unit)
    assert _eq(unit.union(negunit), R1Interval(-1, 1))
    assert _eq(negunit.union(unit), R1Interval(-1, 1))
    assert _eq(half.union(unit), unit)
    assert _eq(unit.intersection(half), half)
    assert _eq(unit.intersection(negunit), R1Interval(0, 0))
    assert negunit.intersection(half).is_empty
    assert unit.intersection(empty).is_empty
    assert empty.intersection(unit).is_empty

"""Wedge-relation parity matrix ported from
S2Geometry.Tests/S2EdgeUtilTest.cs:385-495 (testWedges)."""

import math

from s2spark.kernel.loops import (_wedge_contains, _wedge_contains_or_crosses,
                                  _wedge_intersects)


def _n(p):
    s = math.sqrt(sum(v * v for v in p))
    return tuple(v / s for v in p)


def assert_wedge(a0, ab1, a2, b0, b2, contains, intersects, crosses):
    a0, ab1, a2, b0, b2 = map(_n, (a0, ab1, a2, b0, b2))
    assert _wedge_contains(a0, ab1, a2, b0, b2) == (1 if contains else 0)
    assert _wedge_intersects(a0, ab1, a2, b0, b2) == (-1 if intersects else 0)
    # WedgeContainsOrIntersects (S2EdgeUtil.cs:558-586) is the composition
    got = 1 if _wedge_contains(a0, ab1, a2, b0, b2) else \
        _wedge_intersects(a0, ab1, a2, b0, b2)
    assert got == (1 if contains else -1 if intersects else 0)
    assert _wedge_contains_or_crosses(a0, ab1, a2, b0, b2) == \
        (1 if contains else -1 if crosses else 0)


def test_wedges_matrix():
    # intersection in one wedge
    assert_wedge((-1, 0, 10), (0, 0, 1), (1, 2, 10), (0, 1, 10), (1, -2, 10),
                 False, True, True)
    # intersection in two wedges
    assert_wedge((-1, -1, 10), (0, 0, 1), (1, -1, 10), (1, 0, 10), (-1, 1, 10),
                 False, True, True)
    # normal containment
    assert_wedge((-1, -1, 10), (0, 0, 1), (1, -1, 10), (-1, 0, 10), (1, 0, 10),
                 True, True, False)
    # containment with equality on one side
    assert_wedge((2, 1, 10), (0, 0, 1), (-1, -1, 10), (2, 1, 10), (1, -5, 10),
                 True, True, False)
    # containment with equality on the other side
    assert_wedge((2, 1, 10), (0, 0, 1), (-1, -1, 10), (1, -2, 10), (-1, -1, 10),
                 True, True, False)
    # containment with equality on both sides
    assert_wedge((-2, 3, 10), (0, 0, 1), (4, -5, 10), (-2, 3, 10), (4, -5, 10),
                 True, True, False)
    # disjoint with equality on one side
    assert_wedge((-2, 3, 10), (0, 0, 1), (4, -5, 10), (4, -5, 10), (-2, -3, 10),
                 False, False, False)
    # disjoint with equality on the other side
    assert_wedge((-2, 3, 10), (0, 0, 1), (0, 5, 10), (4, -5, 10), (-2, 3, 10),
                 False, False, False)
    # disjoint with equality on both sides
    assert_wedge((-2, 3, 10), (0, 0, 1), (4, -5, 10), (4, -5, 10), (-2, 3, 10),
                 False, False, False)
    # B contains A with equality on one side
    assert_wedge((2, 1, 10), (0, 0, 1), (1, -5, 10), (2, 1, 10), (-1, -1, 10),
                 False, True, False)
    # B contains A with equality on the other side
    assert_wedge((2, 1, 10), (0, 0, 1), (1, -5, 10), (-2, 1, 10), (1, -5, 10),
                 False, True, False)

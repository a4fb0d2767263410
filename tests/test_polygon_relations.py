"""Polygon relation matrix: port of S2PolygonTest.testInit/testRelations
(S2Geometry.Tests/S2PolygonTest.cs:61-120, 261-307)."""

import pytest

from s2spark.sources.fixtures import make_polygon

NEAR0 = "-1:0, 0:1, 1:0, 0:-1;"
NEAR1 = "-1:-1, -1:0, -1:1, 0:1, 1:1, 1:0, 1:-1, 0:-1;"
NEAR2 = "5:-2, -2:5, -1:-2;"
NEAR3 = "6:-3, -3:6, -2:-2;"
NEAR_HEMI = "0:-90, -90:0, 0:90, 90:0;"
FAR0 = "0:179, 1:180, 0:-179, 2:-180;"
FAR1 = "0:179, -1:179, 1:180, -1:-179, 0:-179, 3:-178, 2:-180, 3:178;"
FAR2 = "-1:-179, -1:179, 3:178, 3:-178;"
FAR3 = "-3:-178, -2:179, -3:178, 4:177, 4:-177;"
FAR_HEMI = "0:-90, 60:90, -60:90;"
SOUTH0a = "-90:0, -89.99:0, -89.99:0.01;"
SOUTH0b = "-90:0, -89.99:0.02, -89.99:0.03;"
SOUTH0c = "-90:0, -89.99:0.04, -89.99:0.05;"
SOUTH1 = "-90:0, -89.9:-0.1, -89.9:0.1;"
SOUTH2 = "-90:0, -89.8:-0.2, -89.8:0.2;"
SOUTH_HEMI = "0:-180, 0:60, 0:-60;"
NEAR_FAR1 = ("-1:-9, -9:-9, -9:9, 9:9, 9:-9, 1:-9, "
             "1:-175, 9:-175, 9:175, -9:175, -9:-175, -1:-175;")
NEAR_FAR2 = "-8:-4, 8:-4, 2:15, 2:170, 8:-175, -8:-175, -2:170, -2:15;"

P = make_polygon

near10 = P(NEAR0 + NEAR1)
near30 = P(NEAR3 + NEAR0)
near32 = P(NEAR2 + NEAR3)
near3210 = P(NEAR0 + NEAR2 + NEAR3 + NEAR1)
nearH3210 = P(NEAR0 + NEAR2 + NEAR3 + NEAR_HEMI + NEAR1)
far10 = P(FAR0 + FAR1)
far21 = P(FAR2 + FAR1)
far321 = P(FAR2 + FAR3 + FAR1)
farH20 = P(FAR2 + FAR_HEMI + FAR0)
farH3210 = P(FAR2 + FAR_HEMI + FAR0 + FAR1 + FAR3)
south0ab = P(SOUTH0a + SOUTH0b)
south2 = P(SOUTH2)
south210b = P(SOUTH2 + SOUTH0b + SOUTH1)
southH21 = P(SOUTH2 + SOUTH_HEMI + SOUTH1)
southH20abc = P(SOUTH2 + SOUTH0b + SOUTH_HEMI + SOUTH0a + SOUTH0c)
nf1n10f2s10abc = P(SOUTH0c + FAR2 + NEAR1 + NEAR_FAR1 + NEAR0 + SOUTH1 + SOUTH0b + SOUTH0a)
nf2n2f210s210ab = P(FAR2 + SOUTH0a + FAR1 + SOUTH1 + FAR0 + SOUTH0b + NEAR_FAR2 + SOUTH2 + NEAR2)
f32n0 = P(FAR2 + NEAR0 + FAR3)
n32s0b = P(NEAR3 + SOUTH0b + NEAR2)

# (a, b, contains(+1 a>b / -1 b>a / 0), intersects) — S2PolygonTest.cs:261-307
RELATIONS = [
    (near10, near30, -1, True),
    (near10, near32, 0, False),
    (near10, near3210, -1, True),
    (near10, nearH3210, 0, False),
    (near30, near32, 1, True),
    (near30, near3210, 1, True),
    (near30, nearH3210, 0, True),
    (near32, near3210, -1, True),
    (near32, nearH3210, 0, False),
    (near3210, nearH3210, 0, False),
    (far10, far21, 0, False),
    (far10, far321, -1, True),
    (far10, farH20, 0, False),
    (far10, farH3210, 0, False),
    (far21, far321, 0, False),
    (far21, farH20, 0, False),
    (far21, farH3210, -1, True),
    (far321, farH20, 0, True),
    (far321, farH3210, 0, True),
    (farH20, farH3210, 0, True),
    (south0ab, south2, -1, True),
    (south0ab, south210b, 0, True),
    (south0ab, southH21, -1, True),
    (south0ab, southH20abc, -1, True),
    (south2, south210b, 1, True),
    (south2, southH21, 0, True),
    (south2, southH20abc, 0, True),
    (south210b, southH21, 0, True),
    (south210b, southH20abc, 0, True),
    (southH21, southH20abc, 1, True),
    (nf1n10f2s10abc, nf2n2f210s210ab, 0, True),
    (nf1n10f2s10abc, near32, 1, True),
    (nf1n10f2s10abc, far21, 0, False),
    (nf1n10f2s10abc, south0ab, 0, False),
    (nf1n10f2s10abc, f32n0, 1, True),
    (nf2n2f210s210ab, near10, 0, False),
    (nf2n2f210s210ab, far10, 1, True),
    (nf2n2f210s210ab, south210b, 1, True),
    (nf2n2f210s210ab, south0ab, 1, True),
    (nf2n2f210s210ab, n32s0b, 1, True),
]

# nesting sanity (S2PolygonTest.testInit, :64-90)
CONTAINS_PAIRS = [
    (NEAR1, NEAR0), (NEAR2, NEAR1), (NEAR3, NEAR2), (NEAR_HEMI, NEAR3),
    (FAR1, FAR0), (FAR2, FAR1), (FAR3, FAR2), (FAR_HEMI, FAR3),
    (SOUTH1, SOUTH0a), (SOUTH1, SOUTH0b), (SOUTH1, SOUTH0c),
    (SOUTH_HEMI, SOUTH2), (NEAR_FAR1, NEAR3), (NEAR_FAR1, FAR3),
    (NEAR_FAR2, NEAR3), (NEAR_FAR2, FAR3),
]


@pytest.mark.parametrize("idx", range(len(CONTAINS_PAIRS)))
def test_init_contains(idx):
    a, b = CONTAINS_PAIRS[idx]
    assert P(a).contains_polygon(P(b))


@pytest.mark.parametrize("idx", range(len(RELATIONS)))
def test_polygon_relation(idx):
    a, b, contains, intersects = RELATIONS[idx]
    assert a.contains_polygon(b) == (contains > 0)
    assert b.contains_polygon(a) == (contains < 0)
    assert a.intersects_polygon(b) == intersects
    assert b.intersects_polygon(a) == intersects

"""Loop-loop relation matrix: port of S2LoopTest.testLoopRelations
(S2Geometry.Tests/S2LoopTest.cs:509-587), fixtures from :13-56."""

import pytest

from s2spark.kernel.loops import Loop
from tests.conftest import parse_vertices


def L(s):
    return Loop(parse_vertices(s))


north_hemi = L("0:-180, 0:-90, 0:0, 0:90")
south_hemi = north_hemi.inverted()
north_hemi3 = L("0:-180, 0:-60, 0:60")
west_hemi = L("0:-180, -90:0, 0:0, 90:0")
east_hemi = west_hemi.inverted()
near_hemi = L("0:-90, -90:0, 0:90, 90:0")
far_hemi = near_hemi.inverted()
candy_cane = L("-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70")
small_ne_cw = L("35:20, 45:20, 40:25")
arctic_80 = L("80:-150, 80:-30, 80:90")
antarctic_80 = L("-80:120, -80:0, -80:-120")
loop_a = L("0:178, -1:180, 0:-179, 1:-180")
loop_b = L("0:179, -1:180, 0:-178, 1:-180")
a_intersect_b = L("0:179, -1:180, 0:-179, 1:-180")
a_union_b = L("0:178, -1:180, 0:-178, 1:-180")
a_minus_b = L("0:178, -1:180, 0:179, 1:-180")
b_minus_a = L("0:-179, -1:180, 0:-178, 1:-180")

# (a, b, containsOrCrosses, intersects, nestable) — verbatim from the test
MATRIX = [
    (north_hemi, north_hemi, 1, True, False),
    (north_hemi, south_hemi, 0, False, False),
    (north_hemi, east_hemi, -1, True, False),
    (north_hemi, arctic_80, 1, True, True),
    (north_hemi, antarctic_80, 0, False, True),
    (north_hemi, candy_cane, -1, True, False),
    (north_hemi3, north_hemi3, 1, True, False),
    (north_hemi3, east_hemi, -1, True, False),
    (north_hemi3, arctic_80, 1, True, True),
    (north_hemi3, antarctic_80, 0, False, True),
    (north_hemi3, candy_cane, -1, True, False),
    (south_hemi, north_hemi, 0, False, False),
    (south_hemi, south_hemi, 1, True, False),
    (south_hemi, far_hemi, -1, True, False),
    (south_hemi, arctic_80, 0, False, True),
    (south_hemi, antarctic_80, 1, True, True),
    (south_hemi, candy_cane, -1, True, False),
    (candy_cane, north_hemi, -1, True, False),
    (candy_cane, south_hemi, -1, True, False),
    (candy_cane, arctic_80, 0, False, True),
    (candy_cane, antarctic_80, 0, False, True),
    (candy_cane, candy_cane, 1, True, False),
    (near_hemi, west_hemi, -1, True, False),
    (small_ne_cw, south_hemi, 1, True, False),
    (small_ne_cw, west_hemi, 1, True, False),
    (small_ne_cw, north_hemi, -2, True, False),
    (small_ne_cw, east_hemi, -2, True, False),
    (loop_a, loop_a, 1, True, False),
    (loop_a, loop_b, -1, True, False),
    (loop_a, a_intersect_b, 1, True, False),
    (loop_a, a_union_b, 0, True, False),
    (loop_a, a_minus_b, 1, True, False),
    (loop_a, b_minus_a, 0, False, False),
    (loop_b, loop_a, -1, True, False),
    (loop_b, loop_b, 1, True, False),
    (loop_b, a_intersect_b, 1, True, False),
    (loop_b, a_union_b, 0, True, False),
    (loop_b, a_minus_b, 0, False, False),
    (loop_b, b_minus_a, 1, True, False),
    (a_intersect_b, loop_a, 0, True, False),
    (a_intersect_b, loop_b, 0, True, False),
    (a_intersect_b, a_intersect_b, 1, True, False),
    (a_intersect_b, a_union_b, 0, True, True),
    (a_intersect_b, a_minus_b, 0, False, False),
    (a_intersect_b, b_minus_a, 0, False, False),
    (a_union_b, loop_a, 1, True, False),
    (a_union_b, loop_b, 1, True, False),
    (a_union_b, a_intersect_b, 1, True, True),
    (a_union_b, a_union_b, 1, True, False),
    (a_union_b, a_minus_b, 1, True, False),
    (a_union_b, b_minus_a, 1, True, False),
    (a_minus_b, loop_a, 0, True, False),
    (a_minus_b, loop_b, 0, False, False),
    (a_minus_b, a_intersect_b, 0, False, False),
    (a_minus_b, a_union_b, 0, True, False),
    (a_minus_b, a_minus_b, 1, True, False),
    (a_minus_b, b_minus_a, 0, False, True),
    (b_minus_a, loop_a, 0, False, False),
    (b_minus_a, loop_b, 0, True, False),
    (b_minus_a, a_intersect_b, 0, False, False),
    (b_minus_a, a_union_b, 0, True, False),
    (b_minus_a, a_minus_b, 0, False, True),
    (b_minus_a, b_minus_a, 1, True, False),
]


@pytest.mark.parametrize("idx", range(len(MATRIX)))
def test_loop_relation(idx):
    a, b, coc, intersects, nestable = MATRIX[idx]
    assert a.contains_loop(b) == (coc == 1)
    assert a.intersects_loop(b) == intersects
    if nestable:
        assert a.contains_nested(b) == a.contains_loop(b)
    if coc >= -1:
        assert a.contains_or_crosses(b) == coc

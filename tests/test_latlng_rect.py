"""S2LatLngRect parity tests ported from S2Geometry.Tests/S2LatLngRectTest.cs
(testBasic: constructors, interval-op matrix, AddPoint, Expanded,
ConvolveWithCap, CapBound, and the testCellOps relation ladder)."""

import math

import numpy as np
import pytest

from s2spark.kernel import cellid as ci
from s2spark.kernel.cap import Cap
from s2spark.kernel.cell import Cell
from s2spark.kernel.intervals import PI, LatLngRect, R1Interval, S1Interval
from s2spark.kernel.rect_region import RectRegion

D = math.radians


def rect_deg(lat_lo, lng_lo, lat_hi, lng_hi):
    # mirror the reference helper (S2LatLngRectTest.cs:166-176): the
    # two-corner constructor keeps lng order (an inverted S1Interval wraps)
    return LatLngRect(R1Interval(D(lat_lo), D(lat_hi)),
                      S1Interval(math.remainder(D(lng_lo), 2 * PI),
                                 math.remainder(D(lng_hi), 2 * PI)))


def test_basic_empty_full_accessors():
    empty, full = LatLngRect.empty(), LatLngRect.full()
    assert empty.is_valid and empty.is_empty
    assert full.is_valid and full.is_full

    d1 = rect_deg(-90, 0, -45, 180)
    assert abs(math.degrees(d1.lat.lo) - (-90)) < 1e-13
    assert abs(math.degrees(d1.lat.hi) - (-45)) < 1e-13
    assert abs(math.degrees(d1.lng.lo) - 0) < 1e-13
    assert abs(math.degrees(d1.lng.hi) - 180) < 1e-13
    assert (d1.lat.lo, d1.lat.hi) == (-PI / 2, -PI / 4)
    assert (d1.lng.lo, d1.lng.hi) == (0, PI)


def test_from_center_size_and_point_pair():
    assert LatLngRect.from_center_size(D(80), D(170), D(40), D(60)) \
        .approx_equals(rect_deg(60, 140, 90, -160))
    assert LatLngRect.from_center_size(D(10), D(40), D(210), D(400)).is_full
    assert LatLngRect.from_center_size(D(-90), D(180), D(20), D(50)) \
        .approx_equals(rect_deg(-90, 155, -80, -155))

    assert LatLngRect.from_point_pair(D(-35), D(-140), D(15), D(155)) \
        == rect_deg(-35, 155, 15, -140)
    assert LatLngRect.from_point_pair(D(25), D(-70), D(-90), D(80)) \
        == rect_deg(-90, -70, 25, 80)


def _r1():
    # rect from (0, -pi) to (pi/2, 0)
    return LatLngRect.from_point_pair(0, -PI, PI / 2, 0)


def test_center_vertex_contains():
    r1 = _r1()
    assert r1.get_center() == (PI / 4, -PI / 2)
    assert r1.get_vertex(0) == (0, PI)
    assert r1.get_vertex(1) == (0, 0)
    assert r1.get_vertex(2) == (PI / 2, 0)
    assert r1.get_vertex(3) == (PI / 2, PI)
    assert r1.contains_latlng(D(30), D(-45))
    assert not r1.contains_latlng(D(30), D(45))
    assert not r1.interior_contains_latlng(0, -PI)
    assert not r1.interior_contains_latlng(PI / 2, 0)
    assert r1.contains_point(0.5, -0.3, 0.1)
    assert not r1.contains_point(0.5, 0.2, 0.1)


def _ivl_ops(x, y, rel, exp_union, exp_inter):
    """S2LatLngRectTest.cs:13-37."""
    assert x.contains_rect(y) == (rel[0] == "T")
    assert x.interior_contains_rect(y) == (rel[1] == "T")
    assert x.intersects_rect(y) == (rel[2] == "T")
    assert x.interior_intersects_rect(y) == (rel[3] == "T")
    assert x.contains_rect(y) == (x.union(y) == x)
    assert x.intersects_rect(y) == (not x.intersection(y).is_empty)
    assert x.union(y) == exp_union
    assert x.intersection(y) == exp_inter


def test_interval_ops_matrix():
    r1 = _r1()
    empty = LatLngRect.empty()
    r1_mid = rect_deg(45, -90, 45, -90)
    r_eq_m180 = LatLngRect.from_point(0, PI)
    r_north_pole = LatLngRect.from_point(PI / 2, 0)

    _ivl_ops(r1, r1_mid, "TTTT", r1, r1_mid)
    _ivl_ops(r1, r_eq_m180, "TFTF", r1, r_eq_m180)
    _ivl_ops(r1, r_north_pole, "TFTF", r1, r_north_pole)

    assert r1 == rect_deg(0, -180, 90, 0)
    _ivl_ops(r1, rect_deg(-10, -1, 1, 20), "FFTT",
             rect_deg(-10, -180, 90, 20), rect_deg(0, -1, 1, 0))
    _ivl_ops(r1, rect_deg(-10, -1, 0, 20), "FFTF",
             rect_deg(-10, -180, 90, 20), rect_deg(0, -1, 0, 0))
    _ivl_ops(r1, rect_deg(-10, 0, 1, 20), "FFTF",
             rect_deg(-10, -180, 90, 20), rect_deg(0, 0, 1, 0))

    _ivl_ops(rect_deg(-15, -160, -15, -150), rect_deg(20, 145, 25, 155),
             "FFFF", rect_deg(-15, 145, 25, -150), LatLngRect.empty())
    _ivl_ops(rect_deg(70, -10, 90, -140), rect_deg(60, 175, 80, 5), "FFTT",
             rect_deg(60, -180, 90, 180), rect_deg(70, 175, 80, 5))

    _ivl_ops(rect_deg(12, 30, 60, 60), rect_deg(0, 0, 30, 18), "FFFF",
             rect_deg(0, 0, 60, 60), empty)
    _ivl_ops(rect_deg(0, 0, 18, 42), rect_deg(30, 12, 42, 60), "FFFF",
             rect_deg(0, 0, 42, 60), empty)


def test_add_point():
    p = LatLngRect.empty()
    p = p.add_point(0, 0)
    p = p.add_point(0, -PI / 2)
    p = p.add_point(PI / 4, -PI)
    # S2Point (0,0,1) -> lat pi/2, lng 0
    p = p.add_point(PI / 2, 0)
    assert p == _r1()


def test_expanded():
    assert rect_deg(70, 150, 80, 170).expanded(D(20), D(30)) \
        .approx_equals(rect_deg(50, 120, 90, -160))
    assert LatLngRect.empty().expanded(D(20), D(30)).is_empty
    assert LatLngRect.full().expanded(D(20), D(30)).is_full
    assert rect_deg(-90, 170, 10, 20).expanded(D(30), D(80)) \
        .approx_equals(rect_deg(-90, -180, 40, 180))


def test_convolve_with_cap():
    llr1 = rect_deg(0, 170, 0, -170).convolve_with_cap(D(15))
    llr2 = rect_deg(-15, 155, 15, -155)
    assert llr1.approx_equals(llr2, eps=1e-9)

    llr1 = rect_deg(60, 150, 80, 10).convolve_with_cap(D(15))
    llr2 = rect_deg(45, -180, 90, 180)
    assert llr1.approx_equals(llr2, eps=1e-9)


def _cap_approx_equals(a: Cap, b: Cap, eps=1e-14):
    return (all(abs(x - y) <= eps for x, y in zip(a.axis, b.axis))
            and abs(a.height - b.height) <= eps)


def test_cap_bound():
    # bounding cap at center is smaller
    assert _cap_approx_equals(
        RectRegion(rect_deg(-45, -45, 45, 45))
        .cap_bound(),
        Cap.from_axis_height((1, 0, 0), 0.5))
    # bounding cap at north pole is smaller
    assert _cap_approx_equals(
        RectRegion(rect_deg(88, -80, 89, 80))
        .cap_bound(),
        Cap.from_axis_angle((0, 0, 1), D(2)), eps=1e-9)
    # longitude span > 180
    assert _cap_approx_equals(
        RectRegion(rect_deg(-30, -150, -10, 50))
        .cap_bound(),
        Cap.from_axis_angle((0, 0, -1), D(80)), eps=1e-9)


def _cell_fpl(face, pos, level):
    return Cell(int(ci.from_face_pos_level(
        np.array([face]), np.array([pos], dtype=np.uint64),
        np.array([level]))[0]))


def _cell_ops(rect: LatLngRect, cell: Cell, level: int):
    """S2LatLngRectTest.cs:39-62: 0=no intersection, 1=MayIntersect,
    2=Intersects, 3=vertex containment, 4=Contains."""
    region = RectRegion(rect)
    vertex_contained = False
    for i in range(4):
        vx, vy, vz = cell.get_vertex_raw(i)
        if rect.contains_point(vx, vy, vz):
            vertex_contained = True
        if not rect.is_empty:
            vlat, vlng = rect.get_vertex(i)
            x = math.cos(vlat) * math.cos(vlng)
            y = math.cos(vlat) * math.sin(vlng)
            z = math.sin(vlat)
            if cell.contains_point(x, y, z):
                vertex_contained = True
    may_intersect = rect.intersects_rect(cell.rect_bound())
    assert may_intersect == (level >= 1)
    assert region.may_intersect_cell(cell) == (level >= 2)  # exact Intersects
    assert vertex_contained == (level >= 3)
    assert region.contains_cell(cell) == (level >= 4)


def test_cell_ops_ladder():
    empty, full = LatLngRect.empty(), LatLngRect.full()
    _cell_ops(empty, _cell_fpl(3, 0, 0), 0)
    _cell_ops(full, _cell_fpl(2, 0, 0), 4)
    _cell_ops(full, _cell_fpl(5, 0, 25), 4)

    r4 = rect_deg(-45.1, -45.1, 0.1, 0.1)
    _cell_ops(r4, _cell_fpl(0, 0, 0), 3)
    _cell_ops(r4, _cell_fpl(0, 0, 1), 4)
    _cell_ops(r4, _cell_fpl(1, 0, 1), 0)

    r5 = rect_deg(-10, -45, 10, 0)
    _cell_ops(r5, _cell_fpl(0, 0, 0), 3)
    _cell_ops(r5, _cell_fpl(0, 0, 1), 3)
    _cell_ops(r5, _cell_fpl(1, 0, 1), 0)

    _cell_ops(rect_deg(4, 4, 4, 4), _cell_fpl(0, 0, 0), 3)

    # intersect the face's bounding rect but not the face itself
    _cell_ops(rect_deg(41, -87, 42, -79), _cell_fpl(2, 0, 0), 1)
    _cell_ops(rect_deg(-41, 160, -40, -160), _cell_fpl(5, 0, 0), 1)

    # leaf cell at the top-right corner of face 0
    n = math.sqrt(1 + (1 + 1e-12) ** 2 + 1)
    cid = ci.from_point(np.array([(1 + 1e-12) / n]), np.array([1 / n]),
                        np.array([1 / n]))
    cell0tr = Cell(int(cid[0]))
    vx, vy, vz = cell0tr.get_vertex_raw(0)
    v0_lat = math.degrees(math.atan2(vz, math.hypot(vx, vy)))
    v0_lng = math.degrees(math.atan2(vy, vx))
    _cell_ops(rect_deg(v0_lat - 1e-8, v0_lng - 1e-8,
                       v0_lat - 2e-10, v0_lng + 1e-10), cell0tr, 1)

    # passes through a corner of a face cell (no vertex containment)
    _cell_ops(rect_deg(-37, -70, -36, -20), _cell_fpl(5, 0, 0), 2)

    # diamond-and-square intersection
    cell202 = _cell_fpl(2, 0, 2)
    b202 = cell202.rect_bound()
    _cell_ops(rect_deg(math.degrees(b202.lat.lo) + 3,
                       math.degrees(b202.lng.lo) + 3,
                       math.degrees(b202.lat.hi) - 3,
                       math.degrees(b202.lng.hi) - 3), cell202, 2)

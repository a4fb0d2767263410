"""S2Cap parity tests ported from S2Geometry.Tests/S2CapTest.cs
(S2CapBasicTest, testCells, testRectBound)."""

import math

import numpy as np
import pytest

from s2spark.kernel import cellid as ci
from s2spark.kernel.cap import Cap
from s2spark.kernel.cell import Cell

EPS = 1e-15  # S2CapTest.cs:19
K_TINY_RAD = 1e-10


def latlng_point(lat_deg, lng_deg):
    x, y, z = ci.xyz_from_latlng_deg(np.array([lat_deg], dtype=np.float64),
                                     np.array([lng_deg], dtype=np.float64))
    return (float(x[0]), float(y[0]), float(z[0]))


def normalize(p):
    n = math.sqrt(sum(v * v for v in p))
    return tuple(v / n for v in p)


def face_norm(face):
    x, y, z = ci.face_uv_to_xyz(np.array([face]), np.array([0.0]), np.array([0.0]))
    return normalize((float(x[0]), float(y[0]), float(z[0])))


def dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def test_cap_basic():
    """S2CapTest.cs:141-232."""
    empty, full = Cap.empty(), Cap.full()
    assert empty.is_valid and empty.is_empty and empty.complement().is_full
    assert full.is_valid and full.is_full and full.complement().is_empty
    assert full.height == 2.0
    assert abs(math.degrees(full.angle_radians) - 180) < 1e-9

    assert empty.contains_cap(empty)
    assert full.contains_cap(empty)
    assert full.contains_cap(full)
    assert not empty.interior_intersects(empty)
    assert full.interior_intersects(full)
    assert not full.interior_intersects(empty)

    xaxis = Cap.from_axis_height((1, 0, 0), 0)
    assert xaxis.contains_point(1, 0, 0)
    assert not xaxis.contains_point(1, 1e-20, 0)
    assert xaxis.angle_radians == 0.0

    yaxis = Cap.from_axis_angle((0, 1, 0), 0.0)
    assert not yaxis.contains_point(*xaxis.axis)
    assert xaxis.height == 0.0

    xcomp = xaxis.complement()
    assert xcomp.is_valid and xcomp.is_full
    assert xcomp.contains_point(*xaxis.axis)
    assert xcomp.complement().is_valid and xcomp.complement().is_empty
    assert not xcomp.complement().contains_point(*xaxis.axis)

    # very small caps represented accurately
    tiny = Cap.from_axis_angle(normalize((1, 2, 3)), K_TINY_RAD)
    t = normalize((tiny.axis[1] * 1 - tiny.axis[2] * 2,
                   tiny.axis[2] * 3 - tiny.axis[0] * 1,
                   tiny.axis[0] * 2 - tiny.axis[1] * 3))  # axis x (3,2,1)
    p_in = tuple(a + tv * 0.99 * K_TINY_RAD for a, tv in zip(tiny.axis, t))
    p_out = tuple(a + tv * 1.01 * K_TINY_RAD for a, tv in zip(tiny.axis, t))
    assert tiny.contains_point(*p_in)
    assert not tiny.contains_point(*p_out)

    # hemispherical cap
    hemi = Cap.from_axis_height(normalize((1, 0, 1)), 1)
    assert hemi.complement().axis == tuple(-v for v in hemi.axis)
    assert hemi.complement().height == 1.0
    assert hemi.contains_point(1, 0, 0)
    assert not hemi.complement().contains_point(1, 0, 0)
    assert hemi.contains_point(*normalize((1, 0, -(1 - EPS))))
    assert not hemi.interior_contains_point(*normalize((1, 0, -(1 + EPS))))

    # concave cap
    concave = Cap.from_axis_angle(latlng_point(80, 10), math.radians(150))
    assert concave.contains_point(*latlng_point(-70 * (1 - EPS), 10))
    assert not concave.contains_point(*latlng_point(-70 * (1 + EPS), 10))
    assert concave.contains_point(*latlng_point(-50 * (1 - EPS), -170))
    assert not concave.contains_point(*latlng_point(-50 * (1 + EPS), -170))

    # cap containment matrix
    assert not empty.contains_cap(xaxis)
    assert not empty.interior_intersects(xaxis)
    assert full.contains_cap(xaxis)
    assert full.interior_intersects(xaxis)
    assert not xaxis.contains_cap(full)
    assert not xaxis.interior_intersects(full)
    assert xaxis.contains_cap(xaxis)
    assert not xaxis.interior_intersects(xaxis)
    assert xaxis.contains_cap(empty)
    assert not xaxis.interior_intersects(empty)
    assert hemi.contains_cap(tiny)
    assert hemi.contains_cap(Cap.from_axis_angle((1, 0, 0), math.pi / 4 - EPS))
    assert not hemi.contains_cap(Cap.from_axis_angle((1, 0, 0), math.pi / 4 + EPS))
    assert concave.contains_cap(hemi)
    assert concave.interior_intersects(hemi.complement())
    assert not concave.contains_cap(
        Cap.from_axis_height(tuple(-v for v in concave.axis), 0.1))


def _leaf_cell_at(face, u, v):
    x, y, z = ci.face_uv_to_xyz(np.array([face]), np.array([u]), np.array([v]))
    p = normalize((float(x[0]), float(y[0]), float(z[0])))
    cid = ci.from_point(np.array([p[0]]), np.array([p[1]]), np.array([p[2]]))
    return Cell(int(cid[0]))


@pytest.mark.parametrize("face", range(6))
def test_cap_cells(face):
    """S2CapTest.cs:71-139 (per cube face)."""
    k_face_radius = math.atan(math.sqrt(2.0))
    root_cell = Cell(int(ci.from_face_pos_level(
        np.array([face]), np.array([0], dtype=np.uint64), np.array([0]))[0]))
    edge_cell = _leaf_cell_at(face, 0.0, 1 - EPS)
    corner_cell = _leaf_cell_at(face, 1 - EPS, 1 - EPS)

    assert Cap.full().contains_cell(root_cell)
    assert not Cap.empty().may_intersect_cell(root_cell)

    # Hilbert-adjacent leaf neighbors of the corner cell
    corner_id = np.array([corner_cell.id], dtype=np.uint64)
    first = int(corner_id[0]) - 6   # Previous x3 (leaf step = 2)
    last = int(corner_id[0]) + 8    # Next x4
    parent29 = ci.parent_for_level(corner_id, 29)
    for raw in range(first, last, 2):
        cell = Cell(raw)
        cb = cell.cap_bound()
        assert cb.contains_cell(corner_cell) == (raw == int(corner_id[0]))
        expect_may = bool(ci.contains(
            ci.parent_for_level(np.array([raw], dtype=np.uint64), 29),
            parent29)[0])
        assert cb.may_intersect_cell(corner_cell) == expect_may

    anti_face = (face + 3) % 6
    for cap_face in range(6):
        center = face_norm(cap_face)
        covering = Cap.from_axis_angle(center, k_face_radius + EPS)
        assert covering.contains_cell(root_cell) == (cap_face == face)
        assert covering.may_intersect_cell(root_cell) == (cap_face != anti_face)
        assert covering.contains_cell(edge_cell) == \
            (dot(center, edge_cell.get_center()) > 0.1)
        assert covering.contains_cell(edge_cell) == \
            covering.may_intersect_cell(edge_cell)
        assert covering.contains_cell(corner_cell) == (cap_face == face)
        assert covering.may_intersect_cell(corner_cell) == \
            (dot(center, corner_cell.get_center()) > 0)

        bulging = Cap.from_axis_angle(center, math.pi / 4 + EPS)
        assert not bulging.contains_cell(root_cell)
        assert bulging.may_intersect_cell(root_cell) == (cap_face != anti_face)
        assert bulging.contains_cell(edge_cell) == (cap_face == face)
        assert bulging.may_intersect_cell(edge_cell) == \
            (dot(center, edge_cell.get_center()) > 0.1)
        assert not bulging.contains_cell(corner_cell)
        assert not bulging.may_intersect_cell(corner_cell)

        singleton = Cap.from_axis_angle(center, 0.0)
        assert singleton.may_intersect_cell(root_cell) == (cap_face == face)
        assert not singleton.may_intersect_cell(edge_cell)
        assert not singleton.may_intersect_cell(corner_cell)


def test_cap_rect_bound():
    """S2CapTest.cs:21-69."""
    deg_eps = 1e-13
    assert Cap.empty().rect_bound().is_empty
    assert Cap.full().rect_bound().is_full

    # cap including the south pole
    rect = Cap.from_axis_angle(latlng_point(-45, 57), math.radians(50)).rect_bound()
    assert abs(math.degrees(rect.lat.lo) - (-90)) < deg_eps
    assert abs(math.degrees(rect.lat.hi) - 5) < deg_eps
    assert rect.lng.is_full

    # cap tangent to the north pole
    rect = Cap.from_axis_angle(normalize((1, 0, 1)), math.pi / 4).rect_bound()
    assert abs(rect.lat.lo - 0) < 1e-9
    assert abs(rect.lat.hi - math.pi / 2) < 1e-9
    assert rect.lng.is_full

    rect = Cap.from_axis_angle(normalize((1, 0, 1)), math.radians(45)).rect_bound()
    assert abs(math.degrees(rect.lat.lo) - 0) < deg_eps
    assert abs(math.degrees(rect.lat.hi) - 90) < deg_eps
    assert rect.lng.is_full

    # eastern hemisphere
    rect = Cap.from_axis_angle((0, 1, 0), math.pi / 2 + 5e-16).rect_bound()
    assert abs(math.degrees(rect.lat.lo) - (-90)) < deg_eps
    assert abs(math.degrees(rect.lat.hi) - 90) < deg_eps
    assert rect.lng.is_full

    # cap centered on the equator
    rect = Cap.from_axis_angle(latlng_point(0, 50), math.radians(20)).rect_bound()
    assert abs(math.degrees(rect.lat.lo) - (-20)) < deg_eps
    assert abs(math.degrees(rect.lat.hi) - 20) < deg_eps
    assert abs(math.degrees(rect.lng.lo) - 30) < deg_eps
    assert abs(math.degrees(rect.lng.hi) - 70) < deg_eps

    # cap centered on the north pole
    rect = Cap.from_axis_angle(latlng_point(90, 123), math.radians(10)).rect_bound()
    assert abs(math.degrees(rect.lat.lo) - 80) < deg_eps
    assert abs(math.degrees(rect.lat.hi) - 90) < deg_eps
    assert rect.lng.is_full

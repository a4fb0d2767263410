"""Base S2 math parity tests ported from S2Geometry.Tests/S2Test.cs
(testAngleArea, testCCW, testExp, testFaceUVtoXYZ, testMetrics, testSTUV,
testTraversalOrder, testUVAxes, testUVNorms)."""

import math

import numpy as np
import pytest

from s2spark.kernel import cellid as ci
from s2spark.kernel import metrics as M
from s2spark.kernel import sphere
from s2spark.kernel.hilbert import (IJ_TO_POS, INVERT_MASK, POS_TO_IJ,
                                    SWAP_MASK)

A = lambda *vs: [np.array([v], dtype=np.float64) for v in vs]


def ang(a, b, c):
    """Angle at b of triangle abc (S2.Angle)."""
    return float(sphere.angle(*(sphere.cross(*a, *b) + sphere.cross(*c, *b))))


def area(a, b, c):
    return float(sphere.triangle_area(*A(*a, *b, *c))[0])


def test_angle_area():
    """S2Test.cs:60-127."""
    pz, p000, p045 = (0, 0, 1), (1, 0, 0), (1, 1, 0)
    p090, p180 = (0, 1, 0), (-1, 0, 0)
    assert abs(ang(p000, pz, p045) - math.pi / 4) < 1e-9
    assert abs(ang(p045, pz, p180) - 3 * math.pi / 4) < 1e-9
    assert abs(ang(p000, pz, p180) - math.pi) < 1e-9
    assert abs(ang(pz, p000, pz) - 0) < 1e-9
    assert abs(ang(pz, p000, p045) - math.pi / 2) < 1e-9

    assert abs(area(p000, p090, pz) - math.pi / 2) < 1e-9
    assert abs(area(p045, pz, p180) - 3 * math.pi / 4) < 1e-9

    # relative accuracy for very small areas
    eps = 1e-10
    expected1 = 0.5 * eps * eps
    assert abs(area((eps, 0, 1), (0, eps, 1), pz) - expected1) < 1e-14 * expected1

    # degenerate triangles
    pr = (0.257, -0.5723, 0.112)
    pq = (-0.747, 0.401, 0.2235)
    assert area(pr, pr, pr) == 0.0
    assert abs(area(pr, pq, pr)) < 1e-15
    assert area(p000, p045, p090) == 0.0

    # triangles perturbed by 1e-15 have area < 0.7e-30
    rng = np.random.default_rng(99)

    def rand_pts(n):
        z = rng.uniform(-1, 1, n)
        th = rng.uniform(-math.pi, math.pi, n)
        r = np.sqrt(1 - z * z)
        return np.stack([r * np.cos(th), r * np.sin(th), z], axis=1)

    p0 = rand_pts(10000)
    p1 = p0 + rand_pts(10000) * 1e-15
    p2 = p0 + rand_pts(10000) * 1e-15
    areas = sphere.triangle_area(p0[:, 0], p0[:, 1], p0[:, 2],
                                 p1[:, 0], p1[:, 1], p1[:, 2],
                                 p2[:, 0], p2[:, 1], p2[:, 2])
    assert np.all(areas < 0.7e-30)

    # long skinny triangle (Mathematica golden)
    expected2 = 5.8578643762690495119753e-11
    assert abs(area(p000, (1, 1, eps), p090) - expected2) < 1e-9 * expected2

    # near-180-degree edges summing to a quarter sphere
    eps2 = 1e-10
    for apex in ((1, 0.1 * eps2, eps2), (1, 1, eps2)):
        quarter = (area(apex, p000, p090) + area(apex, p090, p180)
                   + area(apex, p180, pz) + area(apex, pz, p000))
        assert abs(quarter - math.pi) < 1e-9


def test_ccw_golden():
    """S2Test.cs:130-137: nearly-collinear triple must not return 0."""
    a = (0.72571927877036835, 0.46058825605889098, 0.51106749730504852)
    b = (0.7257192746638208, 0.46058826573818168, 0.51106749441312738)
    c = (0.72571927671709457, 0.46058826089853633, 0.51106749585908795)
    got = sphere.robust_ccw(*A(*a, *b, *c))
    assert int(got[0]) != 0


def test_exp():
    """S2Test.cs:139-154 (exponent extraction used by the metrics)."""
    for i in range(10):
        assert M._exp(2.0 ** i) == i + 1
        assert M._exp(-(2.0 ** i)) == i + 1
    assert M._exp(0) == 0
    assert M._exp(3) == 2
    assert M._exp(5) == 3


def _face_uv(face, u, v):
    x, y, z = ci.face_uv_to_xyz(np.array([face]), np.array([float(u)]),
                                np.array([float(v)]))
    return (float(x[0]), float(y[0]), float(z[0]))


def test_face_uv_to_xyz():
    """S2Test.cs:157-189."""
    total = np.zeros(3)
    for face in range(6):
        center = _face_uv(face, 0, 0)
        assert max(abs(c) for c in center) == 1.0
        total += np.abs(center)
    assert np.array_equal(total, [2.0, 2.0, 2.0])

    # right-handed coordinate system per face
    for face in range(6):
        o = np.array(_face_uv(face, 0, 0))
        u_axis = np.array(_face_uv(face, 1, 0)) - o
        v_axis = np.array(_face_uv(face, 0, 1)) - o
        assert abs(float(np.dot(np.cross(u_axis, v_axis), o)) - 1.0) < 1e-14

    # Hilbert curve continuity across faces
    for face in range(6):
        sign = -1.0 if (face & SWAP_MASK) else 1.0
        assert _face_uv(face, sign, -sign) == _face_uv((face + 1) % 6, -1, -1)


def test_stuv():
    """S2Test.cs:275-289: boundary + inverse over the grid."""
    for x in (-1.0, 0.0, 1.0):
        assert ci.st_to_uv(np.array([x]))[0] == x
        assert ci.uv_to_st(np.array([x]))[0] == x
    xs = np.arange(-1.0, 1.0, 0.0001)
    assert np.allclose(ci.uv_to_st(ci.st_to_uv(xs)), xs, atol=1e-12)
    assert np.allclose(ci.st_to_uv(ci.uv_to_st(xs)), xs, atol=1e-12)


def _swap_axes(ij):
    return ((ij >> 1) & 1) + ((ij & 1) << 1)


def _invert_bits(ij):
    return ij ^ 3


def test_traversal_order():
    """S2Test.cs:292-315: LUT symmetry and inverse laws."""
    for r in range(4):
        for i in range(4):
            assert IJ_TO_POS[r][i] == IJ_TO_POS[r ^ SWAP_MASK][_swap_axes(i)]
            assert POS_TO_IJ[r][i] == _swap_axes(POS_TO_IJ[r ^ SWAP_MASK][i])
            assert IJ_TO_POS[r][i] == IJ_TO_POS[r ^ INVERT_MASK][_invert_bits(i)]
            assert POS_TO_IJ[r][i] == _invert_bits(POS_TO_IJ[r ^ INVERT_MASK][i])
            assert IJ_TO_POS[r][POS_TO_IJ[r][i]] == i
            assert POS_TO_IJ[r][IJ_TO_POS[r][i]] == i


def _bundle(mn, mx, avg):
    assert mn.deriv <= avg.deriv <= mx.deriv
    assert mn.dim == mx.dim == avg.dim


def test_metrics():
    """S2Test.cs:191-272: ordering laws + level-solver boundary cases."""
    _bundle(M.MIN_ANGLE_SPAN, M.MAX_ANGLE_SPAN, M.AVG_ANGLE_SPAN)
    _bundle(M.MIN_WIDTH, M.MAX_WIDTH, M.AVG_WIDTH)
    _bundle(M.MIN_EDGE, M.MAX_EDGE, M.AVG_EDGE)
    _bundle(M.MIN_DIAG, M.MAX_DIAG, M.AVG_DIAG)
    _bundle(M.MIN_AREA, M.MAX_AREA, M.AVG_AREA)

    # provable orderings
    assert M.MIN_WIDTH.deriv <= M.MIN_ANGLE_SPAN.deriv
    assert M.MAX_WIDTH.deriv <= M.MAX_ANGLE_SPAN.deriv + 1e-15
    assert M.MIN_WIDTH.deriv <= M.MIN_EDGE.deriv
    assert M.MAX_WIDTH.deriv <= M.MAX_EDGE.deriv + 1e-15
    assert M.MIN_EDGE.deriv <= M.MIN_DIAG.deriv
    assert M.MAX_EDGE.deriv <= M.MAX_DIAG.deriv + 1e-15
    assert M.MIN_AREA.deriv >= M.MIN_WIDTH.deriv * M.MIN_EDGE.deriv - 1e-15
    assert M.MAX_AREA.deriv < M.MAX_WIDTH.deriv * M.MAX_EDGE.deriv + 1e-15

    for level in range(-2, ci.MAX_LEVEL + 4):
        d_width = (2 * M.MIN_WIDTH.deriv) * 2.0 ** (-level)
        if level >= ci.MAX_LEVEL + 3:
            d_width = 0
        expected = max(0, min(ci.MAX_LEVEL, level))
        assert M.MIN_WIDTH.get_min_level(d_width) == expected
        assert M.MIN_WIDTH.get_max_level(d_width) == expected
        assert M.MIN_WIDTH.get_closest_level(d_width) == expected
        assert M.MIN_WIDTH.get_min_level(1.2 * d_width) == expected
        assert M.MIN_WIDTH.get_max_level(0.8 * d_width) == expected
        assert M.MIN_WIDTH.get_closest_level(1.2 * d_width) == expected
        assert M.MIN_WIDTH.get_closest_level(0.8 * d_width) == expected

        area1 = (4 * M.MIN_AREA.deriv) * 4.0 ** (-level)
        if level <= -3:
            area1 = 0
        assert M.MIN_AREA.get_min_level(area1) == expected
        assert M.MIN_AREA.get_max_level(area1) == expected
        assert M.MIN_AREA.get_closest_level(area1) == expected
        assert M.MIN_AREA.get_min_level(1.2 * area1) == expected
        assert M.MIN_AREA.get_max_level(0.8 * area1) == expected
        assert M.MIN_AREA.get_closest_level(1.2 * area1) == expected
        assert M.MIN_AREA.get_closest_level(0.8 * area1) == expected


def test_uv_norms():
    """S2Test.cs:331-350: right-handed edge normals along the grid."""
    from s2spark.kernel.cell import _get_u_norm, _get_v_norm
    for face in range(6):
        for x in np.arange(-1.0, 1.0 + 1 / 1024.0, 1 / 1024.0):
            a = _face_uv(face, x, -1)
            b = _face_uv(face, x, 1)
            n = np.cross(a, b)
            un = np.array(_get_u_norm(face, float(x)))
            cosang = float(np.dot(n, un) / (np.linalg.norm(n) * np.linalg.norm(un)))
            assert abs(cosang - 1.0) < 1e-12
            a = _face_uv(face, -1, x)
            b = _face_uv(face, 1, x)
            n = np.cross(a, b)
            vn = np.array(_get_v_norm(face, float(x)))
            cosang = float(np.dot(n, vn) / (np.linalg.norm(n) * np.linalg.norm(vn)))
            assert abs(cosang - 1.0) < 1e-12


def test_interior_and_turn_angle():
    """S2Test.cs:60-71 Angle goldens + TurnAngle antisymmetry law."""
    import math

    import numpy as np

    from s2spark.kernel import sphere

    pz = (0.0, 0.0, 1.0)
    p000 = (1.0, 0.0, 0.0)
    p045 = (1.0, 1.0, 0.0)
    p090 = (0.0, 1.0, 0.0)
    p180 = (-1.0, 0.0, 0.0)

    def ang(a, b, c):
        return float(sphere.interior_angle(*a, *b, *c))

    assert abs(ang(p000, pz, p045) - math.pi / 4) < 1e-12
    assert abs(ang(p045, pz, p180) - 3 * math.pi / 4) < 1e-12
    assert abs(ang(p000, pz, p180) - math.pi) < 1e-12
    assert abs(ang(pz, p000, pz)) < 1e-12
    assert abs(ang(pz, p000, p045) - math.pi / 2) < 1e-12

    # turn angle: positive iff CCW, and turn(a,b,c) == -turn(c,b,a) exactly
    rng = np.random.default_rng(7)
    for _ in range(50):
        v = rng.normal(size=(3, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        a, b, c = (tuple(map(float, row)) for row in v)
        t1 = float(sphere.turn_angle(*a, *b, *c))
        t2 = float(sphere.turn_angle(*c, *b, *a))
        assert t1 == -t2
        from s2spark.kernel.sphere import robust_ccw
        assert (t1 > 0) == (int(robust_ccw(*a, *b, *c)) > 0)


def test_cap_area_constructors():
    """S2Cap area/FromAxisArea round-trip (S2Cap.cs:66-69, 307-311)."""
    import math

    from s2spark.kernel.cap import Cap

    axis = (1.0, 0.0, 0.0)
    for area in [0.1, math.pi, 2 * math.pi, 4 * math.pi]:
        cap = Cap.from_axis_area(axis, area)
        assert abs(cap.area - area) < 1e-12
    assert Cap.empty().area == 0.0
    assert abs(Cap.full().area - 4 * math.pi) < 1e-12

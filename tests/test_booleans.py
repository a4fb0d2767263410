"""Polygon boolean-op conformance: S2PolygonTest union goldens + point-set
algebra laws on random samples."""

import math

import numpy as np
import pytest

from s2spark.kernel import booleans, cellid as ci
from s2spark.sources.fixtures import make_polygon

ADJACENT0 = "0:1, 1:1, 2:1, 2:0, 1:0, 0:0;"
ADJACENT1 = "0:2, 1:2, 2:2, 2:1.01, 1:0.99, 0:1.01;"
UN_ADJACENT = "10:10, 11:10, 12:10, 12:9, 11:9, 10:9;"


def _latlng_deg(p):
    lat = math.degrees(math.atan2(p[2], math.hypot(p[0], p[1])))
    lng = math.degrees(math.atan2(p[1], p[0]))
    return lat, lng


def test_union_sloppy_success():
    # S2PolygonTest.cs:323-349 — sloppy union with 0.1 deg merge closes the
    # slightly-off shared edge into one 8-vertex loop
    u = booleans.destructive_union(
        [make_polygon(ADJACENT0), make_polygon(ADJACENT1)],
        merge_radius=math.radians(0.1))
    assert len(u.loops) == 1
    loop = u.loops[0]
    assert loop.num_vertices == 8
    expected = [(2, 0), (1, 0), (0, 0), (0, 1), (0, 2), (1, 2), (2, 2), (2, 1)]
    got = [_latlng_deg(loop.vertex(k)) for k in range(8)]
    # same cyclic sequence within the reference's 0.01-degree tolerance
    # (assertPointApproximatelyEquals, S2PolygonTest.cs:341-348)
    def matches_with_rotation(seq):
        for rev in (seq, seq[::-1]):
            for s in range(len(rev)):
                rot = rev[s:] + rev[:s]
                if all(abs(g[0] - e[0]) <= 0.0101 and abs(g[1] - e[1]) <= 0.0101
                       for g, e in zip(rot, expected)):
                    return True
        return False
    assert matches_with_rotation(got)


def test_union_sloppy_failure():
    # S2PolygonTest.cs:310-320 — far-apart polygons stay 2 loops
    u = booleans.destructive_union(
        [make_polygon(ADJACENT0), make_polygon(UN_ADJACENT)],
        merge_radius=math.radians(0.1))
    assert len(u.loops) == 2


@pytest.fixture(scope="module")
def sample_points():
    rng = np.random.default_rng(17)
    lats = rng.uniform(-2, 9, 40000)
    lngs = rng.uniform(-2, 9, 40000)
    return ci.xyz_from_latlng_deg(lats, lngs)


@pytest.mark.parametrize("a_str,b_str", [
    ("0:0, 0:4, 4:4, 4:0;", "2:2, 2:6, 6:6, 6:2;"),          # overlapping quads
    ("0:0, 0:4, 4:4, 4:0;", "1:1, 1:2, 2:2, 2:1;"),          # B inside A
    ("0:0, 0:4, 4:4, 4:0;", "5:5, 5:8, 8:8, 8:5;"),          # disjoint
    ("6:-3, -3:6, -2:-2;-1:0, 0:1, 1:0, 0:-1;",               # A has a hole
     "0:0, 0:4, 4:4, 4:0;"),
])
def test_boolean_point_set_laws(a_str, b_str, sample_points):
    x, y, z = sample_points
    A = make_polygon(a_str)
    B = make_polygon(b_str)
    in_a = A.contains_points(x, y, z)
    in_b = B.contains_points(x, y, z)
    I = booleans.intersection(A, B)
    U = booleans.union(A, B)
    D = booleans.difference(A, B)
    assert np.array_equal(I.contains_points(x, y, z), in_a & in_b)
    assert np.array_equal(U.contains_points(x, y, z), in_a | in_b)
    assert np.array_equal(D.contains_points(x, y, z), in_a & ~in_b)


@pytest.mark.parametrize("b_str", [
    "0:4, 0:8, 4:8, 4:4;",   # B abuts A along A's full lng=4 edge (outside A)
    "0:2, 0:4, 4:4, 4:2;",   # B is the right half of A (3 shared chains)
    "1:4, 1:6, 3:6, 3:4;",   # B abuts part of A's lng=4 edge
])
def test_difference_shared_edge(b_str, sample_points):
    """A minus B where B shares boundary edges with A — exercises the
    direction-sensitive vertex-crossing path (reverse_b=True in the first
    clip of InitToDifference)."""
    x, y, z = sample_points
    A = make_polygon("0:0, 0:4, 4:4, 4:0;")
    B = make_polygon(b_str)
    D = booleans.difference(A, B)
    in_a = A.contains_points(x, y, z)
    in_b = B.contains_points(x, y, z)
    assert np.array_equal(D.contains_points(x, y, z), in_a & ~in_b)


def _cap_polygon_at(rng, center, n_verts, max_radius_deg=25.0):
    """Convex polygon: n_verts around `center` at a random angular radius.
    Vertex angles are evenly spaced + bounded jitter so every angular gap
    stays < pi — the polygon genuinely SURROUNDS its center (n unbounded
    random angles can cluster in a half-turn, yielding a sliver whose
    orientation-certified form is a >hemisphere complement polygon, which
    the reference's boolean ops reject by design: S2Polygon.cs:375-386
    'loop encloses more than half the sphere')."""
    from s2spark.kernel.loops import Loop, Polygon
    c = center
    e1 = rng.normal(size=3)
    e1 -= e1 @ c * c
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(c, e1)
    r = math.radians(rng.uniform(2.0, max_radius_deg))
    step = 2 * math.pi / n_verts
    th = (np.arange(n_verts) * step
          + rng.uniform(0.0, 0.4 * step, n_verts)
          + rng.uniform(0.0, 2 * math.pi))
    verts = (math.cos(r) * c[None, :]
             + math.sin(r) * (np.cos(th)[:, None] * e1[None, :]
                              + np.sin(th)[:, None] * e2[None, :]))
    loop = Loop(verts)
    if not bool(loop.contains_points(np.array([c[0]]), np.array([c[1]]),
                                     np.array([c[2]]))[0]):
        loop = Loop(verts[::-1].copy())
    assert loop.is_normalized, "fixture must stay within a hemisphere"
    return Polygon([loop]), c, r


def _random_cap_polygon(rng, n_verts, max_radius_deg=25.0):
    c = rng.normal(size=3)
    c /= np.linalg.norm(c)
    return _cap_polygon_at(rng, c, n_verts, max_radius_deg)


def test_boolean_point_set_laws_fuzz():
    """Randomized extension of the algebra laws: random convex cap
    polygons (random centers/radii/vertex counts — overlapping, nested,
    and disjoint arise by construction), each pair checked against
    point-membership ground truth on samples concentrated where the
    boundaries are."""
    rng = np.random.default_rng(20260817)
    for trial in range(12):
        A, ca, ra = _random_cap_polygon(rng, int(rng.integers(3, 12)))
        if trial % 3 == 0:      # force frequent overlap/nesting
            cb = ca + rng.normal(scale=math.sin(ra), size=3)
            cb /= np.linalg.norm(cb)
        else:
            cb = None
        B, cb, rb = _random_cap_polygon(rng, int(rng.integers(3, 12))) \
            if cb is None else _nearby_cap_polygon(rng, cb)
        # sample around both boundaries + uniformly
        pts = []
        for c, r in ((ca, ra), (cb, rb)):
            d = rng.normal(size=(4000, 3))
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            t = r * rng.uniform(0.0, 2.5, 4000)
            p = (np.cos(t)[:, None] * c[None, :]
                 + np.sin(t)[:, None] * np.cross(c, d))
            p /= np.linalg.norm(p, axis=1, keepdims=True)
            pts.append(p)
        g = rng.normal(size=(2000, 3))
        pts.append(g / np.linalg.norm(g, axis=1, keepdims=True))
        P = np.concatenate(pts)
        x, y, z = P[:, 0], P[:, 1], P[:, 2]
        in_a = A.contains_points(x, y, z)
        in_b = B.contains_points(x, y, z)
        I = booleans.intersection(A, B)
        U = booleans.union(A, B)
        D = booleans.difference(A, B)
        assert np.array_equal(I.contains_points(x, y, z), in_a & in_b), \
            f"trial {trial}: intersection law"
        assert np.array_equal(U.contains_points(x, y, z), in_a | in_b), \
            f"trial {trial}: union law"
        assert np.array_equal(D.contains_points(x, y, z), in_a & ~in_b), \
            f"trial {trial}: difference law"


def _nearby_cap_polygon(rng, center):
    return _cap_polygon_at(rng, center, int(rng.integers(3, 12)))


def test_inclusion_exclusion_area():
    A = make_polygon("0:0, 0:4, 4:4, 4:0;")
    B = make_polygon("2:2, 2:6, 6:6, 6:2;")
    I = booleans.intersection(A, B)
    U = booleans.union(A, B)
    lhs = U.get_area_centroid()[0] + I.get_area_centroid()[0]
    rhs = A.get_area_centroid()[0] + B.get_area_centroid()[0]
    assert lhs == pytest.approx(rhs, rel=1e-10)


def test_boolean_point_set_laws_fuzz_with_holes():
    """Point-set law fuzz where one operand carries a HOLE (the convex
    fuzz above never nests loops, while the reference's relation matrices
    exercise shell+hole polygons, S2PolygonTest.cs:15-61).  The holed
    operand A is CONSTRUCTED as difference(shell, hole-island), so its
    ground-truth membership is in_shell & ~in_hole — computed from the
    convex inputs, never from A itself — and every law on (A, B) then
    exercises boolean ops whose input already nests loops."""
    rng = np.random.default_rng(50505)
    holed_trials = 0
    for trial in range(12):
        # shell with >= 6 vertices: its inscribed cap radius is
        # >= cos(pi/6) * r_shell, so a concentric island with vertex
        # radius <= 0.4 * r_shell is strictly inside and the difference
        # is a genuine shell+hole polygon
        S, cs, rs = _random_cap_polygon(rng, int(rng.integers(6, 12)))
        H, _, rh = _cap_polygon_at(
            rng, cs, int(rng.integers(3, 8)),
            max_radius_deg=max(2.01, 0.4 * math.degrees(rs)))
        if rh >= 0.5 * rs:          # _cap_polygon_at floors radius at 2 deg
            continue                # tiny shell: skip, can't nest safely
        A = booleans.difference(S, H)
        assert len(A.loops) >= 2 and max(lp.depth for lp in A.loops) >= 1, \
            f"trial {trial}: fixture failed to produce a hole"
        holed_trials += 1
        # B: near the shell boundary (even trials) or near the hole
        # boundary (odd trials), so B regularly straddles the hole edge
        anchor_r = rs if trial % 2 == 0 else rh
        cb = cs + rng.normal(scale=math.sin(max(anchor_r, 1e-3)), size=3)
        cb /= np.linalg.norm(cb)
        B, cb, rb = _cap_polygon_at(rng, cb, int(rng.integers(3, 10)),
                                    max_radius_deg=25.0)
        pts = []
        for c, r in ((cs, rs), (cs, max(rh, 1e-3)), (cb, rb)):
            d = rng.normal(size=(3000, 3))
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            t = r * rng.uniform(0.0, 2.5, 3000)
            p = (np.cos(t)[:, None] * c[None, :]
                 + np.sin(t)[:, None] * np.cross(c, d))
            p /= np.linalg.norm(p, axis=1, keepdims=True)
            pts.append(p)
        g = rng.normal(size=(2000, 3))
        pts.append(g / np.linalg.norm(g, axis=1, keepdims=True))
        P = np.concatenate(pts)
        x, y, z = P[:, 0], P[:, 1], P[:, 2]
        in_a = S.contains_points(x, y, z) & ~H.contains_points(x, y, z)
        assert np.array_equal(A.contains_points(x, y, z), in_a), \
            f"trial {trial}: holed construction law"
        in_b = B.contains_points(x, y, z)
        I = booleans.intersection(A, B)
        U = booleans.union(A, B)
        D = booleans.difference(A, B)
        Drev = booleans.difference(B, A)
        assert np.array_equal(I.contains_points(x, y, z), in_a & in_b), \
            f"trial {trial}: intersection law (holed operand)"
        assert np.array_equal(U.contains_points(x, y, z), in_a | in_b), \
            f"trial {trial}: union law (holed operand)"
        assert np.array_equal(D.contains_points(x, y, z), in_a & ~in_b), \
            f"trial {trial}: difference law (holed operand)"
        assert np.array_equal(Drev.contains_points(x, y, z), in_b & ~in_a), \
            f"trial {trial}: reverse-difference law (B minus holed A)"
    assert holed_trials >= 10, \
        f"only {holed_trials} holed trials ran — fixture generator drifted"


def test_destructive_union_nway_point_set_law_fuzz():
    """n-way union fuzz: destructive_union of k random cap polygons must
    equal the point-set OR of the operands' memberships — sampled on each
    operand's boundary band plus a global sample.  Overlap is forced in
    half the trials (operands drawn near a shared center), so the
    smallest-first merge queue exercises real loop merging, not just
    multi-loop concatenation of disjoint shells."""
    rng = np.random.default_rng(424242)
    for trial in range(6):
        k = int(rng.integers(3, 6))
        if trial % 2 == 0:       # clustered: operands overlap heavily
            base = rng.normal(size=3)
            base /= np.linalg.norm(base)
            ops = []
            for _ in range(k):
                c = base + rng.normal(scale=0.15, size=3)
                c /= np.linalg.norm(c)
                ops.append(_cap_polygon_at(rng, c, int(rng.integers(3, 10)),
                                           max_radius_deg=15.0))
        else:                    # scattered: mostly disjoint shells
            ops = [_random_cap_polygon(rng, int(rng.integers(3, 10)),
                                       max_radius_deg=12.0)
                   for _ in range(k)]

        pts = []
        for _, c, r in ops:
            d = rng.normal(size=(2500, 3))
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            t = r * rng.uniform(0.0, 2.5, 2500)
            p = (np.cos(t)[:, None] * c[None, :]
                 + np.sin(t)[:, None] * np.cross(c, d))
            p /= np.linalg.norm(p, axis=1, keepdims=True)
            pts.append(p)
        g = rng.normal(size=(1500, 3))
        pts.append(g / np.linalg.norm(g, axis=1, keepdims=True))
        P = np.concatenate(pts)
        x, y, z = P[:, 0], P[:, 1], P[:, 2]

        expect = np.zeros(len(P), dtype=bool)
        for poly, _, _ in ops:
            expect |= poly.contains_points(x, y, z)

        U = booleans.destructive_union([poly for poly, _, _ in ops])
        assert np.array_equal(U.contains_points(x, y, z), expect), \
            f"trial {trial} (k={k})"

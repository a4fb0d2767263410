"""Cell-union normalize/denormalize/intersection/expand conformance
(S2CellUnion.cs semantics; the reference's own cell-union test file is a
mis-copied duplicate of S2Test, so behavior is pinned via invariants)."""

import numpy as np
import pytest

from s2spark.kernel import cellid as ci
from s2spark.kernel import cellunion as cu
from tests.conftest import random_points

U = np.uint64


def test_normalize_collapses_siblings(rng):
    x, y, z = random_points(rng, 50)
    parents = ci.parent_for_level(ci.from_point(x, y, z), 10)
    kids = ci.children(parents).ravel()
    got = cu.normalize(kids)
    expect = np.sort(np.unique(parents))
    assert np.array_equal(got, expect)


def test_normalize_drops_contained(rng):
    x, y, z = random_points(rng, 100)
    leaf = ci.from_point(x, y, z)
    p8 = ci.parent_for_level(leaf, 8)
    mixed = np.concatenate([leaf, p8])
    got = cu.normalize(mixed)
    assert np.array_equal(got, np.sort(np.unique(p8)))


def test_normalize_recursive_collapse():
    # all 16 grandchildren of a cell collapse to the cell itself
    base = ci.parent_for_level(
        ci.from_latlng_deg(np.array([10.0]), np.array([20.0])), 5)
    kids = ci.children(np.atleast_1d(base))
    grand = ci.children(kids.ravel()).ravel()
    got = cu.normalize(grand)
    assert len(got) == 1 and got[0] == base[0]


def test_denormalize_levels():
    base = ci.parent_for_level(
        ci.from_latlng_deg(np.array([10.0]), np.array([20.0])), 5)
    out = cu.denormalize(np.atleast_1d(base), 7, 1)
    assert len(out) == 16
    assert np.all(ci.level_of(out) == 7)
    # level_mod=2 starting at min_level 6: level 5 cell -> level 6... rounded up
    out2 = cu.denormalize(np.atleast_1d(base), 6, 2)
    assert np.all((ci.level_of(out2) - 6) % 2 == 0)


def test_contains_id(rng):
    x, y, z = random_points(rng, 50)
    cells = cu.normalize(ci.parent_for_level(ci.from_point(x, y, z), 9))
    x2, y2, z2 = random_points(rng, 5000)
    queries = ci.from_point(x2, y2, z2)
    got = cu.contains_id(cells, queries)
    # brute force
    expect = np.zeros(len(queries), dtype=bool)
    for c in cells:
        arr = np.broadcast_to(np.array([c], dtype=U), queries.shape)
        expect |= ci.contains(arr, queries)
    assert np.array_equal(got, expect)


def test_union_and_intersection(rng):
    x, y, z = random_points(rng, 40)
    a = cu.normalize(ci.parent_for_level(ci.from_point(x, y, z), 8))
    x2, y2, z2 = random_points(rng, 40)
    b = cu.normalize(ci.parent_for_level(ci.from_point(x2, y2, z2), 10))
    un = cu.union(a, b)
    inter = cu.intersection(a, b)
    # membership law on random probes
    xp, yp, zp = random_points(rng, 3000)
    q = ci.from_point(xp, yp, zp)
    in_a = cu.contains_id(a, q)
    in_b = cu.contains_id(b, q)
    assert np.array_equal(cu.contains_id(un, q), in_a | in_b)
    assert np.array_equal(cu.contains_id(inter, q), in_a & in_b)


def test_expand_level_contains_original(rng):
    x, y, z = random_points(rng, 10)
    a = cu.normalize(ci.parent_for_level(ci.from_point(x, y, z), 12))
    ex = cu.expand_level(a, 12)
    q_leaf = ci.from_point(x, y, z)
    assert np.all(cu.contains_id(ex, q_leaf))
    # expansion strictly grows leaf coverage
    assert cu.leaf_cells_covered(ex) > cu.leaf_cells_covered(a)


def test_leaf_cells_covered():
    face = ci.from_face_pos_level(np.array([0]), np.array([0], dtype=U), 0)
    assert cu.leaf_cells_covered(np.atleast_1d(face)) == 4 ** 30


def test_expand_radius_contains_buffer(rng):
    """Expand(radius, maxLevelDiff): every point within radius of the union
    is contained afterwards (S2CellUnion.cs:618-650 guarantee)."""
    import math
    from s2spark.kernel import sphere
    x, y, z = random_points(rng, 5)
    a = cu.normalize(ci.parent_for_level(ci.from_point(x, y, z), 10))
    radius = 0.01
    ex = cu.expand_radius(a, radius, max_level_diff=6)
    # probes: cell centers of a, displaced by < radius in random directions
    cx, cy, cz = ci.to_point(a)
    for frac in (0.0, 0.5, 0.99):
        ox, oy, oz = sphere.ortho(cx, cy, cz)
        t = frac * radius
        px = cx * math.cos(t) + ox * np.sin(t)
        py = cy * math.cos(t) + oy * np.sin(t)
        pz = cz * math.cos(t) + oz * np.sin(t)
        q = ci.from_point(px, py, pz)
        assert np.all(cu.contains_id(ex, q)), frac
    # max_level_diff bound: no output cell more than 6 levels finer than the
    # largest input cell
    min_in = int(ci.level_of(a).min())
    assert int(ci.level_of(ex).max()) <= max(min_in + 6,
                                             int(ci.level_of(a).max()))


def test_expand_radius_wider_than_face():
    """Radius wider than a face cell triggers the double level-0 expand."""
    leaf = ci.from_latlng_deg(np.array([10.0]), np.array([20.0]))
    ex = cu.expand_radius(np.atleast_1d(leaf), 2.0, max_level_diff=2)
    # 2 radians covers most of the sphere: every face present
    faces = np.unique(np.asarray(ex, dtype=np.uint64) >> np.uint64(61))
    assert len(faces) == 6


def test_union_areas():
    """ApproxArea/ExactArea (S2CellUnion.cs:75-113): children sum to their
    parent's exact area; a full face is 4pi/6."""
    import math
    from s2spark.kernel.cell import Cell
    face = np.atleast_1d(ci.from_face_pos_level(np.array([1]),
                                                np.array([0], dtype=U), 0))
    assert cu.exact_area(face) == pytest.approx(4 * math.pi / 6, rel=1e-12)
    kids = ci.children(face).ravel()
    assert cu.exact_area(kids) == pytest.approx(cu.exact_area(face), rel=1e-12)
    # approx area is within the reference's stated bounds of exact
    assert cu.approx_area(kids) == pytest.approx(cu.exact_area(kids), rel=0.06)
    # average-based area of a face equals the face share of the sphere
    assert cu.average_based_area(face) == pytest.approx(4 * math.pi / 6, rel=1e-9)


def test_expand_radius_completeness_fuzz(rng):
    """Expand(radius) contract: the result must contain EVERY point within
    min_radius of the input union (S2CellUnion.cs:618-650) — the property
    buffered_polygon_join / corridor_join candidate generation rides on.
    Ground truth is computed independently: inside-union by exact integer
    parent equality, else min point-edge distance to the cells' boundary
    arcs.  Radii span the bucket regimes incl. > level-0 min width (the
    double-expand special case)."""
    from s2spark.kernel import sphere
    from s2spark.kernel.cell import cells_vertices

    for radius in (1e-4, 3e-3, 0.05, 0.4, 1.2):
        for _ in range(3):
            n_cells = int(rng.integers(2, 8))
            px, py, pz = random_points(rng, n_cells)
            levels = rng.integers(3, 12, n_cells)
            cells = np.array([
                int(ci.parent_for_level(
                    ci.from_point(px[i:i+1], py[i:i+1], pz[i:i+1]),
                    int(levels[i]))[0])
                for i in range(n_cells)], dtype=U)
            union = cu.normalize(cells)
            expanded = cu.expand_radius(union, radius, max_level_diff=4)
            # sample around each cell center out to ~1.1x the interesting band
            verts = cells_vertices(union)                       # (k, 4, 3)
            centers = verts.sum(axis=1)
            centers /= np.linalg.norm(centers, axis=1, keepdims=True)
            samples = []
            for c in centers:
                d = rng.normal(size=(300, 3))
                d -= (d @ c)[:, None] * c[None, :]
                d /= np.linalg.norm(d, axis=1, keepdims=True)
                t = rng.uniform(0.0, min(np.pi - 1e-3, radius * 1.1 + 0.5), 300)
                p = np.cos(t)[:, None] * c[None, :] + np.sin(t)[:, None] * d
                samples.append(p / np.linalg.norm(p, axis=1, keepdims=True))
            P = np.concatenate(samples)
            leaves = ci.from_point(P[:, 0], P[:, 1], P[:, 2])
            # independent distance to the union
            dist = np.full(len(P), np.inf)
            for idx, cell in enumerate(np.asarray(union, dtype=U)):
                lv = int(ci.level_of(np.array([cell], dtype=U))[0])
                inside = ci.parent_for_level(leaves, lv) == cell
                dist[inside] = 0.0
                v4 = cells_vertices(np.array([cell], dtype=U))[0]
                for e in range(4):
                    a, b = v4[e], v4[(e + 1) % 4]
                    d_e = sphere.point_edge_distance(
                        P[:, 0], P[:, 1], P[:, 2],
                        a[0], a[1], a[2], b[0], b[1], b[2])
                    dist = np.minimum(dist, d_e)
            should_cover = dist <= radius * (1 - 1e-9)
            covered = cu.contains_id(np.sort(np.asarray(expanded, dtype=U)),
                                     leaves)
            missing = should_cover & ~covered
            assert not missing.any(), (
                f"radius={radius}: {missing.sum()} in-radius points "
                f"outside Expand() result")

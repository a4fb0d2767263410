"""Cell-union normalize/denormalize/intersection/expand conformance
(S2CellUnion.cs semantics; the reference's own cell-union test file is a
mis-copied duplicate of S2Test, so behavior is pinned via invariants)."""

import numpy as np

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

"""Region coverer conformance: checkCovering oracle (GeometryTestCase.cs:121-154,
S2RegionCovererTest.cs:13-122) over random caps, loops, and cell regions."""

import math

import numpy as np

from s2spark.kernel import cellid as ci, metrics
from s2spark.kernel.cap import Cap
from s2spark.kernel.cell import Cell
from s2spark.kernel.cellunion import contains_id
from s2spark.kernel.coverer import RegionCoverer
from s2spark.kernel.loops import Loop
from tests.conftest import parse_vertices

U = np.uint64


def check_exterior_covering(region, covering, tight=True):
    """Recursive cover check, tight mode (GeometryTestCase.cs:121-154)."""
    srt = np.sort(np.asarray(covering, dtype=U))
    # covering cells must be disjoint
    if len(srt) > 1:
        assert np.all(ci.range_max(srt)[:-1] < ci.range_min(srt)[1:])

    def recurse(cover_id):
        cell = Cell(cover_id)
        arr = np.array([cover_id], dtype=U)
        if not region.may_intersect_cell(cell):
            if tight:
                lo, hi = ci.range_min(arr)[0], ci.range_max(arr)[0]
                overlap = (ci.range_min(srt) <= hi) & (ci.range_max(srt) >= lo)
                assert not np.any(overlap), "covering intersects a non-intersecting cell"
            return
        if bool(contains_id(srt, arr)[0]):
            return
        assert not region.contains_cell(cell), "region-contained cell missing from covering"
        assert int(ci.level_of(arr)[0]) < 30, "leaf cell not covered"
        for ch in ci.children(arr)[0]:
            recurse(int(ch))

    for f in range(6):
        recurse(int(ci.from_face_pos_level(np.array([f]), np.array([0], dtype=U), 0)[0]))


def random_cap(rng, min_area, max_area):
    cap_area = max_area * (min_area / max_area) ** rng.uniform()
    z = rng.uniform(-1, 1)
    theta = rng.uniform(-math.pi, math.pi)
    r = math.sqrt(1 - z * z)
    return Cap.from_axis_height((r * math.cos(theta), r * math.sin(theta), z),
                                cap_area / (2 * math.pi))


def test_random_caps_oracle(rng):
    cov = RegionCoverer(max_cells=8)
    for _ in range(40):
        max_area = min(4 * math.pi,
                       1000 * metrics.AVG_AREA.get_value(30) * (4.0 ** int(rng.integers(0, 12))))
        cap = random_cap(rng, 0.1 * metrics.AVG_AREA.get_value(30), max_area)
        covering = cov.get_covering(cap)
        assert 1 <= len(covering) <= 12
        check_exterior_covering(cap, covering)
        interior = cov.get_interior_covering(cap)
        for cid in interior:
            assert cap.contains_cell(Cell(int(cid)))
        # determinism (S2RegionCovererTest.cs:88-91)
        again = RegionCoverer(max_cells=8).get_covering(cap)
        assert np.array_equal(covering, again)


def test_min_max_level_constraints(rng):
    for _ in range(10):
        min_level = int(rng.integers(0, 20))
        max_level = min_level + int(rng.integers(0, 8))
        # cap no larger than a min_level cell (mirrors S2RegionCovererTest.cs:66-70)
        cap = random_cap(rng, 0.1 * metrics.AVG_AREA.get_value(30),
                         metrics.AVG_AREA.get_value(min_level))
        cov = RegionCoverer(min_level=min_level, max_level=max_level,
                            max_cells=int(rng.integers(1, 10)))
        covering = cov.get_covering(cap)
        levels = ci.level_of(covering)
        assert np.all(levels >= min_level)
        assert np.all(levels <= max_level)
        check_exterior_covering(cap, covering, tight=False)


def test_level_mod(rng):
    for level_mod in (2, 3):
        cap = random_cap(rng, 0.1 * metrics.AVG_AREA.get_value(30), 0.001)
        cov = RegionCoverer(level_mod=level_mod, max_cells=8)
        covering = cov.get_covering(cap)
        levels = ci.level_of(covering)
        assert np.all(levels % level_mod == 0)


class CellRegion:
    """A single cell as an IS2Region (S2RegionCovererTest.cs:106-122)."""

    def __init__(self, cell: Cell):
        self.cell = cell
        self.arr = np.array([cell.id], dtype=U)

    def cap_bound(self):
        c = Cap.empty()
        for k in range(4):
            c = c.add_point(*self.cell.get_vertex(k))
        return c

    def rect_bound(self):
        return self.cell.rect_bound()

    def contains_cell(self, other):
        return bool(ci.contains(self.arr, np.array([other.id], dtype=U))[0])

    def may_intersect_cell(self, other):
        return bool(ci.intersects(self.arr, np.array([other.id], dtype=U))[0])


def test_single_cell_identity(rng):
    for _ in range(300):
        z = rng.uniform(-1, 1)
        theta = rng.uniform(-math.pi, math.pi)
        r = math.sqrt(1 - z * z)
        leaf = int(np.atleast_1d(ci.from_point(
            np.array([r * math.cos(theta)]), np.array([r * math.sin(theta)]),
            np.array([z])))[0])
        level = int(rng.integers(0, 31))
        cid = int(ci.parent_for_level(np.array([leaf], dtype=U), level)[0])
        got = RegionCoverer(max_cells=1).get_covering(CellRegion(Cell(cid)))
        assert len(got) == 1 and int(got[0]) == cid


def test_loop_covering_oracle():
    lp = Loop(parse_vertices("-1:-1, -1:1, 1:1, 1:-1"))
    cov = RegionCoverer(max_cells=8)
    covering = cov.get_covering(lp)
    assert 1 <= len(covering) <= 12
    check_exterior_covering(lp, covering)
    interior = cov.get_interior_covering(lp)
    for cid in interior:
        assert lp.contains_cell(Cell(int(cid)))


def _convex_inside(loop, pts):
    """Independent convex-polygon membership: all edge-normal dots positive
    (valid for CCW convex loops — the fuzz fixtures)."""
    v = loop.vertices
    n = len(v)
    out = np.ones(len(pts), dtype=bool)
    for i in range(n):
        nrm = np.cross(v[i], v[(i + 1) % n])
        out &= pts @ nrm > 0
    return out


def test_random_polygon_covering_completeness():
    """Independent completeness fuzz: check_exterior_covering grades the
    covering against the region's OWN may_intersect predicate, so a shared
    bug could hide.  Here random convex cap polygons are sampled with an
    independent determinant-sign membership oracle, and every inside
    point's leaf cell must fall in some covering cell — the property the
    spatial join's candidate generation rides on.  Interior-covering cells
    are cross-checked the other way (center + vertices inside)."""
    from s2spark.kernel.cell import cells_vertices
    from s2spark.kernel.loops import Polygon
    from tests.test_booleans import _random_cap_polygon

    rng = np.random.default_rng(8675309)
    for _ in range(10):
        poly, c, r = _random_cap_polygon(rng, int(rng.integers(3, 12)))
        loop = poly.loops[0]
        covering = np.asarray(
            RegionCoverer(max_cells=8).get_covering(poly), dtype=U)
        # (check_exterior_covering's per-cell recursion over polygon
        # predicates is minutes per trial — the fixed-loop test keeps it;
        # this fuzz contributes the independent point-sampling oracle)
        # sample within 1.2r of the center: dense around the boundary
        d = rng.normal(size=(4000, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        t = r * rng.uniform(0.0, 1.2, 4000)
        p = (np.cos(t)[:, None] * c[None, :]
             + np.sin(t)[:, None] * np.cross(c, d))
        p /= np.linalg.norm(p, axis=1, keepdims=True)
        inside = _convex_inside(loop, p)
        assert inside.sum() > 100, "fixture must sample the interior"
        leaves = ci.from_point(p[inside, 0], p[inside, 1], p[inside, 2])
        covered = contains_id(np.sort(covering), leaves)
        assert covered.all(), (
            f"{(~covered).sum()} inside points outside the covering")
        # interior covering: every cell fully inside by the oracle
        interior = np.asarray(
            RegionCoverer(max_cells=8).get_interior_covering(poly), dtype=U)
        if len(interior):
            vs = cells_vertices(interior)           # (k, 4, 3)
            centers = vs.sum(axis=1)
            centers /= np.linalg.norm(centers, axis=1, keepdims=True)
            for pts in (vs[:, 0], vs[:, 1], vs[:, 2], vs[:, 3], centers):
                assert _convex_inside(loop, pts).all(), \
                    "interior-covering cell leaks outside the polygon"


def test_polygon_with_hole_covering_completeness():
    """Same independent completeness check for a polygon with a hole:
    inside-shell-outside-hole points must be covered; interior-covering
    cells must avoid the hole."""
    from s2spark.kernel.cell import cells_vertices
    from s2spark.kernel.loops import Loop as L, Polygon
    from tests.test_booleans import _cap_polygon_at

    rng = np.random.default_rng(13579)
    c = rng.normal(size=3)
    c /= np.linalg.norm(c)
    shell_poly, _, r_shell = _cap_polygon_at(rng, c, 8, max_radius_deg=20.0)
    shell = shell_poly.loops[0]
    hole_poly, _, r_hole = _cap_polygon_at(rng, c, 6, max_radius_deg=6.0)
    hole = L(hole_poly.loops[0].vertices, depth=1)
    poly = Polygon([L(shell.vertices, depth=0), hole])
    covering = np.asarray(
        RegionCoverer(max_cells=12).get_covering(poly), dtype=U)
    d = rng.normal(size=(6000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t = r_shell * rng.uniform(0.0, 1.2, 6000)
    p = (np.cos(t)[:, None] * c[None, :]
         + np.sin(t)[:, None] * np.cross(c, d))
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    inside = _convex_inside(shell, p) & ~_convex_inside(hole, p)
    assert inside.sum() > 100
    leaves = ci.from_point(p[inside, 0], p[inside, 1], p[inside, 2])
    covered = contains_id(np.sort(covering), leaves)
    assert covered.all(), f"{(~covered).sum()} ring points outside covering"
    interior = np.asarray(
        RegionCoverer(max_cells=12).get_interior_covering(poly), dtype=U)
    if len(interior):
        vs = cells_vertices(interior)
        centers = vs.sum(axis=1)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        for pts in (vs[:, 0], vs[:, 1], vs[:, 2], vs[:, 3], centers):
            ok = _convex_inside(shell, pts) & ~_convex_inside(hole, pts)
            assert ok.all(), "interior-covering cell touches hole/exterior"

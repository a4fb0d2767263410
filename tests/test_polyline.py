"""Polyline kernel + simple-covering conformance."""

import math

import numpy as np
import pytest

from s2spark.kernel import cellid as ci
from s2spark.kernel.cell import Cell
from s2spark.kernel.coverer import RegionCoverer, get_simple_covering
from s2spark.kernel.polyline import Polyline
from tests.conftest import parse_vertices


def test_arc_length_equator_quarter():
    # 0:0 -> 0:45 -> 0:90 along the equator = pi/2 (S2Polyline.cs:56-67)
    pl = Polyline(parse_vertices("0:0, 0:45, 0:90"))
    assert pl.arc_length() == pytest.approx(math.pi / 2, abs=1e-12)


def test_interpolate_midpoint():
    pl = Polyline(parse_vertices("0:0, 0:90"))
    x, y, z = pl.interpolate(0.5)
    lat = math.degrees(math.atan2(z, math.hypot(x, y)))
    lng = math.degrees(math.atan2(y, x))
    assert lat == pytest.approx(0, abs=1e-9)
    assert lng == pytest.approx(45, abs=1e-9)
    assert pl.interpolate(0.0) == pytest.approx(tuple(pl.vertices[0]))
    assert pl.interpolate(1.0) == pytest.approx(tuple(pl.vertices[-1]))


def test_polyline_validity():
    assert Polyline(parse_vertices("0:0, 0:45, 10:60")).is_valid()
    bad = Polyline(np.array([[1.0, 0, 0], [2.0, 0, 0]]))  # not unit length
    assert not bad.is_valid()


def test_polyline_covering_oracle():
    # coverer accepts a polyline region: covering must touch every vertex
    pl = Polyline(parse_vertices("5:5, 6:7, 8:8, 10:5"))
    covering = RegionCoverer(max_cells=8).get_covering(pl)
    from s2spark.kernel.cellunion import contains_id
    leafs = ci.from_point(pl.vertices[:, 0], pl.vertices[:, 1], pl.vertices[:, 2])
    assert bool(np.all(contains_id(covering, leafs)))
    # polylines contain no cells: interior covering must be empty
    assert len(RegionCoverer(max_cells=8, max_level=12).get_interior_covering(pl)) == 0


def test_simple_covering_flood_fill():
    # fixed-level flood fill covers a small cap seeded at its center
    from s2spark.kernel.cap import Cap
    cap = Cap.from_axis_angle((1.0, 0.0, 0.0), 0.05)
    cells = get_simple_covering(cap, (1.0, 0.0, 0.0), 8)
    assert len(cells) >= 4
    assert np.all(ci.level_of(cells) == 8)
    # every covering cell must actually intersect the cap
    for cid in cells:
        assert cap.may_intersect_cell(Cell(int(cid)))
    # coverage: random points in the cap land in covered cells
    from s2spark.kernel.cellunion import contains_id
    rng = np.random.default_rng(5)
    d = rng.normal(size=(4000, 3))
    d -= (d @ np.array([1.0, 0, 0]))[:, None] * np.array([1.0, 0, 0])
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t = rng.uniform(0, 0.05, 4000)
    pts = np.cos(t)[:, None] * np.array([1.0, 0, 0]) + np.sin(t)[:, None] * d
    leafs = ci.from_point(pts[:, 0], pts[:, 1], pts[:, 2])
    assert bool(np.all(contains_id(cells, leafs)))

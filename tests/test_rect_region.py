"""Rect-region coverer conformance: coverings of lat/lng rectangles
satisfy the checkCovering oracle (the reference sweeps random caps; rects
exercise the curved-lat-edge intersection, S2LatLngRect.cs:796-857)."""

import math

import numpy as np

from s2spark.kernel import cellid as ci
from s2spark.kernel.cell import Cell
from s2spark.kernel.coverer import RegionCoverer
from s2spark.kernel.rect_region import RectRegion
from tests.test_coverer import check_exterior_covering


def test_rect_covering_oracle(rng):
    for _ in range(12):
        lat_lo = float(rng.uniform(-80, 70))
        lat_hi = lat_lo + float(rng.uniform(0.5, 15))
        lng_lo = float(rng.uniform(-180, 170))
        lng_hi = lng_lo + float(rng.uniform(0.5, 20))
        r = RectRegion.from_degrees(lat_lo, lng_lo, lat_hi, lng_hi)
        covering = RegionCoverer(max_cells=8).get_covering(r)
        assert 1 <= len(covering) <= 12
        check_exterior_covering(r, covering)
        # interior coverings need a max_level bound for rects: boundary
        # straddlers are never contained, so an unbounded interior coverer
        # descends toward leaf level before filling max_cells
        interior = RegionCoverer(max_cells=8, max_level=12).get_interior_covering(r)
        for cid in interior:
            assert r.contains_cell(Cell(int(cid)))


def test_rect_point_consistency(rng):
    # covering ∪ contains every point the rect contains
    from s2spark.kernel.cellunion import contains_id
    r = RectRegion.from_degrees(10, 20, 25, 55)
    covering = RegionCoverer(max_cells=32).get_covering(r)
    lats = rng.uniform(0, 35, 20000)
    lngs = rng.uniform(10, 65, 20000)
    x, y, z = ci.xyz_from_latlng_deg(lats, lngs)
    leaf = ci.from_point(x, y, z)
    in_rect = ((np.radians(lats) >= r.rect.lat.lo) & (np.radians(lats) <= r.rect.lat.hi)
               & (np.radians(lngs) >= r.rect.lng.lo) & (np.radians(lngs) <= r.rect.lng.hi))
    covered = contains_id(covering, leaf)
    assert not np.any(in_rect & ~covered)


def test_antimeridian_rect():
    r = RectRegion.from_degrees(-10, 170, 10, -170)  # wraps 180
    assert r.rect.lng.is_inverted
    covering = RegionCoverer(max_cells=8).get_covering(r)
    check_exterior_covering(r, covering)
    x, y, z = ci.xyz_from_latlng_deg(np.array([0.0]), np.array([179.5]))
    from s2spark.kernel.cellunion import contains_id
    leaf = ci.from_point(x, y, z)
    assert bool(contains_id(covering, leaf)[0])

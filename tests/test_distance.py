"""Distance-family conformance: edge distance / closest point
(S2EdgeUtilTest.cs:215-275), polyline project (S2PolylineTest.cs:148-189),
and LatLngRect.GetDistance vs the reference's brute force
(S2LatLngRectTest.cs:60-158, 439-545)."""

import math

import numpy as np
import pytest

from s2spark.kernel import sphere
from s2spark.kernel.intervals import LatLngRect, R1Interval, S1Interval
from s2spark.kernel.polyline import Polyline

PI = math.pi


def _n(p):
    a = np.asarray(p, dtype=np.float64)
    return a / np.linalg.norm(a)


def _ll(lat_deg, lng_deg):
    lat, lng = math.radians(lat_deg), math.radians(lng_deg)
    return np.array([math.cos(lat) * math.cos(lng),
                     math.cos(lat) * math.sin(lng),
                     math.sin(lat)])


def _edge_dist(x, a, b) -> float:
    return float(sphere.point_edge_distance(
        np.float64(x[0]), np.float64(x[1]), np.float64(x[2]),
        np.float64(a[0]), np.float64(a[1]), np.float64(a[2]),
        np.float64(b[0]), np.float64(b[1]), np.float64(b[2])))


def _closest(x, a, b):
    q = sphere.closest_point_on_edge(
        np.float64(x[0]), np.float64(x[1]), np.float64(x[2]),
        np.float64(a[0]), np.float64(a[1]), np.float64(a[2]),
        np.float64(b[0]), np.float64(b[1]), np.float64(b[2]))
    return np.array([float(q[0]), float(q[1]), float(q[2])])


# S2EdgeUtilTest.cs:242-275 — (x, a, b, distance, expected closest or None
# meaning "must be a or b")
CHECK_DISTANCE_CASES = [
    ((1, 0, 0), (1, 0, 0), (0, 1, 0), 0, (1, 0, 0)),
    ((0, 1, 0), (1, 0, 0), (0, 1, 0), 0, (0, 1, 0)),
    ((1, 3, 0), (1, 0, 0), (0, 1, 0), 0, (1, 3, 0)),
    ((0, 0, 1), (1, 0, 0), (0, 1, 0), PI / 2, (1, 0, 0)),
    ((0, 0, -1), (1, 0, 0), (0, 1, 0), PI / 2, (1, 0, 0)),
    ((-1, -1, 0), (1, 0, 0), (0, 1, 0), 0.75 * PI, None),
    ((0, 1, 0), (1, 0, 0), (1, 1, 0), PI / 4, (1, 1, 0)),
    ((0, -1, 0), (1, 0, 0), (1, 1, 0), PI / 2, (1, 0, 0)),
    ((0, -1, 0), (1, 0, 0), (-1, 1, 0), PI / 2, (1, 0, 0)),
    ((-1, -1, 0), (1, 0, 0), (-1, 1, 0), PI / 2, (-1, 1, 0)),
    ((1, 1, 1), (1, 0, 0), (0, 1, 0), math.asin(math.sqrt(1.0 / 3)), (1, 1, 0)),
    ((1, 1, -1), (1, 0, 0), (0, 1, 0), math.asin(math.sqrt(1.0 / 3)), (1, 1, 0)),
    ((-1, 0, 0), (1, 1, 0), (1, 1, 0), 0.75 * PI, (1, 1, 0)),
    ((0, 0, -1), (1, 1, 0), (1, 1, 0), PI / 2, (1, 1, 0)),
    ((-1, 0, 0), (1, 0, 0), (1, 0, 0), PI, (1, 0, 0)),
]


@pytest.mark.parametrize("x,a,b,dist,closest", CHECK_DISTANCE_CASES)
def test_edge_distance_and_closest_point(x, a, b, dist, closest):
    x, a, b = _n(x), _n(a), _n(b)
    assert _edge_dist(x, a, b) == pytest.approx(dist, abs=1e-10)
    got = _closest(x, a, b)
    if closest is None:
        assert np.allclose(got, a) or np.allclose(got, b)
    else:
        assert np.allclose(got, _n(closest), atol=1e-10)


def test_get_closest_point_latlng():
    # S2EdgeUtilTest.cs:215-239
    a = _ll(-0.5, 0)
    b = _ll(0.5, 0)
    assert np.array_equal(_closest(a, a, b), a)
    assert np.array_equal(_closest(b, a, b), b)
    mid = _ll(0, 0)
    assert np.allclose(_closest(mid, a, b), mid, atol=1e-15)
    assert np.array_equal(_closest(_ll(-1, 0), a, b), a)
    assert np.array_equal(_closest(_ll(1, 0), a, b), b)
    assert np.allclose(_closest(_ll(0.1, 1), a, b), _ll(0.1, 0), atol=1e-6)


def test_polyline_project():
    # S2PolylineTest.cs:148-189
    line = Polyline(np.array([_ll(0, 0), _ll(0, 1), _ll(0, 2), _ll(1, 2)]))
    cases = [
        ((0.5, -0.5), 0, (0, 0)),
        ((0.5, 0.5), 0, (0, 0.5)),
        ((0.5, 1), 0, (0, 1)),
        ((-0.5, 2.5), 1, (0, 2)),
        ((2, 2), 2, (1, 2)),
    ]
    for (plat, plng), want_idx, (clat, clng) in cases:
        p = _ll(plat, plng)
        idx = line.get_nearest_edge_index(*p)
        assert idx == want_idx
        q = line.project_to_edge(*p, idx)
        assert np.allclose(q, _ll(clat, clng), atol=1e-14)
    # batch path agrees with scalar path
    pts = np.array([_ll(la, ln) for (la, ln), _, _ in cases])
    idxs, qx, qy, qz, d = line.project_points(pts[:, 0], pts[:, 1], pts[:, 2])
    assert idxs.tolist() == [c[1] for c in cases]
    for i, ((plat, plng), _, _) in enumerate(cases):
        sq = line.project(*_ll(plat, plng))[0]
        assert np.allclose([qx[i], qy[i], qz[i]], sq, atol=1e-15)
        assert d[i] == pytest.approx(_edge_dist(
            pts[i], line.vertices[idxs[i]], line.vertices[idxs[i] + 1]), abs=1e-15)


# ---------------------------------------------------------------------------
# LatLngRect distance vs reference brute force (S2LatLngRectTest.cs:60-158)


def _rect_deg(lat_lo, lng_lo, lat_hi, lng_hi) -> LatLngRect:
    return LatLngRect(
        R1Interval(math.radians(lat_lo), math.radians(lat_hi)),
        S1Interval(math.radians(math.remainder(lng_lo, 360.0)),
                   math.radians(math.remainder(lng_hi, 360.0))))


def _point_rect_deg(lat, lng) -> LatLngRect:
    return _rect_deg(lat, lng, lat, lng)


def _haversine(lat1, lng1, lat2, lng2) -> float:
    return float(sphere.haversine_radians(
        np.float64(lat1), np.float64(lng1), np.float64(lat2), np.float64(lng2)))


def _dist_to_lat_edge(lat, lng, edge_lat, interval: S1Interval) -> float:
    """S2LatLngRectTest.cs getDistance: point to latitude line segment."""
    if interval.contains(lng):
        return abs(lat - edge_lat)
    return min(_haversine(lat, lng, edge_lat, interval.lo),
               _haversine(lat, lng, edge_lat, interval.hi))


def _xyz(lat, lng):
    return np.array([math.cos(lat) * math.cos(lng),
                     math.cos(lat) * math.sin(lng), math.sin(lat)])


def _brute_rect_point(a: LatLngRect, lat: float, lng: float) -> float:
    """bruteForceRectPointDistance (S2LatLngRectTest.cs:114-130)."""
    if a.contains_latlng(lat, lng):
        return 0.0
    p = _xyz(lat, lng)
    return min(
        _dist_to_lat_edge(lat, lng, a.lat.lo, a.lng),
        _dist_to_lat_edge(lat, lng, a.lat.hi, a.lng),
        _edge_dist(p, _xyz(a.lat.lo, a.lng.lo), _xyz(a.lat.hi, a.lng.lo)),
        _edge_dist(p, _xyz(a.lat.lo, a.lng.hi), _xyz(a.lat.hi, a.lng.hi)))


def _brute_rect_rect(a: LatLngRect, b: LatLngRect) -> float:
    """bruteForceDistance (S2LatLngRectTest.cs:60-112)."""
    if a.intersects_rect(b):
        return 0.0
    pnt_a = [(a.lat.lo, a.lng.lo), (a.lat.lo, a.lng.hi),
             (a.lat.hi, a.lng.hi), (a.lat.hi, a.lng.lo)]
    pnt_b = [(b.lat.lo, b.lng.lo), (b.lat.lo, b.lng.hi),
             (b.lat.hi, b.lng.hi), (b.lat.hi, b.lng.lo)]
    lat_a = [a.lat.lo, a.lat.hi]
    lat_b = [b.lat.lo, b.lat.hi]
    lng_edge_a = [(_xyz(*pnt_a[0]), _xyz(*pnt_a[3])),
                  (_xyz(*pnt_a[1]), _xyz(*pnt_a[2]))]
    lng_edge_b = [(_xyz(*pnt_b[0]), _xyz(*pnt_b[3])),
                  (_xyz(*pnt_b[1]), _xyz(*pnt_b[2]))]
    best = math.pi
    for i in range(4):
        ca, cb = pnt_a[i], pnt_b[i]
        for j in range(2):
            best = min(
                best,
                _dist_to_lat_edge(ca[0], ca[1], lat_b[j], b.lng),
                _dist_to_lat_edge(cb[0], cb[1], lat_a[j], a.lng),
                _edge_dist(_xyz(*ca), lng_edge_b[j][0], lng_edge_b[j][1]),
                _edge_dist(_xyz(*cb), lng_edge_a[j][0], lng_edge_a[j][1]))
    return best


def test_rect_distance_overlapping():
    # S2LatLngRectTest.cs:439-456 — all zeros
    a = _rect_deg(0, 0, 2, 2)
    b = _point_rect_deg(0, 0)
    assert a.get_distance_rect(a) == 0.0
    assert a.get_distance_rect(b) == 0.0
    assert b.get_distance_rect(b) == 0.0
    assert a.get_distance_latlng(0.0, 0.0) == 0.0
    for other in [(0, 1, 2, 3), (0, 2, 2, 4), (1, 0, 3, 2), (2, 0, 4, 2),
                  (1, 1, 3, 3), (2, 2, 4, 4)]:
        assert a.get_distance_rect(_rect_deg(*other)) == 0.0


RECT_VS_POINT_FIXTURES = [
    # (rect deg, point deg) — S2LatLngRectTest.cs:478-525
    ((-1, -1, 2, 1), (-2, -1)), ((-1, -1, 2, 1), (1, 2)),
    ((86, 0, 88, 2), (87, 3)), ((86, 0, 88, 2), (87, -1)),
    ((86, 0, 88, 2), (89, 1)), ((86, 0, 88, 2), (89, 181)),
    ((86, 0, 88, 2), (85, 1)), ((86, 0, 88, 2), (85, 181)),
    ((86, 0, 88, 2), (90, 0)),
]


@pytest.mark.parametrize("rect,point", RECT_VS_POINT_FIXTURES)
def test_rect_distance_vs_point(rect, point):
    a = _rect_deg(*rect)
    lat = math.radians(point[0])
    lng = math.radians(math.remainder(point[1], 360.0))
    want = _brute_rect_point(a, lat, lng)
    assert a.get_distance_latlng(lat, lng) == pytest.approx(want, abs=1e-10)
    # point rect both directions
    p = _point_rect_deg(*point)
    assert a.get_distance_rect(p) == pytest.approx(want, abs=1e-10)
    assert p.get_distance_rect(a) == pytest.approx(want, abs=1e-10)


RECT_VS_RECT_FIXTURES = [
    # S2LatLngRectTest.cs:527-545
    ((-1, -1, 2, 1), (0, 2, 1, 3)), ((-1, -1, 2, 1), (-2, -3, -1, -2)),
    ((-87, 0, -85, 3), (-89, 1, -88, 2)), ((-87, 0, -85, 3), (-84, 1, -83, 2)),
    ((-87, 0, -85, 3), (-88, 90, -86, 91)),
    ((-87, 0, -85, 3), (-84, -91, -83, -90)),
    ((-87, 0, -85, 3), (-90, 181, -89, 182)),
    ((-87, 0, -85, 3), (-84, 181, -83, 182)),
    ((88, 0, 90, 2), (89, 3, 89, 3)), ((88, 0, 90, 2), (89, 90, 89, 90)),
    ((88, 0, 90, 2), (89, 181, 89, 181)),
]


@pytest.mark.parametrize("ra,rb", RECT_VS_RECT_FIXTURES)
def test_rect_distance_vs_rect(ra, rb):
    a, b = _rect_deg(*ra), _rect_deg(*rb)
    want = _brute_rect_rect(a, b)
    assert a.get_distance_rect(b) == pytest.approx(want, abs=1e-10)
    assert b.get_distance_rect(a) == pytest.approx(want, abs=1e-10)


def test_rect_distance_random_pairs():
    # S2LatLngRectTest.cs:459-475, 2000 trials
    rng = np.random.default_rng(23)
    for _ in range(2000):
        lats = np.arcsin(rng.uniform(-1, 1, 5))
        lngs = rng.uniform(-PI, PI, 5)
        a = LatLngRect.from_point_pair(lats[0], lngs[0], lats[1], lngs[1])
        b = LatLngRect.from_point_pair(lats[2], lngs[2], lats[3], lngs[3])
        assert a.get_distance_rect(b) == pytest.approx(
            _brute_rect_rect(a, b), abs=1e-10)
        assert a.get_distance_latlng(lats[4], lngs[4]) == pytest.approx(
            _brute_rect_point(a, lats[4], lngs[4]), abs=1e-10)

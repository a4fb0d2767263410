"""S2LatLng / S1Angle parity ported from S2Geometry.Tests/S2LatLngTest.cs and
S1AngleTest.cs.  The engine carries angles as plain radians/degrees doubles
and E5/E6/E7 as scaled-integer Column expressions; these tests pin the
kernel-level conversion and distance semantics to the reference goldens."""

import math

import numpy as np

from s2spark.kernel import cellid as ci
from s2spark.kernel import sphere


def test_s1_angle_basic():
    """S1AngleTest.cs: exact degree/radian conversion and E5/E6/E7."""
    assert math.degrees(math.pi) == 180.0
    assert math.radians(180.0) == math.pi
    assert math.degrees(math.pi / 2) == 90.0
    assert math.degrees(-math.pi / 2) == -90.0
    assert math.radians(-45.0) == -math.pi / 4

    # E5/E6/E7 scaled-integer representations
    assert 2000000 * 1e-5 == 20.0
    assert -60000000 * 1e-6 == -60.0
    assert 750000000 * 1e-7 == 75.0
    assert round(12.34567 * 1e5) == 1234567
    assert round(12.345678 * 1e6) == 12345678
    assert round(-12.3456789 * 1e7) == -123456789


def test_latlng_conversion_special_cases():
    """S2LatLngTest.cs:48-72: poles and the date line."""
    def to_point(lat_deg, lng_deg):
        return ci.xyz_from_latlng_deg(np.array([lat_deg], dtype=np.float64),
                                      np.array([lng_deg], dtype=np.float64))

    def to_latlng(x, y, z):
        lat, lng = ci.latlng_deg_from_xyz(x, y, z)
        return float(lat[0]), float(lng[0])

    lat, _ = to_latlng(*to_point(90.0, 65.0))
    assert abs(lat - 90.0) < 1e-9
    lat, _ = to_latlng(*to_point(-90.0, math.degrees(1)))
    assert math.radians(lat) == -math.pi / 2
    _, lng = to_latlng(*to_point(12.2, 180.0))
    assert abs(abs(lng) - 180.0) < 1e-9
    _, lng = to_latlng(*to_point(math.degrees(0.1), -180.0))
    assert abs(math.radians(lng)) == math.pi

    # random-point roundtrip (100k)
    rng = np.random.default_rng(7)
    z = rng.uniform(-1, 1, 100000)
    th = rng.uniform(-math.pi, math.pi, 100000)
    r = np.sqrt(1 - z * z)
    x, y = r * np.cos(th), r * np.sin(th)
    lat, lng = ci.latlng_deg_from_xyz(x, y, z)
    x2, y2, z2 = ci.xyz_from_latlng_deg(lat, lng)
    assert np.max(np.abs(x - x2) + np.abs(y - y2) + np.abs(z - z2)) < 1e-12

    # generation from E5
    assert abs(123456 * 1e-5 - 1.23456) < 1e-12
    assert abs(98765 * 1e-5 - 0.98765) < 1e-12


def test_latlng_distance():
    """S2LatLngTest.cs:75-88 distance goldens (engine haversine)."""
    def dist_deg(lat1, lng1, lat2, lng2):
        d = sphere.haversine_radians(
            np.array([math.radians(lat1)]), np.array([math.radians(lng1)]),
            np.array([math.radians(lat2)]), np.array([math.radians(lng2)]))
        return math.degrees(float(d[0]))

    assert dist_deg(90, 0, 90, 0) == 0.0
    assert abs(dist_deg(-37, 25, -66, -155) - 77) < 1e-9
    assert abs(dist_deg(0, 165, 0, -80) - 115) < 1e-9
    assert abs(dist_deg(47, -127, -47, 53) - 180) < 2e-6

"""Polyline operators over array columns — higher-order Column functions.

A track is an `array<struct<lat:double,lng:double>>` column; arc length is
a zip_with(track, track[1:]) fold of haversine edge angles — pure JVM, no
UDF (the reference computes the same sum per object, S2Polyline.cs:56-67).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _haversine(lat1: Column, lng1: Column, lat2: Column, lng2: Column) -> Column:
    sdlat = F.sin((lat2 - lat1) / 2)
    sdlng = F.sin((lng2 - lng1) / 2)
    h = sdlat * sdlat + F.cos(lat1) * F.cos(lat2) * (sdlng * sdlng)
    return 2 * F.asin(F.sqrt(F.least(F.lit(1.0), h)))


def polyline_arc_length(track: Column) -> Column:
    """Arc length (radians) of an array<struct<lat,lng>> (degrees) track."""
    edges = F.zip_with(
        F.slice(track, 1, F.size(track) - 1),
        F.slice(track, 2, F.size(track) - 1),
        lambda a, b: _haversine(F.radians(a["lat"]), F.radians(a["lng"]),
                                F.radians(b["lat"]), F.radians(b["lng"])))
    return F.aggregate(edges, F.lit(0.0), lambda acc, d: acc + d)


def polyline_num_edges(track: Column) -> Column:
    return F.size(track) - 1

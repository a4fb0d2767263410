"""Randomized distributed-operator fuzz with INDEPENDENT oracles.

The expected side never calls the engine's containment/distance kernels:
spatial-join membership is determinant-sign hemisphere intersection over
the polygon's own parsed vertices (valid for verified-convex polygons),
kNN/radius expectations are plain numpy haversine.  This extends the
round-4/5 independent-oracle fuzz (coverer, booleans, edge join) to the
remaining headline joins, in regimes the fixed fixtures never enter:
polar caps, dense clusters, boundary-hugging points, random radii.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2spark.functions import columns as C
from s2spark.kernel import cellid as ci
from s2spark.operators.knn import knn_join, radius_join
from s2spark.operators.spatial_join import points_with_cells, spatial_join
from s2spark.sources.fixtures import make_polygon

from conftest import parse_vertices


@pytest.fixture(scope="module")
def spark():
    from s2spark.plans.session import build_session
    s = build_session(app_name="s2spark-operator-fuzz", master="local[4]",
                      shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def _random_convex_vertex_string(rng) -> str:
    """Random polygon in convex position (verified: every vertex strictly
    on one side of every edge's great circle), as a fixture string."""
    for _ in range(200):
        lat0 = float(rng.uniform(-45, 45))
        lng0 = float(rng.uniform(-150, 150))
        r = float(rng.uniform(3.0, 12.0))
        n = int(rng.integers(3, 8))
        th = np.sort(rng.uniform(0, 2 * np.pi, n))
        gaps = np.diff(np.concatenate([th, [th[0] + 2 * np.pi]]))
        if gaps.min() < 0.35:
            continue
        lat = lat0 + r * np.sin(th)
        lng = lng0 + r * np.cos(th) / np.cos(np.radians(lat0))
        s = ", ".join(f"{a:.6f}:{b:.6f}" for a, b in zip(lat, lng))
        xyz = parse_vertices(s)
        ok = True
        for i in range(n):
            nrm = np.cross(xyz[i], xyz[(i + 1) % n])
            d = xyz @ nrm
            others = np.delete(d, [i, (i + 1) % n])
            if np.abs(others).min() < 1e-9 or len(np.unique(np.sign(others))) != 1:
                ok = False
                break
        if ok:
            return s, lat0, lng0, r
    raise AssertionError("could not generate a convex polygon")


def _inside_convex(xyz_pts: np.ndarray, poly_xyz: np.ndarray) -> np.ndarray:
    """Membership oracle for a convex spherical polygon: on the centroid's
    side of every edge plane (pure numpy determinant signs)."""
    c = poly_xyz.mean(axis=0)
    c = c / np.linalg.norm(c)
    inside = np.ones(len(xyz_pts), dtype=bool)
    near = np.zeros(len(xyz_pts), dtype=bool)
    for i in range(len(poly_xyz)):
        nrm = np.cross(poly_xyz[i], poly_xyz[(i + 1) % len(poly_xyz)])
        side = np.sign(float(np.dot(c, nrm)))
        d = (xyz_pts @ nrm) * side
        inside &= d > 0
        near |= np.abs(d) < 1e-9 * np.linalg.norm(nrm)
    return inside, near


def test_spatial_join_random_convex_polygons_det_oracle(spark):
    """10 random verified-convex polygons x (global uniform +
    boundary-hugging) points: the full covering + broadcast join +
    parity-kernel chain must match the determinant-sign oracle exactly
    (points within 1e-9 of an edge plane are excluded — there the oracle
    itself is ill-conditioned)."""
    rng = np.random.default_rng(20260818)
    polygons, metas = {}, {}
    for pid in range(1, 11):
        s, lat0, lng0, r = _random_convex_vertex_string(rng)
        polygons[pid] = make_polygon(s + ";")
        metas[pid] = (parse_vertices(s), lat0, lng0, r)

    lats = [rng.uniform(-80, 80, 600)]
    lngs = [rng.uniform(-179, 179, 600)]
    for pid, (_, lat0, lng0, r) in metas.items():
        th = rng.uniform(0, 2 * np.pi, 200)
        dr = r * rng.uniform(0.2, 1.5, 200)   # straddles the boundary
        lats.append(np.clip(lat0 + dr * np.sin(th), -89.9, 89.9))
        lngs.append(((lng0 + dr * np.cos(th) / np.cos(np.radians(lat0))
                      + 180) % 360) - 180)
    lat = np.concatenate(lats)
    lng = np.concatenate(lngs)
    pdf = pd.DataFrame({"point_id": np.arange(len(lat)),
                        "lat": lat, "lng": lng})
    pts = points_with_cells(spark.createDataFrame(pdf))

    got = (spatial_join(spark, pts, polygons)
           .select("point_id", "polygon_id").toPandas())
    got_sets = {pid: set(g["point_id"].tolist())
                for pid, g in got.groupby("polygon_id")}

    x, y, z = ci.xyz_from_latlng_deg(lat, lng)
    xyz_pts = np.stack([x, y, z], axis=1)
    checked_pairs = 0
    for pid, (poly_xyz, *_rest) in metas.items():
        inside, near = _inside_convex(xyz_pts, poly_xyz)
        got_ids = got_sets.get(pid, set())
        for i in np.nonzero(~near)[0]:
            assert (int(i) in got_ids) == bool(inside[i]), \
                f"polygon {pid} point {i} ({lat[i]:.5f},{lng[i]:.5f}): " \
                f"oracle={bool(inside[i])} engine={int(i) in got_ids}"
        checked_pairs += int((~near).sum())
    assert checked_pairs > 20000  # the fuzz actually graded something


def test_knn_join_polar_and_clustered_matches_bruteforce(spark):
    """kNN over a polar cap + a dense cluster + uniform background, with
    queries at the pole edge and inside the cluster: ring widening must
    cross faces at the pole and terminate early in the cluster, both
    matching brute-force haversine."""
    rng = np.random.default_rng(77)
    lat = np.concatenate([rng.uniform(78, 89.9, 200),          # polar cap
                          10 + rng.uniform(-0.5, 0.5, 200),    # dense cluster
                          rng.uniform(-70, 70, 200)])
    lng = np.concatenate([rng.uniform(-180, 180, 200),
                          10 + rng.uniform(-0.5, 0.5, 200),
                          rng.uniform(-179, 179, 200)])
    ids = np.arange(600)
    df = C.with_cell_id(spark.createDataFrame(
        pd.DataFrame({"data_id": ids, "lat": lat, "lng": lng})), "lat", "lng")
    qidx = np.array([0, 5, 199, 201, 350, 450])   # polar x3, cluster x2, bg
    queries = (df.where(F.col("data_id").isin([int(i) for i in qidx]))
               .select(F.col("data_id").alias("query_id"),
                       "lat", "lng", "cell_id"))

    got = knn_join(queries, df, k=5, initial_radius_rad=0.005).toPandas()

    lat_r, lng_r = np.radians(lat), np.radians(lng)
    for qi in qidx:
        d = 2 * np.arcsin(np.sqrt(
            np.sin((lat_r - lat_r[qi]) / 2) ** 2
            + np.cos(lat_r) * np.cos(lat_r[qi])
            * np.sin((lng_r - lng_r[qi]) / 2) ** 2))
        expect = set(np.lexsort((ids, d))[:5].tolist())
        got_ids = set(got[got.query_id == qi]["data_id"].tolist())
        assert got_ids == expect, f"query {qi}"


def test_radius_join_random_radii_matches_bruteforce(spark):
    """radius_join across four orders of magnitude of radius — bucket
    level 29 down to the all-faces planet regime — equals brute-force
    haversine pair sets at every radius."""
    rng = np.random.default_rng(4242)
    lat = rng.uniform(-85, 85, 400)
    lng = rng.uniform(-179.9, 179.9, 400)
    ids = np.arange(400)
    df = C.with_cell_id(spark.createDataFrame(
        pd.DataFrame({"data_id": ids, "lat": lat, "lng": lng})), "lat", "lng")
    queries = (df.where(F.col("data_id") < 6)
               .select(F.col("data_id").alias("query_id"),
                       "lat", "lng", "cell_id"))

    lat_r, lng_r = np.radians(lat), np.radians(lng)
    for radius in (0.003, 0.05, 0.4, 1.3, 2.8):
        got = (radius_join(queries, df, radius)
               .select("query_id", "data_id").toPandas())
        got_pairs = set(map(tuple, got.itertuples(index=False)))
        expect = set()
        for qi in range(6):
            d = 2 * np.arcsin(np.sqrt(
                np.sin((lat_r - lat_r[qi]) / 2) ** 2
                + np.cos(lat_r) * np.cos(lat_r[qi])
                * np.sin((lng_r - lng_r[qi]) / 2) ** 2))
            expect |= {(qi, int(j)) for j in np.nonzero(d <= radius)[0]}
        assert got_pairs == expect, f"radius {radius}"


def _arc_dist(p: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Geodesic distance from unit points p (N,3) to the minor arc a->b —
    independent numpy oracle (S2EdgeUtil GetDistance construction: interior
    projection iff det(p,n,a) > 0 and det(p,b,n) > 0 with n = a x b)."""
    n = np.cross(a, b)
    nn = n / np.linalg.norm(n)
    s1 = np.cross(p, n) @ a
    s2 = np.cross(p, b) @ n
    interior = (s1 > 0) & (s2 > 0)
    d_gc = np.arcsin(np.clip(np.abs(p @ nn), 0.0, 1.0))
    da = np.arctan2(np.linalg.norm(np.cross(p, a), axis=1), p @ a)
    db = np.arctan2(np.linalg.norm(np.cross(p, b), axis=1), p @ b)
    return np.where(interior, d_gc, np.minimum(da, db))


def test_arc_dist_oracle_self_check():
    """Validate the fuzz oracle itself against dense slerp sampling of
    random arcs (no engine code on either side)."""
    rng = np.random.default_rng(5)

    def unit(v):
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    for _ in range(40):
        a, b = unit(rng.normal(size=3)), unit(rng.normal(size=3))
        ang = float(np.arctan2(np.linalg.norm(np.cross(a, b)), a @ b))
        if ang < 0.05 or ang > 3.0:
            continue
        t = np.linspace(0, 1, 4001)[:, None]
        samples = unit((np.sin((1 - t) * ang) * a + np.sin(t * ang) * b)
                       / np.sin(ang))
        p = unit(rng.normal(size=(50, 3)))
        approx = np.arccos(np.clip(p @ samples.T, -1, 1)).min(axis=1)
        exact = _arc_dist(p, a, b)
        assert np.all(exact <= approx + 1e-12)
        assert np.all(approx - exact <= (ang / 4000) + 1e-9)


def _fuzz_points(rng, centers, n_uniform=600, n_near=150, spread=18.0):
    lats = [rng.uniform(-80, 80, n_uniform)]
    lngs = [rng.uniform(-179, 179, n_uniform)]
    for lat0, lng0 in centers:
        lats.append(np.clip(lat0 + rng.uniform(-spread, spread, n_near),
                            -89.9, 89.9))
        lngs.append(((lng0 + rng.uniform(-spread, spread, n_near)
                      / max(np.cos(np.radians(lat0)), 0.2) + 180)
                     % 360) - 180)
    return np.concatenate(lats), np.concatenate(lngs)


def test_buffered_join_random_polygons_and_radii(spark):
    """buffered_polygon_join (covering -> Expand(radius) -> broadcast join
    -> exact residual) vs the independent oracle: 0 inside (determinant
    signs), else min arc distance over boundary edges.  Radii span the
    level-29 bucket regime up to a sizeable fraction of the sphere."""
    from s2spark.operators.distance_ops import buffered_polygon_join

    rng = np.random.default_rng(314159)
    polys, vert_xyz, centers = {}, {}, []
    for pid in range(1, 6):
        s, lat0, lng0, _r = _random_convex_vertex_string(rng)
        polys[pid] = make_polygon(s + ";")
        vert_xyz[pid] = parse_vertices(s)
        centers.append((lat0, lng0))
    lat, lng = _fuzz_points(rng, centers)
    pdf = pd.DataFrame({"doc_id": np.arange(len(lat)),
                        "lat": lat, "lng": lng})
    pts = C.with_cell_id(spark.createDataFrame(pdf), "lat", "lng")

    x, y, z = ci.xyz_from_latlng_deg(lat, lng)
    xyz_pts = np.stack([x, y, z], axis=1)

    for radius in (0.02, 0.3, 1.0):
        got = (buffered_polygon_join(spark, pts, polys, radius)
               .select("doc_id", "polygon_id").toPandas())
        got_pairs = set(map(tuple, got.itertuples(index=False)))
        checked = 0
        for pid, vx in vert_xyz.items():
            inside, near_edge = _inside_convex(xyz_pts, vx)
            d = np.min(np.stack(
                [_arc_dist(xyz_pts, vx[i], vx[(i + 1) % len(vx)])
                 for i in range(len(vx))]), axis=0)
            d = np.where(inside, 0.0, d)
            grade = ~near_edge & (np.abs(d - radius) > 1e-6)
            for i in np.nonzero(grade)[0]:
                assert ((int(i), pid) in got_pairs) == bool(d[i] <= radius), \
                    f"radius {radius} polygon {pid} point {i}: d={d[i]:.9f}"
            checked += int(grade.sum())
        assert checked > 5000


def test_corridor_and_nearest_track_random_fuzz(spark):
    """corridor_join and nearest_track_join vs the arc-distance oracle
    over random-walk polylines: membership at each radius, and the argmin
    track assignment with the engine's 1e-9 rounded tie-break."""
    from s2spark.operators.distance_ops import (corridor_join,
                                                nearest_track_join)

    rng = np.random.default_rng(2718)
    tracks, seg_xyz, centers = {}, {}, []
    for tid in range(1, 4):
        lat0 = float(rng.uniform(-55, 55))
        lng0 = float(rng.uniform(-150, 150))
        n = int(rng.integers(3, 7))
        dlat = np.cumsum(rng.uniform(-4, 4, n))
        dlng = np.cumsum(rng.uniform(2, 6, n))
        vlat = np.clip(lat0 + dlat, -85, 85)
        vlng = ((lng0 + dlng + 180) % 360) - 180
        tracks[tid] = list(zip(vlat.tolist(), vlng.tolist()))
        xs, ys, zs = ci.xyz_from_latlng_deg(vlat, vlng)
        seg_xyz[tid] = np.stack([xs, ys, zs], axis=1)
        centers.append((lat0, lng0))
    lat, lng = _fuzz_points(rng, centers, n_uniform=500, n_near=200,
                            spread=10.0)
    pdf = pd.DataFrame({"doc_id": np.arange(len(lat)),
                        "lat": lat, "lng": lng})
    pts = C.with_cell_id(spark.createDataFrame(pdf), "lat", "lng")

    x, y, z = ci.xyz_from_latlng_deg(lat, lng)
    xyz_pts = np.stack([x, y, z], axis=1)
    dists = {}
    for tid, vx in seg_xyz.items():
        dists[tid] = np.min(np.stack(
            [_arc_dist(xyz_pts, vx[i], vx[i + 1])
             for i in range(len(vx) - 1)]), axis=0)

    for radius in (0.05, 0.5):
        got = (corridor_join(spark, pts, tracks, radius)
               .select("doc_id", "track_id").toPandas())
        got_pairs = set(map(tuple, got.itertuples(index=False)))
        checked = 0
        for tid, d in dists.items():
            grade = np.abs(d - radius) > 1e-6
            for i in np.nonzero(grade)[0]:
                assert ((int(i), tid) in got_pairs) == bool(d[i] <= radius), \
                    f"radius {radius} track {tid} point {i}: d={d[i]:.9f}"
            checked += int(grade.sum())
        assert checked > 2000

        nt = (nearest_track_join(spark, pts, tracks, radius)
              .select("doc_id", "track_id").toPandas())
        nt_map = dict(map(tuple, nt.itertuples(index=False)))
        dmat = np.stack([dists[tid] for tid in sorted(dists)], axis=1)
        rounded = np.round(dmat, 9)
        best = rounded.min(axis=1)
        runner = np.partition(rounded, 1, axis=1)[:, 1]
        for i in range(len(lat)):
            if best[i] > radius + 1e-6:
                assert i not in nt_map, f"point {i} beyond every corridor"
            elif best[i] <= radius - 1e-6 and runner[i] - best[i] > 1e-8:
                want = sorted(dists)[int(np.argmin(rounded[i]))]
                assert nt_map.get(i) == want, \
                    f"point {i}: want track {want}, got {nt_map.get(i)}"

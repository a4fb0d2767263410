"""Edge-crossing join conformance vs brute force (S2EdgeIndexTest pattern:
candidate set from the cell join must be a superset of true crossings, and
the refined output must equal brute-force enumeration;
S2EdgeIndexTest.cs:140-195)."""

import math

import numpy as np
import pandas as pd
import pytest

from s2spark.kernel import cellid as ci
from s2spark.kernel.loops import robust_crossing_batch
from tests.conftest import parse_vertices


@pytest.fixture(scope="module")
def spark():
    from s2spark.plans.session import build_session
    s = build_session(app_name="s2spark-edge-tests", master="local[4]",
                      shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def _edges_df(spark, edges: np.ndarray, key: str):
    pdf = pd.DataFrame({
        key: np.arange(len(edges)),
        "ax": edges[:, 0, 0], "ay": edges[:, 0, 1], "az": edges[:, 0, 2],
        "bx": edges[:, 1, 0], "by": edges[:, 1, 1], "bz": edges[:, 1, 2]})
    return spark.createDataFrame(pdf)


def _brute_crossings(edges_a: np.ndarray, edges_b: np.ndarray) -> set:
    m, k = len(edges_a), len(edges_b)
    A0 = np.repeat(edges_a[:, 0], k, axis=0)
    A1 = np.repeat(edges_a[:, 1], k, axis=0)
    B0 = np.tile(edges_b[:, 0], (m, 1))
    B1 = np.tile(edges_b[:, 1], (m, 1))
    rc = robust_crossing_batch(
        A0[:, 0], A0[:, 1], A0[:, 2], A1[:, 0], A1[:, 1], A1[:, 2],
        B0[:, 0], B0[:, 1], B0[:, 2], B1[:, 0], B1[:, 1], B1[:, 2]).reshape(m, k)
    return {(int(i), int(j)) for i, j in zip(*np.nonzero(rc > 0))}


def _random_cap_edges(rng, n, edge_len_rad, cap_span_rad, center=(1.0, 0.0, 0.0)):
    # random points in a cap + short edges (generateRandomEarthEdges analog)
    c = np.array(center)
    out = np.empty((n, 2, 3))
    for i in range(n):
        # random start near center
        d = rng.normal(size=3)
        d -= d @ c * c
        d /= np.linalg.norm(d)
        t = rng.uniform(0, cap_span_rad / 2)
        p = math.cos(t) * c + math.sin(t) * d
        # random second endpoint at distance <= edge_len
        e = rng.normal(size=3)
        e -= e @ p * p
        e /= np.linalg.norm(e)
        u = rng.uniform(0, edge_len_rad)
        q = math.cos(u) * p + math.sin(u) * e
        out[i, 0] = p
        out[i, 1] = q
    return out


def test_diamond_loop_zero_crossings(spark):
    # S2EdgeIndexTest.cs:149-162 — adjacent loop edges never properly cross
    v = parse_vertices("0:178, -1:180, 0:-179, 1:-180")
    edges = np.stack([np.stack([v[i], v[(i + 1) % 4]]) for i in range(4)])
    from s2spark.operators.edge_join import edge_crossing_join
    df = _edges_df(spark, edges, "edge_a")
    out = edge_crossing_join(df, _edges_df(spark, edges, "edge_b"))
    assert out.count() == 0


def test_specific_nearly_parallel_edges(spark):
    # S2EdgeIndexTest.cs:184-195 — exact-xyz nearly parallel edges; the
    # reference's checkAllCrossings oracle is "index results == brute force"
    # (minCrossings is only a floor), so conformance = match brute force
    ps = np.array([
        [0.8088625416501157, -0.40633615485481134, 0.4250086092929434],
        [0.8088939911085784, -0.40631384442755236, 0.4249700824469155],
        [0.8088088971141814, -0.40642839367135375, 0.425022503835579],
        [0.8088643962606756, -0.406333410696549, 0.4250077032402616]])
    edges = np.stack([np.stack([ps[0], ps[1]]), np.stack([ps[2], ps[3]])])
    from s2spark.operators.edge_join import edge_crossing_join
    got = {(int(r["edge_a"]), int(r["edge_b"]))
           for r in edge_crossing_join(_edges_df(spark, edges, "edge_a"),
                                       _edges_df(spark, edges, "edge_b")).collect()}
    assert got == _brute_crossings(edges, edges)


def test_random_crossings_match_brute_force(spark):
    from s2spark.operators.edge_join import edge_crossing_join
    rng = np.random.default_rng(123456)
    # dense cap -> guaranteed crossings (tryCrossingsRandomInCap analog)
    edges = _random_cap_edges(rng, 150, edge_len_rad=0.02, cap_span_rad=0.02)
    expect = _brute_crossings(edges, edges)
    assert len(expect) > 10  # the fixture must actually exercise crossings
    df_a = _edges_df(spark, edges, "edge_a")
    df_b = _edges_df(spark, edges, "edge_b")
    got = {(int(r["edge_a"]), int(r["edge_b"]))
           for r in edge_crossing_join(df_a, df_b).collect()}
    assert got == expect


def test_face_corner_edges_match_brute_force(spark):
    """Edges straddling a CUBE FACE CORNER (3 faces meet; the Moore ring
    there has 7-8 distinct neighbors, not 8, and neighbor cells live on
    other faces).  The 9-ring completeness argument leans on cross-face
    neighbor wrap (S2CellId.cs:815-865 GetAllNeighbors semantics), so this
    fixture pins it: short edges clustered around the (1,1,1)/sqrt(3)
    corner must still refine to exactly the brute-force crossing set."""
    from s2spark.operators.edge_join import edge_crossing_join
    rng = np.random.default_rng(20260817)
    corner = np.array([1.0, 1.0, 1.0]) / math.sqrt(3.0)
    edges = _random_cap_edges(rng, 250, edge_len_rad=3e-4,
                              cap_span_rad=3e-4, center=tuple(corner))
    # fixture sanity: the cluster must actually straddle multiple faces
    pts = edges.reshape(-1, 3)
    leaf = ci.from_point(pts[:, 0], pts[:, 1], pts[:, 2])
    faces = set((np.asarray(leaf, dtype=np.uint64) >> np.uint64(61)).tolist())
    assert len(faces) >= 3, f"fixture fell on faces {faces}, not a corner"
    expect = _brute_crossings(edges, edges)
    assert len(expect) > 10
    got = {(int(r["edge_a"]), int(r["edge_b"]))
           for r in edge_crossing_join(_edges_df(spark, edges, "edge_a"),
                                       _edges_df(spark, edges, "edge_b")).collect()}
    assert got == expect


def _hemisphere_plus_short(rng, n_short):
    """One near-hemisphere edge + n_short street-level edges in a cap —
    the mixed-length shape that forces a dataset-global level toward
    all-pairs (S2EdgeIndex indexes each edge at its own level to avoid
    exactly this; S2EdgeIndex.cs:327-366)."""
    short = _random_cap_edges(rng, n_short, edge_len_rad=2e-4,
                              cap_span_rad=0.3)
    long_edge = np.array([[[1.0, 0.0, 0.0], [-0.9999, 0.01, 0.0]]])
    long_edge /= np.linalg.norm(long_edge, axis=2, keepdims=True)
    return np.concatenate([long_edge, short])


def test_mixed_length_matches_brute_force(spark):
    from s2spark.operators.edge_join import edge_crossing_join
    rng = np.random.default_rng(7)
    edges = _hemisphere_plus_short(rng, 300)
    df_a = _edges_df(spark, edges, "edge_a")
    df_b = _edges_df(spark, edges, "edge_b")
    got = {(r["edge_a"], r["edge_b"])
           for r in edge_crossing_join(df_a, df_b).collect()}
    assert got == _brute_crossings(edges, edges)


def test_cells_touched_covers_arc_samples():
    """Conservativeness of the ring touch filter (numpy-only): every cell
    containing any point of the edge must survive _cells_touched.  Dense
    sampling of the arc gives the ground-truth touched set; the filter may
    keep grazing extras (padding, hemisphere fallback) but may never drop
    a truly touched cell — that would break join completeness."""
    from s2spark.operators.edge_join import _cells_touched
    rng = np.random.default_rng(424242)
    for lv in (4, 10, 20):
        # edge length ~0.9 cell widths at lv, random location incl. corners
        width = 2.0 ** (-lv)
        edges = _random_cap_edges(rng, 200, edge_len_rad=0.9 * width,
                                  cap_span_rad=2.0,
                                  center=tuple(np.array([1.0, 1.0, 1.0])
                                               / math.sqrt(3.0)))
        s, e = edges[:, 0], edges[:, 1]
        leaf = ci.from_point(s[:, 0], s[:, 1], s[:, 2])
        parents = ci.parent_for_level(leaf, lv)
        nbrs, valid = ci.get_all_neighbors(parents, lv)
        cells = np.concatenate([parents[:, None], nbrs], axis=1)
        vmask = np.concatenate(
            [np.ones((len(parents), 1), dtype=bool), valid], axis=1)
        end_parent = ci.parent_for_level(
            ci.from_point(e[:, 0], e[:, 1], e[:, 2]), lv)
        touched = vmask & _cells_touched(
            cells, lv, s[:, 0], s[:, 1], s[:, 2],
            e[:, 0], e[:, 1], e[:, 2], end_parent)
        # ground truth: parents of 200 points sampled along each arc
        ts = np.linspace(0.0, 1.0, 200)
        for r in range(len(edges)):
            kept = set(cells[r][touched[r]].tolist())
            p = s[r][None, :] * (1 - ts[:, None]) + e[r][None, :] * ts[:, None]
            p /= np.linalg.norm(p, axis=1, keepdims=True)
            on_arc = set(ci.parent_for_level(
                ci.from_point(p[:, 0], p[:, 1], p[:, 2]), lv).tolist())
            assert on_arc <= kept, (
                f"lv={lv} edge {r}: dropped truly-touched cell(s) "
                f"{on_arc - kept}")


def test_dense_same_level_candidates_tightened(spark):
    """The touch filter must shrink dense same-level candidate volume well
    below the ring-overlap (Chebyshev-2) bound: for uniform cap edges of
    ~cell-width length, ring-based indexing admits any pair whose start
    cells are within 2 cells (~25-cell partner zone), while touched-cell
    indexing admits only pairs sharing an actually-intersected cell."""
    from s2spark.operators.edge_join import candidate_pairs
    rng = np.random.default_rng(31337)
    edges = _random_cap_edges(rng, 2000, edge_len_rad=2e-4, cap_span_rad=5e-3)
    df_a = _edges_df(spark, edges, "edge_a")
    df_b = _edges_df(spark, edges, "edge_b")
    n_cand = candidate_pairs(df_a, df_b).count()
    # empirical (seed-pinned): touched-cell indexing admits 69,114 pairs
    # here; ring-based indexing admits millions (the sf0.1 driver fixture
    # measured 3,639,612 -> 473,486, a 7.7x cut).  300k keeps margin for
    # level-set shifts while failing on any regression to ring semantics.
    assert n_cand < 300_000, f"touch filter regressed: {n_cand} candidates"


def test_mixed_length_candidate_count_bounded(spark):
    """Per-edge levels must keep the candidate set linear: with one
    near-hemisphere edge + 5k short cap edges, a single global level
    (forced to the long edge's fit, ~level 0) buckets every edge
    together (~n^2 candidates), while per-edge indexing admits only
    (short, short) neighbors + (long, short) ancestor probes."""
    from s2spark.operators.edge_join import candidate_pairs
    rng = np.random.default_rng(11)
    edges = _hemisphere_plus_short(rng, 5000)
    n = len(edges)
    df_a = _edges_df(spark, edges, "edge_a")
    df_b = _edges_df(spark, edges, "edge_b")
    n_cand = candidate_pairs(df_a, df_b).count()
    # linear bound: averaged over edges, a bounded number of candidates
    # each (9-ring collisions in the cap + the long edge's probe hits);
    # the global-level plan would produce ~n^2/2 > 12M pairs here
    assert n_cand < 40 * n, f"candidate blowup: {n_cand} pairs for {n} edges"


def test_over_width_edge_far_face_crossing(spark):
    """Regression: an edge LONGER than the level-0 min cell width
    (~54 deg) extends past its start face's Moore ring — a 160-degree
    edge from the face-0 center reaches the antipodal face 3, which is
    never among face 0's neighbors.  Before the all-faces fallback, a
    crossing with a short edge there was silently dropped (both join
    branches keyless).  Such edges must index all six faces."""
    from s2spark.operators.edge_join import edge_crossing_join
    t_end = math.radians(160.0)
    long_edge = np.array([[[1.0, 0.0, 0.0],
                           [math.cos(t_end), math.sin(t_end), 0.0]]])
    px = np.array([math.cos(math.radians(155.0)),
                   math.sin(math.radians(155.0)), 0.0])
    zhat = np.array([0.0, 0.0, 1.0])
    short = np.array([[math.cos(1e-3) * px + math.sin(1e-3) * zhat,
                       math.cos(1e-3) * px - math.sin(1e-3) * zhat]])
    edges = np.concatenate([long_edge, short])
    expect = _brute_crossings(edges, edges)
    assert expect, "fixture must actually cross"
    got = {(int(r["edge_a"]), int(r["edge_b"]))
           for r in edge_crossing_join(_edges_df(spark, edges, "edge_a"),
                                       _edges_df(spark, edges, "edge_b")).collect()}
    assert got == expect


def test_random_long_edges_match_brute_force(spark):
    """Random 60-170 degree edges + globally scattered short edges:
    brute-force equivalence across the over-width all-faces fallback,
    the ring path, and their mixed-level pairings."""
    from s2spark.operators.edge_join import edge_crossing_join
    rng = np.random.default_rng(97531)
    longs = np.empty((12, 2, 3))
    for i in range(12):
        p = rng.normal(size=3)
        p /= np.linalg.norm(p)
        d = rng.normal(size=3)
        d -= d @ p * p
        d /= np.linalg.norm(d)
        t = math.radians(rng.uniform(60.0, 170.0))
        longs[i, 0] = p
        longs[i, 1] = math.cos(t) * p + math.sin(t) * d
    shorts = np.empty((120, 2, 3))
    for i in range(120):
        c = rng.normal(size=3)
        c /= np.linalg.norm(c)
        shorts[i] = _random_cap_edges(rng, 1, edge_len_rad=0.05,
                                      cap_span_rad=1e-6, center=tuple(c))[0]
    edges = np.concatenate([longs, shorts])
    expect = _brute_crossings(edges, edges)
    assert len(expect) > 10
    got = {(int(r["edge_a"]), int(r["edge_b"]))
           for r in edge_crossing_join(_edges_df(spark, edges, "edge_a"),
                                       _edges_df(spark, edges, "edge_b")).collect()}
    assert got == expect


def test_self_join_fast_path_matches_two_copy_path(spark):
    """Passing the SAME DataFrame object (carrying both key columns) must
    produce exactly the pairs of the two-copies path: the shared
    checkpoint is an execution-strategy change (one cell-UDF + explode
    pass instead of two), never a semantic one."""
    from pyspark.sql import functions as F
    from s2spark.operators.edge_join import edge_crossing_join
    rng = np.random.default_rng(99)
    edges = _hemisphere_plus_short(rng, 200)
    two_a = _edges_df(spark, edges, "edge_a")
    two_b = _edges_df(spark, edges, "edge_b")
    expect = {(int(r["edge_a"]), int(r["edge_b"]))
              for r in edge_crossing_join(two_a, two_b).collect()}
    both = two_a.withColumn("edge_b", F.col("edge_a"))
    got = {(int(r["edge_a"]), int(r["edge_b"]))
           for r in edge_crossing_join(both, both).collect()}
    assert got == expect

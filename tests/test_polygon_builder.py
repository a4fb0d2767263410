"""S2PolygonBuilder option-matrix sweep ported from
S2Geometry.Tests/S2PolygonBuilderTest.cs:64-504 (testAssembleLoops): the 12
chain fixtures x {un,}directed x {xor,union} with random rotation frames,
vertex perturbation, and randomized merge distances."""

import math

import numpy as np
import pytest

from s2spark.kernel import sphere
from s2spark.kernel.booleans import PolygonBuilder
from s2spark.kernel.loops import Loop
from s2spark.sources.fixtures import parse_vertices

# (undirected: +1/-1/0=either, xor: +1/-1/0=either, min_merge_deg,
#  max_merge_deg, chains [(str, closed)], expected loops, n_unused)
CASES = [
    # 0: no loops
    (0, 0, 0.0, 10.0, [], [], 0),
    # 1: one loop with some extra edges
    (0, 0, 0.0, 4.0,
     [("0:0, 0:10, 10:5", True), ("0:0, 5:5", False),
      ("10:5, 20:7, 30:10, 40:15, 50:3, 60:-20", False)],
     ["0:0, 0:10, 10:5"], 6),
    # 2: a loop with an edge removed by XORing, plus lots of extra edges
    (0, 1, 0.0, 1.0,
     [("0:0, 0:10, 5:15, 10:10, 10:0", True),
      ("10:10, 12:12, 14:14, 16:16, 18:18", False),
      ("14:14, 14:16, 14:18, 14:20", False),
      ("14:18, 16:20, 18:22", False),
      ("18:12, 16:12, 14:12, 12:12", False),
      ("20:18, 18:16, 16:14, 14:12", False),
      ("20:14, 18:14, 16:14", False),
      ("5:15, 0:10", False)],
     [], 21),
    # 3: three loops (two shells and one hole) that combine into one
    (0, 1, 0.0, 4.0,
     [("0:0, 0:10, 5:10, 10:10, 10:5, 10:0", True),
      ("0:10, 0:15, 5:15, 5:10", True),
      ("10:10, 5:10, 5:5, 10:5", True)],
     ["0:0, 0:10, 0:15, 5:15, 5:10, 5:5, 10:5, 10:0"], 0),
    # 4: big CCW triangle with 3 CW triangular holes -> 6 small triangles
    (-1, 0, 0.0, 0.9,
     [("0:0, 0:2, 0:4, 0:6, 1:5, 2:4, 3:3, 2:2, 1:1", True),
      ("0:2, 1:1, 1:3", True),
      ("0:4, 1:3, 1:5", True),
      ("1:3, 2:2, 2:4", True),
      ("0:0, 0:1", False),
      ("1:3, 5:7", False)],
     ["0:0, 0:2, 1:1", "0:2, 0:4, 1:3", "0:4, 0:6, 1:5",
      "1:1, 1:3, 2:2", "1:3, 1:5, 2:4", "2:2, 2:4, 3:3"], 2),
    # 5: square divided into four subsquares (extract loops, don't XOR)
    (0, -1, 0.0, 4.0,
     [("0:0, 0:5, 5:5, 5:0", True), ("0:5, 0:10, 5:10, 5:5", True),
      ("5:0, 5:5, 10:5, 10:0", True), ("5:5, 5:10, 10:10, 10:5", True),
      ("0:10, 0:15, 0:20", False), ("20:0, 15:0, 10:0", False)],
     ["0:0, 0:5, 5:5, 5:0", "0:5, 0:10, 5:10, 5:5",
      "5:0, 5:5, 10:5, 10:0", "5:5, 5:10, 10:10, 10:5"], 4),
    # 6: five nested loops that touch at a point
    (0, 0, 0.0, 0.8,
     [("0:0, 0:10, 10:10, 10:0", True), ("0:0, 1:9, 9:9, 9:1", True),
      ("0:0, 2:8, 8:8, 8:2", True), ("0:0, 3:7, 7:7, 7:3", True),
      ("0:0, 4:6, 6:6, 6:4", True)],
     ["0:0, 0:10, 10:10, 10:0", "0:0, 1:9, 9:9, 9:1",
      "0:0, 2:8, 8:8, 8:2", "0:0, 3:7, 7:7, 7:3",
      "0:0, 4:6, 6:6, 6:4"], 0),
    # 7: four diamonds nested within each other touching at two points
    (-1, 0, 0.0, 4.0,
     [("0:-20, -10:0, 0:20, 10:0", True), ("0:10, -10:0, 0:-10, 10:0", True),
      ("0:-10, -5:0, 0:10, 5:0", True), ("0:5, -5:0, 0:-5, 5:0", True)],
     ["0:-20, -10:0, 0:-10, 10:0", "0:-10, -5:0, 0:-5, 5:0",
      "0:5, -5:0, 0:10, 5:0", "0:10, -10:0, 0:20, 10:0"], 0),
    # 8: seven diamonds nested, touching at one point per nested pair
    (0, 0, 0.0, 9.0,
     [("0:-70, -70:0, 0:70, 70:0", True), ("0:-70, -60:0, 0:60, 60:0", True),
      ("0:-50, -60:0, 0:50, 50:0", True), ("0:-40, -40:0, 0:50, 40:0", True),
      ("0:-30, -30:0, 0:30, 40:0", True), ("0:-20, -20:0, 0:30, 20:0", True),
      ("0:-10, -20:0, 0:10, 10:0", True)],
     ["0:-70, -70:0, 0:70, 70:0", "0:-70, -60:0, 0:60, 60:0",
      "0:-50, -60:0, 0:50, 50:0", "0:-40, -40:0, 0:50, 40:0",
      "0:-30, -30:0, 0:30, 40:0", "0:-20, -20:0, 0:30, 20:0",
      "0:-10, -20:0, 0:10, 10:0"], 0),
    # 9: a triangle and a self-intersecting bowtie
    (0, 0, 0.0, 4.0,
     [("0:0, 0:10, 5:5", True), ("0:20, 0:30, 10:20", False),
      ("10:20, 10:30, 0:20", False)],
     ["0:0, 0:10, 5:5"], 4),
    # 10: two triangles that intersect each other
    (0, 0, 0.0, 2.0,
     [("0:0, 0:10, 5:5", True), ("2:2, 2:12, 7:7", True)],
     [], 6),
    # 11: four squares combining to a big square; center vertex copies are
    # misaligned in a chain so clustering needs multiple hops
    (0, 1, 1.5, 5.8,
     [("-8:-8, -8:0", False), ("-8:1, -8:8", False), ("0:-9, -2:0", False),
      ("-1:1, 1:9", False), ("0:8, 2:2", False), ("0:-2, 1:-8", False),
      ("8:9, 9:1", False), ("9:0, 8:-9", False), ("9:-9, 0:-8", False),
      ("1:-9, -9:-9", False), ("8:0, 1:0", False), ("1:2, -8:0", False),
      ("-8:1, 1:-1", False), ("0:1, 8:1", False), ("-9:8, 1:8", False),
      ("0:9, 8:8", False)],
     ["8.5:8.5, 8.5:0.5, 8.5:-8.5, 0.5:-8.5, "
      "-8.5:-8.5, -8.5:0.5, -8.5:8.5, 0.5:8.5"], 0),
]


def _sample_in_cap(rng, axis, radius):
    """Random point within angular radius of axis."""
    if radius <= 0:
        return axis
    # rotate a random small offset onto the axis frame
    ox, oy, oz = sphere.ortho(np.float64(axis[0]), np.float64(axis[1]),
                              np.float64(axis[2]))
    o1 = np.array([float(ox[0]), float(oy[0]), float(oz[0])])
    o2 = np.cross(axis, o1)
    theta = rng.uniform(0, 2 * math.pi)
    # uniform in cap: cos(d) uniform on [cos(radius), 1]
    cosd = rng.uniform(math.cos(radius), 1.0)
    sind = math.sqrt(max(0.0, 1 - cosd * cosd))
    p = cosd * np.asarray(axis) + sind * (math.cos(theta) * o1
                                          + math.sin(theta) * o2)
    return p / np.linalg.norm(p)


def _get_vertices(s, frame, max_perturbation, rng):
    verts = []
    for p in parse_vertices(s):
        axis = frame @ np.asarray(p, dtype=np.float64)
        axis = axis / np.linalg.norm(axis)
        verts.append(tuple(_sample_in_cap(rng, axis, max_perturbation)))
    return verts


def _loops_equal(a: Loop, b: Loop, max_error: float) -> bool:
    if a.num_vertices != b.num_vertices:
        return False
    n = a.num_vertices

    def close(p, q):
        return float(sphere.angle(
            np.float64(p[0]), np.float64(p[1]), np.float64(p[2]),
            np.float64(q[0]), np.float64(q[1]), np.float64(q[2]))) <= max_error

    for off in range(n):
        if close(a.vertex(off), b.vertex(0)):
            if all(close(a.vertex((i + off) % n), b.vertex(i))
                   for i in range(n)):
                return True
    return False


def _find_all(actual, expected, max_error):
    return all(any(_loops_equal(a, e, max_error) for e in expected)
               for a in actual)


@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_assemble_loops_case(case_idx):
    undirected_t, xor_t, min_merge_d, max_merge_d, chains, loops_out, n_unused = \
        CASES[case_idx]
    rng = np.random.default_rng(1000 + case_idx)
    min_merge = math.radians(min_merge_d)
    max_merge = math.radians(max_merge_d)
    for it in range(12):
        undirected = bool(undirected_t > 0 or (undirected_t == 0
                                               and rng.random() > 0.5))
        xor = bool(xor_t > 0 or (xor_t == 0 and rng.random() > 0.5))
        r = max(0.0, 2 * rng.random() - 1)
        max_perturbation = r * 0.25 * (max_merge - min_merge)
        r = max(0.0, 2 * rng.random() - 1)
        merge = (min_merge + 2 * max_perturbation
                 + r * (max_merge - min_merge - 4 * max_perturbation))
        builder = PolygonBuilder(xor_edges=xor, undirected_edges=undirected,
                                 validate=True, merge_distance=merge)
        # random orthonormal frame (columns = images of x, y, z)
        x = _sample_in_cap(rng, np.array([1.0, 0, 0]), math.pi)
        y = np.cross(x, _sample_in_cap(rng, np.array([0, 1.0, 0]), math.pi))
        y = y / np.linalg.norm(y)
        z = np.cross(x, y)
        z = z / np.linalg.norm(z)
        frame = np.column_stack([x, y, z])
        for s, closed in chains:
            verts = _get_vertices(s, frame, max_perturbation, rng)
            if closed:
                verts.append(verts[0])
            for i in range(1, len(verts)):
                builder.add_edge(verts[i - 1], verts[i])
        if xor_t < 0:
            loops, unused = builder.assemble_loops()
        else:
            poly, unused = builder.assemble_polygon_with_unused()
            loops = list(poly.loops)
        expected = [Loop(np.array(_get_vertices(s, frame, 0, rng)))
                    for s in loops_out]
        max_error = 0.5 * min_merge + max_perturbation
        assert _find_all(loops, expected, max_error), \
            f"case {case_idx} iter {it}: actual loops not all expected"
        assert _find_all(expected, loops, max_error), \
            f"case {case_idx} iter {it}: expected loops missing"
        assert len(unused) == n_unused, \
            f"case {case_idx} iter {it}: {len(unused)} unused != {n_unused}"

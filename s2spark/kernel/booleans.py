"""Polygon boolean operations: intersection / union via boundary clipping
and directed-XOR loop assembly.

Driver-side utilities for query-polygon preparation (SURVEY.md §2.7): the
distributed joins consume the resulting polygons like any other.  Conforms
to /root/reference/S2Geometry/S2Polygon.cs:615-811 (ClipEdge/ClipBoundary/
InitToIntersection/InitToUnion), S2EdgeUtil.GetIntersection (:218-273) and
the S2PolygonBuilder leftmost-turn loop assembly
(S2PolygonBuilder.cs:150-412).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from . import sphere
from .loops import Loop, Polygon, _occw, _vertex_crossing, robust_crossing_batch

DEFAULT_INTERSECTION_TOLERANCE = 1.5e-15  # S2EdgeUtil.cs:30

Point = tuple[float, float, float]


def _norm(p) -> Point:
    n = math.sqrt(p[0] * p[0] + p[1] * p[1] + p[2] * p[2])
    return (p[0] / n, p[1] / n, p[2] / n)


def _robust_cross(a: Point, b: Point) -> Point:
    sx, sy, sz = a[0] + b[0], a[1] + b[1], a[2] + b[2]
    dx, dy, dz = b[0] - a[0], b[1] - a[1], b[2] - a[2]
    c = (sy * dz - sz * dy, sz * dx - sx * dz, sx * dy - sy * dx)
    if c == (0.0, 0.0, 0.0):
        ox, oy, oz = sphere.ortho(np.float64(a[0]), np.float64(a[1]), np.float64(a[2]))
        return (float(ox[0]), float(oy[0]), float(oz[0]))
    return c


def get_intersection(a0: Point, a1: Point, b0: Point, b1: Point) -> Point:
    """Intersection point of two properly-crossing edges (S2EdgeUtil.cs:218-273)."""
    a_norm = _norm(_robust_cross(a0, a1))
    b_norm = _norm(_robust_cross(b0, b1))
    x = _norm(_robust_cross(a_norm, b_norm))
    s = (a0[0] + a1[0] + b0[0] + b1[0], a0[1] + a1[1] + b0[1] + b1[1],
         a0[2] + a1[2] + b0[2] + b1[2])
    if x[0] * s[0] + x[1] * s[1] + x[2] * s[2] < 0:
        x = (-x[0], -x[1], -x[2])
    if _occw(a0, x, a1, a_norm) and _occw(b0, x, b1, b_norm):
        return x

    def ang(p: Point, q: Point) -> float:
        c = (p[1] * q[2] - p[2] * q[1], p[2] * q[0] - p[0] * q[2],
             p[0] * q[1] - p[1] * q[0])
        return math.atan2(math.sqrt(c[0] ** 2 + c[1] ** 2 + c[2] ** 2),
                          p[0] * q[0] + p[1] * q[1] + p[2] * q[2])

    dmin, vmin = 10.0, x
    for cand, ok in ((a0, _occw(b0, a0, b1, b_norm)), (a1, _occw(b0, a1, b1, b_norm)),
                     (b0, _occw(a0, b0, a1, a_norm)), (b1, _occw(a0, b1, a1, a_norm))):
        if ok:
            d = ang(x, cand)
            if d < dmin:
                dmin, vmin = d, cand
    return vmin


def _distance_fraction(x: Point, a0: Point, a1: Point) -> float:
    ax = sphere.angle(np.float64(x[0]), np.float64(x[1]), np.float64(x[2]),
                      np.float64(a0[0]), np.float64(a0[1]), np.float64(a0[2]))
    bx = sphere.angle(np.float64(x[0]), np.float64(x[1]), np.float64(x[2]),
                      np.float64(a1[0]), np.float64(a1[1]), np.float64(a1[2]))
    d0, d1 = float(ax), float(bx)
    return d0 / (d0 + d1)


class PolygonBuilder:
    """Directed-XOR edge collector + leftmost-turn loop assembly
    (S2PolygonBuilderOptions.DirectedXor, S2PolygonBuilder.cs:678-782)."""

    def __init__(self, xor_edges: bool = True,
                 merge_distance: float = DEFAULT_INTERSECTION_TOLERANCE):
        self.xor_edges = xor_edges
        self.merge_distance = merge_distance
        self.edges: dict[Point, Counter] = defaultdict(Counter)

    def add_edge(self, v0: Point, v1: Point) -> None:
        if v0 == v1:
            return
        if self.xor_edges and self.edges.get(v1, Counter())[v0] > 0:
            self._erase_edge(v1, v0)
            return
        self.edges[v0][v1] += 1

    def _erase_edge(self, v0: Point, v1: Point) -> None:
        c = self.edges[v0]
        c[v1] -= 1
        if c[v1] <= 0:
            del c[v1]
        if not c:
            del self.edges[v0]

    def _merge_vertices(self) -> None:
        """Cluster vertices within merge_distance; remap edges
        (S2PolygonBuilder.cs:486-547, simplified greedy clustering)."""
        verts = list({v for v0, c in self.edges.items()
                      for v in [v0, *c.keys()]})
        if not verts:
            return
        rep: dict[Point, Point] = {}
        arr = np.array(verts)
        merged = np.zeros(len(verts), dtype=bool)
        cos_tol = math.cos(self.merge_distance)
        for i, v in enumerate(verts):
            if merged[i]:
                continue
            rep[v] = v
            if self.merge_distance <= 0:
                continue
            dots = arr @ np.array(v)
            close = np.nonzero((dots >= cos_tol) & ~merged)[0]
            for j in close:
                if j != i:
                    rep[verts[j]] = v
                    merged[j] = True
            merged[i] = True
        old = self.edges
        self.edges = defaultdict(Counter)
        for v0, c in old.items():
            for v1, n in c.items():
                a, b = rep.get(v0, v0), rep.get(v1, v1)
                for _ in range(n):
                    self.add_edge(a, b)  # re-applies xor + drops degenerates

    def _assemble_loop(self, v0: Point, v1: Point, unused: list) -> Loop | None:
        """Leftmost-turn tracing (S2PolygonBuilder.cs:339-410)."""
        path = [v0, v1]
        index = {v1: 1}
        while len(path) >= 2:
            v0, v1 = path[-2], path[-1]
            v2 = None
            for v in self.edges.get(v1, ()):  # candidates out of v1
                if v == v0:
                    continue
                if v2 is None or _occw(v0, v2, v, v1):
                    v2 = v
            if v2 is None:
                unused.append((v0, v1))
                self._erase_edge(v0, v1)
                index.pop(v1, None)
                path.pop()
            elif v2 not in index:
                index[v2] = len(path)
                path.append(v2)
            else:
                path = path[index[v2]:]
                return Loop(np.array(path))
        return None

    def _erase_loop(self, loop: Loop) -> None:
        n = loop.num_vertices
        for i in range(n):
            self._erase_edge(loop.vertex(i), loop.vertex((i + 1) % n))

    def assemble_loops(self) -> tuple[list[Loop], list]:
        if self.merge_distance > 0:
            self._merge_vertices()
        loops: list[Loop] = []
        unused: list = []
        while self.edges:
            v0 = next(iter(self.edges))
            v1 = next(iter(self.edges[v0]))
            loop = self._assemble_loop(v0, v1, unused)
            if loop is None:
                continue
            loops.append(loop)
            self._erase_loop(loop)
        return loops, unused

    def assemble_polygon(self) -> Polygon:
        loops, unused = self.assemble_loops()
        loops = [lp.normalized() for lp in loops]
        # nesting depth by containment counting (non-crossing outputs)
        final = []
        for i, lp in enumerate(loops):
            depth = sum(1 for j, other in enumerate(loops)
                        if i != j and other.contains_loop(lp))
            final.append(Loop(lp.vertices, depth=depth))
        return Polygon(final)


def _clip_boundary(a: Polygon, reverse_a: bool, b: Polygon, reverse_b: bool,
                   invert_b: bool, add_shared_edges: bool,
                   builder: PolygonBuilder) -> None:
    """Clip boundary of A to the interior (or exterior) of B
    (S2Polygon.cs:693-736); B's edge set is brute-enumerated (query
    polygons are small — index acceleration is the join's job)."""
    b_edges = []
    for lp in b.loops:
        n = lp.num_vertices
        direction = -1 if ((lp.depth & 1) ^ reverse_b) else 1
        for j in range(n):
            v_from = lp.vertex(j if direction > 0 else (n - j) % n)
            v_to = lp.vertex((j + 1) % n if direction > 0 else (n - j - 1) % n)
            b_edges.append((v_from, v_to))

    for lp in a.loops:
        n = lp.num_vertices
        direction = -1 if ((lp.depth & 1) ^ reverse_a) else 1
        v0 = lp.vertex(0)
        inside = bool(b.contains_points(np.array([v0[0]]), np.array([v0[1]]),
                                        np.array([v0[2]]))[0]) ^ invert_b
        j = 0 if direction > 0 else n
        for _ in range(n):
            a0 = lp.vertex(j % n)
            a1 = lp.vertex((j + direction) % n)
            j += direction
            intersections = []
            for b0, b1 in b_edges:
                rc = int(robust_crossing_batch(
                    np.float64(a0[0]), np.float64(a0[1]), np.float64(a0[2]),
                    np.float64(a1[0]), np.float64(a1[1]), np.float64(a1[2]),
                    np.float64(b0[0]), np.float64(b0[1]), np.float64(b0[2]),
                    np.float64(b1[0]), np.float64(b1[1]), np.float64(b1[2]))[0])
                if rc < 0:
                    continue
                if rc > 0:
                    x = get_intersection(a0, a1, b0, b1)
                    intersections.append((_distance_fraction(x, a0, a1), x))
                elif _vertex_crossing(a0, a1, b0, b1):
                    t = 0.0 if (a0 == b0 or a0 == b1) else 1.0
                    if not add_shared_edges and a1 == b1:
                        t = 1.0
                    intersections.append((t, a0 if t == 0.0 else a1))
            if inside:
                intersections.append((0.0, a0))
            inside = (len(intersections) & 1) == 1
            if inside:
                intersections.append((1.0, a1))
            intersections.sort(key=lambda p: (p[0], p[1]))
            for i in range(1, len(intersections), 2):
                builder.add_edge(intersections[i - 1][1], intersections[i][1])


def intersection(a: Polygon, b: Polygon,
                 merge_radius: float = DEFAULT_INTERSECTION_TOLERANCE) -> Polygon:
    """A ∩ B (S2Polygon.InitToIntersectionSloppy, S2Polygon.cs:763-786)."""
    if not a.bound.intersects_rect(b.bound):
        return Polygon([])
    builder = PolygonBuilder(merge_distance=merge_radius)
    _clip_boundary(a, False, b, False, False, True, builder)
    _clip_boundary(b, False, a, False, False, False, builder)
    return builder.assemble_polygon()


def union(a: Polygon, b: Polygon,
          merge_radius: float = DEFAULT_INTERSECTION_TOLERANCE) -> Polygon:
    """A ∪ B (S2Polygon.InitToUnionSloppy, S2Polygon.cs:788-811)."""
    builder = PolygonBuilder(merge_distance=merge_radius)
    _clip_boundary(a, False, b, False, True, True, builder)
    _clip_boundary(b, False, a, False, True, False, builder)
    return builder.assemble_polygon()


def difference(a: Polygon, b: Polygon,
               merge_radius: float = DEFAULT_INTERSECTION_TOLERANCE) -> Polygon:
    """A \\ B: boundary of A clipped to the exterior of REVERSED B + reversed
    boundary of B clipped to A's interior (S2Polygon InitToDifferenceSloppy:
    ClipBoundary(a, false, b, true, true, true) — reverse_b=True matters for
    vertex-crossing / shared-edge handling when B abuts A along an edge)."""
    builder = PolygonBuilder(merge_distance=merge_radius)
    _clip_boundary(a, False, b, True, True, True, builder)
    _clip_boundary(b, True, a, False, False, False, builder)
    return builder.assemble_polygon()


def destructive_union(polygons: list[Polygon],
                      merge_radius: float = DEFAULT_INTERSECTION_TOLERANCE) -> Polygon:
    """n-way union, smallest-first pairing (S2Polygon.cs:818-893)."""
    import heapq
    heap = [(sum(lp.num_vertices for lp in p.loops), i, p)
            for i, p in enumerate(polygons)]
    heapq.heapify(heap)
    counter = len(polygons)
    while len(heap) > 1:
        _, _, p1 = heapq.heappop(heap)
        _, _, p2 = heapq.heappop(heap)
        u = union(p1, p2, merge_radius)
        heapq.heappush(heap, (sum(lp.num_vertices for lp in u.loops), counter, u))
        counter += 1
    return heap[0][2] if heap else Polygon([])

"""S2 polylines: vertex chains without containment semantics.

Conforms to /root/reference/S2Geometry/S2Polyline.cs: arc length (:56-67),
interpolation (:74-117), cell relations (:125-161), validity (:201-226).
Vectorized over the vertex arrays; the Spark-facing arc-length path is a
pure higher-order Column expression (see operators side), this class
backs the coverer contract and driver-side fixtures.
"""

from __future__ import annotations

import numpy as np

from . import sphere
from .cell import Cell, cells_contain_point, cells_vertices
from .intervals import LatLngRect, RectBounder
from .loops import robust_crossing_batch


class Polyline:
    def __init__(self, vertices: np.ndarray):
        v = np.asarray(vertices, dtype=np.float64)
        if v.ndim != 2 or v.shape[1] != 3 or len(v) < 2:
            raise ValueError("polyline needs >= 2 xyz vertices")
        self.vertices = v
        bounder = RectBounder()
        for p in v:
            bounder.add_point(float(p[0]), float(p[1]), float(p[2]))
        self.bound = bounder.bound

    @property
    def num_vertices(self) -> int:
        return len(self.vertices)

    def arc_length(self) -> float:
        """Sum of edge angles (S2Polyline.cs:56-67)."""
        a = self.vertices[:-1]
        b = self.vertices[1:]
        return float(np.sum(sphere.angle(a[:, 0], a[:, 1], a[:, 2],
                                         b[:, 0], b[:, 1], b[:, 2])))

    def interpolate(self, fraction: float) -> tuple[float, float, float]:
        """Point at the given fraction of total arc length (S2Polyline.cs:74-117)."""
        if fraction <= 0:
            return tuple(map(float, self.vertices[0]))
        target = fraction * self.arc_length()
        for i in range(1, self.num_vertices):
            a, b = self.vertices[i - 1], self.vertices[i]
            length = float(sphere.angle(*a, *b))
            if target < length:
                f = np.sin(target) / np.sin(length) if length > 0 else 0.0
                # slerp along the edge
                ax = np.cos(target) - f * np.cos(length)
                p = ax * a + f * b
                n = np.linalg.norm(p)
                return tuple(map(float, p / n))
            target -= length
        return tuple(map(float, self.vertices[-1]))

    def is_valid(self) -> bool:
        """Unit-length vertices, no identical or antipodal neighbors
        (S2Polyline.cs:201-226)."""
        norms = np.linalg.norm(self.vertices, axis=1)
        if not np.allclose(norms, 1.0, atol=1e-11):
            return False
        a = self.vertices[:-1]
        b = self.vertices[1:]
        dots = np.sum(a * b, axis=1)
        return bool(np.all(np.abs(dots) < 1.0))

    # -- coverer / region contract --------------------------------------------

    def rect_bound(self) -> LatLngRect:
        return self.bound

    def cap_bound(self):
        from .cap import Cap
        cap = Cap.empty()
        for p in self.vertices:
            cap = cap.add_point(float(p[0]), float(p[1]), float(p[2]))
        return cap

    def contains_cell(self, cell: Cell) -> bool:
        """A polyline has no interior: never contains a cell (S2Polyline.cs:118-123)."""
        return False

    def may_intersect_cell(self, cell: Cell) -> bool:
        """Vertex-in-cell or edge-crosses-cell-edge (S2Polyline.cs:125-161)."""
        ids = np.array([cell.id], dtype=np.uint64)
        for p in self.vertices:
            if bool(cells_contain_point(ids, float(p[0]), float(p[1]), float(p[2]))[0]):
                return True
        cv = cells_vertices(ids)[0]
        cv1 = cv[[1, 2, 3, 0]]
        a0 = self.vertices[:-1]
        a1 = self.vertices[1:]
        m = len(a0)
        A0 = np.repeat(a0, 4, axis=0)
        A1 = np.repeat(a1, 4, axis=0)
        B0 = np.tile(cv, (m, 1))
        B1 = np.tile(cv1, (m, 1))
        rc = robust_crossing_batch(
            A0[:, 0], A0[:, 1], A0[:, 2], A1[:, 0], A1[:, 1], A1[:, 2],
            B0[:, 0], B0[:, 1], B0[:, 2], B1[:, 0], B1[:, 1], B1[:, 2])
        return bool(np.any(rc >= 0))

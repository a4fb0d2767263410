"""Spherical caps (axis + height, h = 1 - cos(theta)).

Scalar region class for the coverer plus vectorized point containment.
Conforms to /root/reference/S2Geometry/S2Cap.cs.
"""

from __future__ import annotations

import math

import numpy as np

from .cell import Cell
from .intervals import PI, LatLngRect, R1Interval, S1Interval

ROUND_UP = 1.0 + 1.0 / (1 << 52)


class Cap:
    __slots__ = ("axis", "height")

    def __init__(self, axis: tuple[float, float, float], height: float):
        self.axis = axis
        self.height = height

    def __repr__(self) -> str:
        return f"Cap(axis={self.axis}, height={self.height})"

    @staticmethod
    def empty() -> "Cap":
        return Cap((1.0, 0.0, 0.0), -1.0)

    @staticmethod
    def full() -> "Cap":
        return Cap((1.0, 0.0, 0.0), 2.0)

    @staticmethod
    def from_axis_angle(axis: tuple[float, float, float], angle_rad: float) -> "Cap":
        """Height = 2*sin^2(angle/2) — accurate for tiny caps (S2Cap.cs:76-90)."""
        d = math.sin(0.5 * angle_rad)
        return Cap(axis, 2 * d * d)

    @staticmethod
    def from_axis_height(axis: tuple[float, float, float], height: float) -> "Cap":
        return Cap(axis, height)

    @staticmethod
    def from_axis_area(axis: tuple[float, float, float], area: float) -> "Cap":
        """Cap with the given surface area (S2Cap.cs:307-311: h = A/2π)."""
        return Cap(axis, area / (2 * math.pi))

    @property
    def area(self) -> float:
        """Surface area 2π·h (S2Cap.cs:66-69; 0 for empty caps)."""
        return 2 * math.pi * max(0.0, self.height)

    @property
    def is_empty(self) -> bool:
        return self.height < 0

    @property
    def is_full(self) -> bool:
        return self.height >= 2

    @property
    def angle_radians(self) -> float:
        if self.is_empty:
            return -1.0
        return 2 * math.asin(math.sqrt(0.5 * self.height))

    def complement(self) -> "Cap":
        c_height = -1.0 if self.is_full else 2 - max(self.height, 0.0)
        ax = self.axis
        return Cap((-ax[0], -ax[1], -ax[2]), c_height)

    @property
    def is_valid(self) -> bool:
        """S2Cap.cs:96-99: unit axis and height <= 2."""
        ax, ay, az = self.axis
        return abs(ax * ax + ay * ay + az * az - 1.0) < 1e-13 and self.height <= 2

    def interior_intersects(self, other: "Cap") -> bool:
        """S2Cap.cs:336-341: Interior(X) intersects Y iff
        Complement(Interior(X)) does not contain Y."""
        return not self.complement().contains_cap(other)

    # -- point tests ---------------------------------------------------------

    def contains_point(self, x: float, y: float, z: float) -> bool:
        dx, dy, dz = self.axis[0] - x, self.axis[1] - y, self.axis[2] - z
        return dx * dx + dy * dy + dz * dz <= 2 * self.height

    def contains_points(self, x, y, z) -> np.ndarray:
        """Vectorized ||axis - p||^2 <= 2h (S2Cap.cs:476-481)."""
        dx = self.axis[0] - np.asarray(x)
        dy = self.axis[1] - np.asarray(y)
        dz = self.axis[2] - np.asarray(z)
        return dx * dx + dy * dy + dz * dz <= 2 * self.height

    def interior_contains_point(self, x: float, y: float, z: float) -> bool:
        if self.is_full:
            return True
        dx, dy, dz = self.axis[0] - x, self.axis[1] - y, self.axis[2] - z
        return dx * dx + dy * dy + dz * dz < 2 * self.height

    # -- cap-cap -------------------------------------------------------------

    def _axis_angle(self, other: "Cap") -> float:
        ax, ay, az = self.axis
        bx, by, bz = other.axis
        cx = ay * bz - az * by
        cy = az * bx - ax * bz
        cz = ax * by - ay * bx
        return math.atan2(math.sqrt(cx * cx + cy * cy + cz * cz),
                          ax * bx + ay * by + az * bz)

    def contains_cap(self, other: "Cap") -> bool:
        if self.is_full or other.is_empty:
            return True
        return self.angle_radians >= self._axis_angle(other) + other.angle_radians

    def add_point(self, x: float, y: float, z: float) -> "Cap":
        if self.is_empty:
            return Cap((x, y, z), 0.0)
        dx, dy, dz = self.axis[0] - x, self.axis[1] - y, self.axis[2] - z
        dist2 = dx * dx + dy * dy + dz * dz
        return Cap(self.axis, max(self.height, ROUND_UP * 0.5 * dist2))

    def add_cap(self, other: "Cap") -> "Cap":
        if self.is_empty:
            return Cap(other.axis, other.height)
        ang = self._axis_angle(other) + other.angle_radians
        if ang >= PI:
            return Cap(self.axis, 2.0)
        d = math.sin(0.5 * ang)
        return Cap(self.axis, max(self.height, ROUND_UP * 2 * d * d))

    # -- region interface (coverer contract) ---------------------------------

    def cap_bound(self) -> "Cap":
        return self

    def rect_bound(self) -> LatLngRect:
        """Exact lat/lng bound via law of sines (S2Cap.cs:175-239)."""
        if self.is_empty:
            return LatLngRect.empty()
        ax, ay, az = self.axis
        axis_lat = math.atan2(az, math.hypot(ax, ay))
        axis_lng = math.atan2(ay, ax)
        cap_angle = self.angle_radians
        all_longitudes = False
        lat_lo = axis_lat - cap_angle
        if lat_lo <= -PI / 2:
            lat_lo = -PI / 2
            all_longitudes = True
        lat_hi = axis_lat + cap_angle
        if lat_hi >= PI / 2:
            lat_hi = PI / 2
            all_longitudes = True
        lng_lo, lng_hi = -PI, PI
        if not all_longitudes:
            sin_a = math.sqrt(self.height * (2 - self.height))
            sin_c = math.cos(axis_lat)
            if sin_a <= sin_c:
                angle_a = math.asin(sin_a / sin_c)
                lng_lo = math.remainder(axis_lng - angle_a, 2 * PI)
                lng_hi = math.remainder(axis_lng + angle_a, 2 * PI)
        return LatLngRect(R1Interval(lat_lo, lat_hi), S1Interval(lng_lo, lng_hi))

    def _intersects_cell(self, cell: Cell, vertices) -> bool:
        """Cap intersects cell given no vertex is contained (S2Cap.cs:415-474)."""
        if self.height >= 1:
            return False
        if self.is_empty:
            return False
        if cell.contains_point(*self.axis):
            return True
        sin2_angle = self.height * (2 - self.height)
        ax, ay, az = self.axis
        for k in range(4):
            ex, ey, ez = cell.get_edge_raw(k)
            dot = ax * ex + ay * ey + az * ez
            if dot > 0:
                continue
            if dot * dot > sin2_angle * (ex * ex + ey * ey + ez * ez):
                return False
            dirx = ey * az - ez * ay
            diry = ez * ax - ex * az
            dirz = ex * ay - ey * ax
            vk = vertices[k]
            vk1 = vertices[(k + 1) & 3]
            if (dirx * vk[0] + diry * vk[1] + dirz * vk[2] < 0
                    and dirx * vk1[0] + diry * vk1[1] + dirz * vk1[2] > 0):
                return True
        return False

    def contains_cell(self, cell: Cell) -> bool:
        vertices = [cell.get_vertex(k) for k in range(4)]
        for v in vertices:
            if not self.contains_point(*v):
                return False
        return not self.complement()._intersects_cell(cell, vertices)

    def may_intersect_cell(self, cell: Cell) -> bool:
        vertices = [cell.get_vertex(k) for k in range(4)]
        for v in vertices:
            if self.contains_point(*v):
                return True
        return self._intersects_cell(cell, vertices)

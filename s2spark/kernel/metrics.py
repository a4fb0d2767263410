"""S2 cell metrics for the quadratic projection.

Metric(dim, deriv): value at level k is deriv * 2^(dim*(1-k)); the
min/max/closest level solvers mirror /root/reference/S2Geometry/S2.cs:787-880
and the derivative constants /root/reference/S2Geometry/S2Projections.cs:75-215.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

MAX_LEVEL = 30
SQRT2 = math.sqrt(2)


def _exp(v: float) -> int:
    """IEEE exponent + 1 (S2.Exp, S2.cs:99-107); 0 for v == 0."""
    if v == 0:
        return 0
    return math.frexp(v)[1]


@dataclass(frozen=True)
class Metric:
    dim: int
    deriv: float

    def get_value(self, level: int) -> float:
        return math.ldexp(self.deriv, self.dim * (1 - level))

    def get_min_level(self, value: float) -> int:
        """Min level such that the metric is at most value."""
        if value <= 0:
            return MAX_LEVEL
        exponent = _exp(value / ((1 << self.dim) * self.deriv))
        return max(0, min(MAX_LEVEL, -((exponent - 1) >> (self.dim - 1))))

    def get_max_level(self, value: float) -> int:
        """Max level such that the metric is at least value."""
        if value <= 0:
            return MAX_LEVEL
        exponent = _exp((1 << self.dim) * self.deriv / value)
        return max(0, min(MAX_LEVEL, (exponent - 1) >> (self.dim - 1)))

    def get_closest_level(self, value: float) -> int:
        return self.get_min_level(SQRT2 * value)


# Quadratic-projection derivatives (S2Projections.cs:75-215)
MIN_AREA = Metric(2, 2 * SQRT2 / 9)
MAX_AREA = Metric(2, 0.65894981424079037)
AVG_AREA = Metric(2, math.pi / 6)
MIN_ANGLE_SPAN = Metric(1, 2.0 / 3)
MAX_ANGLE_SPAN = Metric(1, 0.85244858959960922)
AVG_ANGLE_SPAN = Metric(1, math.pi / 4)
MIN_WIDTH = Metric(1, SQRT2 / 3)
MAX_WIDTH = Metric(1, MAX_ANGLE_SPAN.deriv)
AVG_WIDTH = Metric(1, 0.71726183644304969)
MIN_EDGE = Metric(1, SQRT2 / 3)
MAX_EDGE = Metric(1, MAX_ANGLE_SPAN.deriv)
AVG_EDGE = Metric(1, 0.72960687319305303)
MIN_DIAG = Metric(1, 4 * SQRT2 / 9)
MAX_DIAG = Metric(1, 1.2193272972170106)
AVG_DIAG = Metric(1, 1.03021136949923584)

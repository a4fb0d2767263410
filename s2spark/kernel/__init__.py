"""Pure-numpy S2 geometry kernels (no Spark dependency).

Everything Spark-facing (Column expressions, pandas UDFs, operators) is
built on these batch kernels; all reference-fixture conformance tests
target this layer.
"""

from . import cellid, cellunion, coverer, metrics, sphere  # noqa: F401

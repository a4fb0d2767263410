"""s2spark: a PySpark-native S2 spatial-join + tiling engine.

Reimplements the query semantics of the S2 geometry library
(reference: novotnyllc/s2-geometry-library-csharp) as an idiomatic
Spark DataFrame engine: vectorized Arrow/numpy kernels + pure Column
expressions for cell encoding, cell-prefix-range joins for
point-in-polygon, coverer-driven tile assignment, neighbor-ring kNN,
and raster<->vector tile aggregation — designed for 10^12-row tables.
"""

__version__ = "0.1.0"

"""Scalar process layer: every OpenEO scalar process as a Spark Column builder.

These run JVM-side inside whole-stage codegen — no Python in the hot path
(the reference's NumPy kernels, reference: math.py/comparison.py/logic.py/
text.py/dates.py, become Catalyst expressions here).

Null convention (deliberate divergence, documented per SURVEY.md §7 M1):
the reference encodes nodata as NaN because xarray has no null type
(reference: docs/decisions/handle-nodata-in-rastercubes.md); Spark has real
SQL NULL with Kleene three-valued logic, which is what the OpenEO spec
actually asks for — so nodata ≡ NULL internally, NaN only at export.
"""

from openeo_processes_dask_spark.functions import (  # noqa: F401
    comparison,
    dates,
    logic,
    math,
    reducers,
    text,
)

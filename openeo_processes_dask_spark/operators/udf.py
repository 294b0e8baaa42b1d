"""run_udf — arbitrary user Python over the cube
(reference: udf/udf.py:14-26 — SURVEY.md §2.15).

The reference executes a user source string defining
``apply_datacube(cube: XarrayDataCube, context)`` over the whole array.
Spark mapping: the cube block handed to user code is a pandas Series with a
MultiIndex over the non-grouped dims (the long format's native dense-block
stand-in; xarray isn't in this container). Execution is Arrow-batched
``applyInPandas`` per slice of ``chunk_dimension`` — the same
"user code sees one block at a time" contract dask gave the reference.

Sandboxing caveat (same as the reference): exec() of user code runs with
executor privileges — deploy behind a trusted-code boundary.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process
from openeo_processes_dask_spark.cube import DataCube


@process
def run_udf(
    data: DataCube,
    udf: str,
    runtime: str = "Python",
    version: Optional[str] = None,
    context: Optional[dict] = None,
    chunk_dimension: Optional[str] = None,
) -> DataCube:
    """Execute ``udf`` (source defining ``apply_datacube(cube, context)``)
    per chunk. ``chunk_dimension`` picks the dim whose slices become blocks
    (default: first band/temporal dim, else whole cube as one block)."""
    if runtime.lower() != "python":
        raise NotImplementedError(f"Only Python UDFs supported, got {runtime}")
    if chunk_dimension is None:
        cands = data.meta.band_dims or data.meta.temporal_dims
        chunk_dimension = cands[0] if cands else None

    group_cols = [chunk_dimension] if chunk_dimension else []
    other = [d for d in data.meta.dims if d not in group_cols]
    v = data.value_col
    df = data.df
    schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}"
        for c in [*data.meta.dims, v]
    )
    # capture only plain values — closing over `data` would drag the
    # DataFrame/SparkContext into the pickled closure (SPARK-5063)
    udf_src, ctx = udf, context
    dims, other_dims = list(data.meta.dims), list(other)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        ns: dict = {}
        exec(udf_src, ns)  # noqa: S102 - explicit UDF contract
        fn = ns.get("apply_datacube")
        if fn is None:
            raise ValueError("UDF must define apply_datacube(cube, context)")
        cube = pd.Series(
            pdf[v].values,
            index=pd.MultiIndex.from_frame(pdf[other_dims])
            if other_dims
            else pdf.index,
            name=v,
        )
        result = fn(cube, ctx)
        result = pd.Series(result)
        out = pdf.copy()
        if len(result) != len(pdf):
            raise ValueError(
                "UDF changed the block length "
                f"({len(pdf)} -> {len(result)}); not supported"
            )
        out[v] = result.values
        return out[[*dims, v]]

    if group_cols:
        out_df = df.groupBy(*group_cols).applyInPandas(run, schema=schema)
    else:
        from openeo_processes_dask_spark.operators.apply import (
            _guard_single_slice,
        )

        _guard_single_slice(df, "run_udf")
        out_df = df.groupBy(F.lit(1).alias("__g__")).applyInPandas(
            run, schema=schema
        )
    return data.with_df(out_df.select(*data.meta.dims, v))

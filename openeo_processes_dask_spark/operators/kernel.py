"""Neighborhood operators: 2-D convolution and rolling reduce
(reference: cubes/apply.py:131-182, apply_neighborhood_intertwin.py —
SURVEY.md §2.5).

``apply_kernel`` needs dense 2-D blocks — the one place the long format
pivots: groupBy(t, band) → Arrow batch → pandas pivot → NumPy
shift-and-add convolution → melt. Each group is one (t, band) slice, so
parallelism = |t|×|band| and executor memory holds one x×y grid at a time.
(At 100 TB with huge single slices you'd tile x/y with halos — the groupBy
key becomes (t, band, tile) and each tile carries a k-wide halo; noted in
the docstring as the scale path, not needed at these fixture sizes.)

No scipy in this container: the convolution is a pure-NumPy shift-and-add
over kernel taps — exact same result as scipy.ndimage.convolve for the
supported border modes.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process
from openeo_processes_dask_spark.cube import DataCube
from openeo_processes_dask_spark.functions.reducers import resolve_reducer
from openeo_processes_dask_spark.operators.windows import _w  # noqa: F401

_PAD_MODES = {
    "replicate": "edge",
    "reflect": "reflect",
    "reflect_pixel": "symmetric",
    "wrap": "wrap",
}


def convolve2d(grid: np.ndarray, kernel: np.ndarray, border="0") -> np.ndarray:
    """scipy-free 2-D convolution: pad, then sum shifted views × kernel
    taps (O(k²) vectorized adds — fast for the small kernels OpenEO uses).
    ``border``: replicate | reflect | reflect_pixel | wrap | numeric
    constant (reference border-mode table, cubes/apply.py:140-154)."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    if str(border) in _PAD_MODES:
        padded = np.pad(grid, ((ph, ph), (pw, pw)), mode=_PAD_MODES[str(border)])
    else:
        padded = np.pad(
            grid,
            ((ph, ph), (pw, pw)),
            mode="constant",
            constant_values=float(border),
        )
    out = np.zeros_like(grid, dtype="float64")
    h, w = grid.shape
    # convolution flips the kernel (matches scipy.ndimage.convolve)
    kf = kernel[::-1, ::-1]
    for i in range(kh):
        for j in range(kw):
            out += kf[i, j] * padded[i : i + h, j : j + w]
    return out


@process
def apply_kernel(
    data: DataCube,
    kernel: Sequence[Sequence[float]],
    factor: float = 1.0,
    border="0",
    replace_invalid: float = 0.0,
) -> DataCube:
    """2-D spatial convolution per (t, band) slice
    (reference: cubes/apply.py:131-182). NaN cells are replaced by
    ``replace_invalid`` before convolving (reference :160-162)."""
    x_dim, y_dim = data.meta.x_dim, data.meta.y_dim
    if x_dim is None or y_dim is None:
        raise ValueError("apply_kernel needs spatial dims")
    keep = data.other_dims(x_dim, y_dim)
    karr = np.asarray(kernel, dtype="float64")
    v = data.value_col
    df = data.df
    schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}"
        for c in [*keep, x_dim, y_dim, v]
    )
    fac, rinv, bord = float(factor), float(replace_invalid), border

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        grid = pdf.pivot_table(
            index=y_dim, columns=x_dim, values=v, aggfunc="first", dropna=False
        )
        arr = grid.to_numpy(dtype="float64")
        arr = np.where(np.isnan(arr), rinv, arr)
        conv = convolve2d(arr, karr, border=bord) * fac
        out = pd.DataFrame(
            {
                y_dim: np.repeat(grid.index.values, len(grid.columns)),
                x_dim: np.tile(grid.columns.values, len(grid.index)),
                v: conv.ravel(),
            }
        )
        for k in keep:
            out.insert(0, k, pdf[k].iloc[0])
        return out[[*keep, x_dim, y_dim, v]]

    if keep:
        out_df = df.groupBy(*keep).applyInPandas(run, schema=schema)
    else:
        out_df = df.groupBy(F.lit(1).alias("__g__")).applyInPandas(run, schema=schema)
    return data.with_df(out_df.select(*data.meta.dims, v))


@process
def apply_neighborhood(
    data: DataCube,
    reducer,
    dimension: str,
    size: int = 3,
    **reducer_kwargs,
) -> DataCube:
    """Centered rolling reduce along one dimension (the reference's
    rolling→construct→reduce, apply_neighborhood_intertwin.py:8-37) —
    a window frame ``rowsBetween(-size//2, size//2)``: pure JVM, no pandas.
    """
    from pyspark.sql import Window

    dim = data.assert_dim(dimension)
    keep = data.other_dims(dim)
    half = int(size) // 2
    w = (
        (Window.partitionBy(*keep) if keep else Window.partitionBy(F.lit(1)))
        .orderBy(dim)
        .rowsBetween(-half, half)
    )
    builder = resolve_reducer(reducer)
    value = builder(F.col(data.value_col), **reducer_kwargs).over(w)
    return data.with_df(data.df.withColumn(data.value_col, value))

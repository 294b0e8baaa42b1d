"""Per-pixel curve fitting (reference: ml/curve_fitting.py — SURVEY.md §2.13).

The reference runs scipy ``curve_fit`` per pixel via ``xr.curvefit``
(chunked dim=-1). Spark mapping: ``groupBy(all dims except t)`` →
``applyInPandas`` → NumPy Gauss-Newton per group (scipy is not in this
container; GN with numeric Jacobian reproduces curve_fit's least-squares
solution for well-behaved models). Time becomes epoch-seconds exactly like
the reference (curve_fitting.py:33-40).

The model ``function(params, x)`` is plain NumPy: params is a 1-D array,
x is the epoch-seconds vector — the reference's callback contract.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process
from openeo_processes_dask_spark.cube import DataCube


def gauss_newton(
    fn: Callable,
    x: np.ndarray,
    y: np.ndarray,
    p0: np.ndarray,
    max_iter: int = 50,
    tol: float = 1e-10,
    damping: float = 1e-8,
) -> np.ndarray:
    """Levenberg-damped Gauss-Newton least squares with forward-difference
    Jacobian — scipy-free curve_fit stand-in."""
    p = np.asarray(p0, dtype="float64").copy()
    n = len(p)
    lam = damping
    prev_cost = np.inf
    for _ in range(max_iter):
        r = y - fn(p, x)
        cost = float(r @ r)
        if abs(prev_cost - cost) <= tol * max(1.0, cost):
            break
        prev_cost = cost
        J = np.empty((len(x), n))
        for j in range(n):
            step = 1e-6 * max(1.0, abs(p[j]))
            pj = p.copy()
            pj[j] += step
            J[:, j] = (fn(pj, x) - fn(p, x)) / step
        A = J.T @ J + lam * np.eye(n)
        try:
            delta = np.linalg.solve(A, J.T @ r)
        except np.linalg.LinAlgError:
            break
        p += delta
    return p


@process
def fit_curve(
    data: DataCube,
    parameters: Sequence[float],
    function: Callable,
    dimension: str,
) -> DataCube:
    """Fit ``function`` along ``dimension`` per remaining-dims group
    (reference: ml/curve_fitting.py:15-97). Output: a cube whose
    ``dimension`` is replaced by a ``param`` dim holding the fitted
    coefficients (the reference's new "params" dim)."""
    dim = data.assert_dim(dimension)
    keep = data.other_dims(dim)
    v = data.value_col
    df = data.df
    p0 = np.asarray(parameters, dtype="float64")
    n_params = len(p0)
    is_ts = dict(df.dtypes)[dim].startswith("timestamp")
    schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep]
        + ["`param` int", f"`{v}` double"]
    )
    fn = function

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(dim)
        if is_ts:
            x = pdf[dim].astype("int64").to_numpy() / 1e9  # epoch seconds
        else:
            x = pdf[dim].to_numpy(dtype="float64")
        y = pdf[v].to_numpy(dtype="float64")
        ok = ~np.isnan(y)
        p = gauss_newton(fn, x[ok], y[ok], p0) if ok.sum() >= n_params else np.full(n_params, np.nan)
        out = pd.DataFrame({"param": range(n_params), v: p})
        for k in keep:
            out.insert(0, k, pdf[k].iloc[0])
        return out[[*keep, "param", v]]

    out_df = df.groupBy(*keep).applyInPandas(run, schema=schema)
    return DataCube(
        out_df,
        dims=(*keep, "param"),
        value_col=v,
        roles={**{d: data.meta.role_of(d) for d in keep}, "param": "other"},
        crs=data.meta.crs,
        attrs=data.meta.attrs,
    )


@process
def predict_curve(
    parameters: DataCube,
    function: Callable,
    dimension: str,
    labels: Sequence,
) -> DataCube:
    """Evaluate the fitted function at ``labels``
    (reference: ml/curve_fitting.py:100-162)."""
    keep = parameters.other_dims("param")
    v = parameters.value_col
    df = parameters.df
    lab = list(labels)
    is_ts = isinstance(lab[0], (pd.Timestamp,)) or isinstance(lab[0], str)
    xs = (
        pd.to_datetime(lab).astype("int64").to_numpy() / 1e9
        if is_ts
        else np.asarray(lab, dtype="float64")
    )
    dim_type = "timestamp" if is_ts else "double"
    schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep]
        + [f"`{dimension}` {dim_type}", f"`{v}` double"]
    )
    fn, lab_vals = function, lab

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        p = pdf.sort_values("param")[v].to_numpy(dtype="float64")
        y = fn(p, xs)
        out = pd.DataFrame(
            {dimension: pd.to_datetime(lab_vals) if is_ts else lab_vals, v: y}
        )
        for k in keep:
            out.insert(0, k, pdf[k].iloc[0])
        return out[[*keep, dimension, v]]

    out_df = df.groupBy(*keep).applyInPandas(run, schema=schema)
    role = "temporal" if is_ts else "other"
    return DataCube(
        out_df,
        dims=(*keep, dimension),
        value_col=v,
        roles={**{d: parameters.meta.role_of(d) for d in keep}, dimension: role},
        crs=parameters.meta.crs,
        attrs=parameters.meta.attrs,
    )

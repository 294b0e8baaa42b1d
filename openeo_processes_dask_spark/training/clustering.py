"""Distributed k-means over embedding columns — engine-reproducible.

The classic objection to k-means in a cross-engine gate (see
similarity.ivf_centroids) is that float mean accumulation order is
engine-private: two engines summing the same cluster in different orders
drift in the last ulp and the next assignment round amplifies the
difference. This implementation removes the float order-dependence
entirely:

  1. vectors are snapped to integer micro-units (round(v·10⁶), exact
     int64 well below 2⁵³), so per-cluster per-dimension SUMS are exact
     in any order and the centroid means (int_sum / n) are bit-identical
     doubles in every engine;
  2. assignment distances are left-to-right folds over those identical
     operands — bit-identical — with argmin ties broken on the lower
     cluster id;
  3. initial centroids are the k smallest md5(seed-id) vectors (the
     ivf_centroids sampling trick).

Result: a DuckDB twin that unrolls the same iterations as CTEs matches
the engine exactly — no tolerance, no rounding convention.

Scale shape: each iteration is one shuffle-free assignment projection
(k·dim literal arithmetic) + one hash aggregate of posexploded
(cluster, dim, value) rows down to k·dim sums — the aggregate output is
metadata-sized, and map-side partial aggregation means the exchange
carries k·dim partials per partition, not the corpus. Centroids live on
the driver between rounds (k·dim floats), exactly like the label-space
tables in operators/resample.py.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000.0


def _snap_micro(vec_col):
    """array<float> -> exact integer micro-units as array<double>."""
    return F.transform(
        vec_col.cast("array<double>"),
        lambda x: F.round(x * F.lit(_SCALE)),
    )


def _assign_expr(
    snapped_col, centroids: Sequence[Sequence[float]], memo_key=None
):
    """argmin_c Σ (v_i − c_i)² over literal centroids; ties -> lower id.

    ``memo_key`` (r14, guide §5): a caller-supplied descriptor of how
    ``snapped_col`` was derived (e.g. ``"snap::embedding"``). When
    given, the built Column is memoized per (applicationId, memo_key,
    centroid values) — building the k x (zip_with + aggregate)
    higher-order tree costs ~0.5 s of py4j round-trips for k=8
    (measured r14: the dominant construction cost of every assign
    consumer), and centroids are deterministic per fixture, so repeated
    query constructions reuse one immutable unresolved tree. Callers
    MUST derive ``snapped_col`` purely from the key."""

    def build():
        cands = []
        for ci, cent in enumerate(centroids):
            # ONE py4j round-trip per centroid (ndarray literal) instead
            # of one per element: k x dim F.lit calls cost ~1 ms of
            # driver socket time each (guide §5 driver work; the same
            # class as the PSL-matcher fix). Values are bit-identical —
            # lit(ndarray) and array(lit...) build the same constant.
            c = F.lit(np.asarray([float(v) for v in cent], dtype="float64"))
            dist = F.aggregate(
                F.zip_with(snapped_col, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            cands.append(F.struct(dist.alias("d"), F.lit(ci).alias("c")))
        return F.array_min(F.array(*cands)).getField("c")

    if memo_key is None:
        return build()
    from openeo_processes_dask_spark.exprmemo import memoized_exprs

    return memoized_exprs(
        (
            "kmeans_assign",
            memo_key,
            tuple(tuple(float(v) for v in c) for c in centroids),
        ),
        build,
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
):
    """Lloyd iterations on micro-unit-snapped vectors. Returns the final
    centroid list (micro-unit doubles, ``k × dim``). Empty clusters keep
    their previous centroid (matches the SQL twin's left-join coalesce).
    """
    rows = (
        df.select(
            # snap through the SAME F.round expression as the data pass —
            # Python round() is half-even, F.round half-away-from-zero,
            # and the oracle replicates the latter
            _snap_micro(F.col(vec_col)).alias("v"),
            F.md5(
                F.concat_ws("-", F.lit(str(seed)), F.col(id_col).cast("string"))
            ).alias("__k__"),
        )
        .orderBy("__k__")
        .limit(int(k))
        .collect()
    )
    if len(rows) < int(k):
        raise ValueError(
            f"kmeans_fit: k={k} but the input has only {len(rows)} row(s); "
            "fitting fewer centroids than requested would silently shrink "
            "the cluster-id range downstream — pass k <= row count"
        )
    centroids = [[float(x) for x in row["v"]] for row in rows]
    dim = len(centroids[0])

    snapped = df.select(_snap_micro(F.col(vec_col)).alias("sv"))
    for _ in range(int(iterations)):
        assigned = snapped.select(
            _assign_expr(F.col("sv"), centroids, memo_key="sv").alias("c"),
            "sv",
        )
        sums = (
            assigned.select("c", F.posexplode("sv").alias("pos", "x"))
            .groupBy("c", "pos")
            .agg(F.sum("x").alias("s"), F.count("x").alias("n"))
            .collect()
        )
        new = [list(cent) for cent in centroids]
        for r in sums:
            # exact integer sums -> the division is the only float op,
            # identical in every engine
            new[r["c"]][r["pos"]] = r["s"] / r["n"]
        centroids = new
    return centroids


def kmeans_assign(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """(id[, vec], cluster) for every vector against fitted centroids —
    one shuffle-free projection. ``keep_vec`` carries the vector column
    through so consumers that need (vector, cluster) together (e.g.
    semdedup's within-cluster join) avoid a corpus-wide re-join."""
    cols = [F.col(id_col)]
    if keep_vec:
        cols.append(F.col(vec_col))
    return df.select(
        *cols,
        _assign_expr(
            _snap_micro(F.col(vec_col)), centroids,
            memo_key=f"snap::{vec_col}",
        ).alias("cluster"),
    )

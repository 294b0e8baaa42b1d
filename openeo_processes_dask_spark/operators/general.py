"""Cube metadata / dimension-management ops (reference: cubes/general.py —
SURVEY.md §2.11). Mostly metadata rewrites; the data-touching ones
(trim_cube) stay single-pass aggregations."""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process
from openeo_processes_dask_spark.cube import CubeMeta, DataCube, DimensionNotAvailable


from openeo_processes_dask_spark.exceptions import (  # noqa: F401
    DimensionAlreadyExists,
    DimensionLabelCountMismatch,
    LabelExists,
    LabelMismatch,
    LabelsNotEnumerated,
)


@process
def create_data_cube(spark: Optional[SparkSession] = None) -> DataCube:
    """Empty cube (reference: cubes/general.py:38-39)."""
    spark = spark or SparkSession.getActiveSession()
    df = spark.createDataFrame([], "value double")
    return DataCube(df, dims=())


@process
def add_dimension(
    data: DataCube, name: str, label, type: str = "other"  # noqa: A002
) -> DataCube:
    """Add a size-1 dimension (reference: cubes/general.py:72-100) —
    a constant column plus a role registration (the reference's
    ``add_dim_type``, cubes/_xr_interop.py:111-126)."""
    if name in data.meta.dims:
        raise DimensionAlreadyExists(f"Dimension {name} already exists")
    df = data.df.withColumn(name, F.lit(label))
    roles = {**data.meta.roles, name: type}
    return DataCube(
        df.select(*data.meta.dims, name, data.value_col),
        dims=(*data.meta.dims, name),
        value_col=data.value_col,
        roles=roles,
        crs=data.meta.crs,
        attrs=data.meta.attrs,
    )


@process
def drop_dimension(data: DataCube, name: str) -> DataCube:
    """Drop a dimension; errors if it has more than one label
    (reference: cubes/general.py:26-35). The label-count check is a real
    (cheap) action — ``distinct().limit(2)`` short-circuits the scan."""
    data.assert_dim(name)
    n = data.df.select(name).distinct().limit(2).count()
    if n > 1:
        raise DimensionLabelCountMismatch(
            f"Cannot drop dimension {name} with more than one label"
        )
    keep = data.other_dims(name)
    return DataCube(
        data.df.drop(name),
        dims=tuple(keep),
        value_col=data.value_col,
        roles={d: data.meta.role_of(d) for d in keep},
        crs=data.meta.crs,
        attrs=data.meta.attrs,
    )


@process
def dimension_labels(data: DataCube, dimension: str, max_labels: int = 1_000_000):
    """Distinct sorted labels of a dim (reference: cubes/general.py:59-69).
    Returns a 1-column DataFrame (collect at the call site if needed).

    The reference returns the FULL label array by contract — fine for
    cube axes (10³–10⁴ labels), a driver OOM waiting to happen on an
    event-grade dim with 10⁹ distinct timestamps (VERDICT r9 #8). A
    bounded cardinality probe (``limit(max_labels + 1).count()`` — never
    counts past the cap) guards the contract: above ``max_labels`` the
    call raises :class:`IrregularAxisTooLarge` with the same
    sized-message pattern as the axis-geometry probes, asking the caller
    to aggregate/filter instead of materializing the labels. Pass a
    larger ``max_labels`` to override deliberately."""
    dim = data.assert_dim(dimension)
    labels = data.df.select(dim).distinct()
    if labels.limit(max_labels + 1).count() > max_labels:
        from openeo_processes_dask_spark.exceptions import (
            IrregularAxisTooLarge,
        )

        raise IrregularAxisTooLarge(
            f"Dimension '{dim}' has more than {max_labels} distinct "
            f"labels — returning the full label list would flood the "
            f"driver. Aggregate or filter the dimension instead, or pass "
            f"a larger max_labels explicitly."
        )
    return labels.orderBy(dim)


@process
def rename_dimension(data: DataCube, source: str, target: str) -> DataCube:
    """(reference: cubes/general.py:103-147)"""
    data.assert_dim(source)
    if target in data.meta.dims:
        raise DimensionAlreadyExists(f"Dimension {target} already exists")
    df = data.df.withColumnRenamed(source, target)
    dims = tuple(target if d == source else d for d in data.meta.dims)
    roles = {
        (target if d == source else d): r for d, r in data.meta.roles.items()
    }
    # preserve the guessed role of the source under the new name
    roles.setdefault(target, data.meta.role_of(source))
    return DataCube(
        df,
        dims=dims,
        value_col=data.value_col,
        roles=roles,
        crs=data.meta.crs,
        attrs=data.meta.attrs,
    )


@process
def rename_labels(
    data: DataCube, dimension: str, target: Sequence, source: Optional[Sequence] = None
) -> DataCube:
    """Map dim labels source[i] -> target[i]
    (reference: cubes/general.py:150-222). Compiles to a literal CASE chain
    (equivalently a broadcast map-join without the join)."""
    dim = data.assert_dim(dimension)
    if source is not None and len(source) > 0 and len(source) != len(target):
        raise DimensionLabelCountMismatch(
            f"LabelMismatch: {len(source)} source vs {len(target)} target labels"
        )
    col = F.col(dim)
    if source is None or len(source) == 0:
        # Enumerated fallback (reference: cubes/general.py:197-211):
        # positional rename over the SORTED distinct labels.
        # len(target) == n renames all; fewer targets are legal only for
        # enumerated (0-based positional) labels and rename the first
        # len(target); more targets is a LabelMismatch. Every probe is
        # DISTRIBUTED and every collect bounded by len(target) — an
        # argument-sized budget — so an event-grade dim (1e9 labels)
        # costs three small jobs, never a full label collect (same
        # class as the mask/merge probe fixes).
        n = int(
            data.df.agg(F.countDistinct(col).alias("n")).collect()[0]["n"]
        )
        clash = (
            data.df.select(col.alias("__l__"))
            .where(col.isin(list(target)))
            .first()
        )
        if clash is not None:
            raise LabelExists(
                f"LabelExists: label {clash['__l__']!r} already among "
                "target labels"
            )
        if len(target) > n:
            raise DimensionLabelCountMismatch(
                f"LabelMismatch: {len(target)} target labels for "
                f"{n} dimension labels"
            )
        if len(target) < n:
            # reference: `0 in source_labels` gates the partial rename.
            # Only a numeric dim can contain 0 (Python `0 in [strings]`
            # is False); probing a string dim with `col == 0` would
            # ANSI-cast-error instead.
            dtype = dict(data.df.dtypes)[dim]
            numeric = dtype in (
                "tinyint", "smallint", "int", "bigint",
                "float", "double",
            ) or dtype.startswith("decimal")
            has_zero = numeric and (
                data.df.where(col == F.lit(0)).first() is not None
            )
            if not has_zero:
                raise LabelsNotEnumerated(
                    "LabelsNotEnumerated: dimension labels are not enumerated"
                )
        source = [
            r[0]
            for r in data.df.select(dim)
            .distinct()
            .orderBy(dim)
            .limit(len(target))
            .collect()
        ]
    expr = None
    for s, tgt in zip(source, target):
        expr = F.when(col == s, F.lit(tgt)) if expr is None else expr.when(
            col == s, F.lit(tgt)
        )
    expr = expr.otherwise(col)
    return data.with_df(data.df.withColumn(dim, expr))


@process
def trim_cube(data: DataCube) -> DataCube:
    """Drop labels that are all-NULL along every non-spatial dim
    (reference: cubes/general.py:42-56). ALL per-dim label surveys run in a
    single GROUPING SETS pass — one scan + one shuffle however many dims
    are trimmed (the naive per-dim aggregate re-scans the full table once
    per dim, which at 100 TB is the whole cost). The resulting label sets
    are metadata-sized and broadcast-semi-join back."""
    df = data.df
    v = F.col(data.value_col)
    trim_dims = [
        d for d in data.meta.dims if data.meta.role_of(d) not in ("x", "y")
    ]
    if not trim_dims:
        return data
    # persist: the survey result is metadata-sized (sum of label
    # cardinalities), but without it Catalyst's column pruning specializes
    # the subtree per keep-set branch and the full scan re-runs once per
    # dim (verified in the executed plan: ReusedExchange never matches the
    # pruned copies). At cluster scale this would be a small warehouse
    # table instead.
    surveys = (
        df.groupingSets([[d] for d in trim_dims], *trim_dims)
        .agg(
            F.max(v.isNotNull()).alias("__any__"),
            F.grouping_id().alias("__gid__"),
        )
        .persist()
    )
    n = len(trim_dims)
    out = df
    for i, dim in enumerate(trim_dims):
        # grouping_id sets the bit of every aggregated-away column (first
        # groupBy column = most significant); the {dim_i} set keeps only
        # bit i clear
        gid = ((1 << n) - 1) ^ (1 << (n - 1 - i))
        keep_labels = surveys.where(
            (F.col("__gid__") == gid) & F.col("__any__")
        ).select(dim)
        out = out.join(F.broadcast(keep_labels), on=dim, how="left_semi")
    return data.with_df(out)


@process
def inspect(data: DataCube, message: str = "", code: str = "User", level: str = "info"):
    """Log and pass through unchanged (reference: cubes/inspect.py:9-29)."""
    import logging

    logging.getLogger("openeo_processes_dask_spark").log(
        getattr(logging, level.upper(), logging.INFO), "%s [%s]: %s", code, level, message
    )
    return data

"""Session factory with the confs this engine is designed against.

These are the knobs SURVEY.md §7 and the 100 TB design rules assume; tests
and bench use the same set so local behavior predicts cluster behavior.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession


def make_session(
    master: str = "local[*]",
    app_name: str = "openeo-processes-spark",
    shuffle_partitions: Optional[int] = None,
    driver_memory: Optional[str] = None,
) -> SparkSession:
    """SparkSession tuned for this engine:

    - AQE on, with partition coalescing and skew-join splitting: cube dims
      are often skewed (one hot band / one dense day) and AQE's runtime
      re-planning is the first line of defense before manual salting.
    - ``spark.sql.shuffle.partitions`` sized to cores locally; on a cluster
      set it near 2-3× total executor cores (AQE coalesces the excess).
    - ``maxPartitionBytes`` at the 128 MB default: with the long-format
      (5-column) cube a scan partition holds ~5M cells — well inside
      executor memory even with per-cell expression state.
    - Arrow enabled for every pandas-UDF boundary; timezone pinned UTC so
      calendar bucketing is reproducible.
    """
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if driver_memory:
        b = b.config("spark.driver.memory", driver_memory)
    return b.getOrCreate()


def repartition_spatial(cube, num_partitions: Optional[int] = None):
    """Range-partition a cube by (x, y) — the long-format analogue of the
    reference's dask spatial chunks (SURVEY.md §1.5). Co-locates spatial
    neighborhoods so mask_polygon / apply_kernel tiles / aggregate_spatial
    touch few partitions, and makes subsequent bbox filters align with
    partition boundaries."""
    x_dim, y_dim = cube.meta.x_dim, cube.meta.y_dim
    if x_dim is None or y_dim is None:
        raise ValueError("repartition_spatial needs spatial dims")
    if num_partitions:
        df = cube.df.repartitionByRange(num_partitions, x_dim, y_dim)
    else:
        df = cube.df.repartitionByRange(x_dim, y_dim)
    return cube.with_df(df)


def repartition_temporal(cube, num_partitions: Optional[int] = None):
    """Pre-shape for window ops ALONG time (cumulatives, interpolation):
    range-partition by the non-temporal dims — the window partition keys —
    so each per-pixel time series lands in one partition and the window
    exchange becomes a no-op reuse."""
    tdims = cube.meta.temporal_dims
    if not tdims:
        raise ValueError("repartition_temporal needs a temporal dim")
    if num_partitions:
        df = cube.df.repartitionByRange(num_partitions, *cube.other_dims(*tdims))
    else:
        df = cube.df.repartitionByRange(*cube.other_dims(*tdims))
    return cube.with_df(df)

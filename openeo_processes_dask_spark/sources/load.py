"""Sources: parquet → DataCube constructors + synthetic test cubes.

The reference's load path (``load_stac``, reference: cubes/load.py:94-322)
splits into (a) driver-side catalog/metadata work and (b) a lazy chunked
array read. Our equivalents: (a) stays driver-side Python, (b) is
``spark.read.parquet`` — predicate pushdown + column pruning from Catalyst
replace the reference's hand-rolled bbox/band pre-filtering
(reference: load.py:119-156, 262-264).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process
from openeo_processes_dask_spark.cube import DataCube

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _read_parquet_nanosafe(spark: SparkSession, path: str) -> DataFrame:
    """Read parquet that may contain TIMESTAMP(NANOS) columns (Spark has no
    nanosecond timestamp type and errors on them by default).

    Driver-side: sniff the footer schema with pyarrow (metadata-only, no
    data read). Executor-side: read nanos as bigint via the legacy conf and
    convert to microsecond timestamps with a pure expression — the scan
    stays distributed and column-pruned.
    """
    import pyarrow.parquet as pq

    arrow_schema = pq.read_schema(path)
    nano_cols = [
        f.name
        for f in arrow_schema
        if str(f.type).startswith("timestamp[ns")
    ]
    if not nano_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nano_cols:
        # integer div, NOT float div: double rounding of huge nano counts
        # can shift the microsecond by 1 vs DuckDB's truncation
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _read_parquet_nanosafe(spark, f"{sf_dir}/{name}.parquet")


def nan_to_null(df: DataFrame, *cols: str) -> DataFrame:
    """Normalize NaN → NULL on ingest. The engine's nodata is SQL NULL
    (functions/__init__.py); sources that encode missing values as NaN
    (pandas exports, the reference's own convention) must pass through this
    at the boundary, or isNull-based operators will treat NaN as valid."""
    for c in cols or [f.name for f in df.schema if f.dataType.simpleString() in ("double", "float")]:
        df = df.withColumn(c, F.nanvl(F.col(c), F.lit(None)))
    return df


def events_cube(spark: SparkSession, sf_dir: str) -> DataCube:
    """The driver's ``events`` table as a sparse data cube:
    t = ts (temporal), band = event_type, user_id kept as an extra dim.
    Multiple samples may share (user_id, t, band) — aggregations treat them
    as repeated observations."""
    df = load_table(spark, sf_dir, "events").select(
        F.col("user_id"),
        F.col("ts").alias("t"),
        F.col("event_type").alias("band"),
        F.col("value"),
    )
    return DataCube(df, dims=("user_id", "t", "band"))


def lineitem_cube(
    spark: SparkSession, sf_dir: str, value: str = "l_quantity"
) -> DataCube:
    """lineitem as a cube: x = l_orderkey, pos = l_linenumber (unique cell
    key), t = l_shipdate, band = l_returnflag."""
    df = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("x"),
        F.col("l_linenumber").alias("pos"),
        F.col("l_shipdate").alias("t"),
        F.col("l_returnflag").alias("band"),
        F.col(value).alias("value").cast("double"),
    )
    return DataCube(df, dims=("x", "pos", "t", "band"), roles={"pos": "other"})


@process
def load_parquet_cube(
    spark: SparkSession,
    path: str,
    dims: tuple[str, ...],
    value_col: str = "value",
    **cube_kwargs,
) -> DataCube:
    return DataCube(
        spark.read.parquet(path), dims=dims, value_col=value_col, **cube_kwargs
    )


def create_fake_rastercube(
    spark: SparkSession,
    data: np.ndarray | None = None,
    size=(6, 5, 4, 4),
    spatial_extent: dict | None = None,
    temporal_extent=("2018-05-01", "2018-06-01"),
    bands=("B02", "B03", "B04", "B08"),
    seed: int = 42,
    dtype="float32",
    num_partitions: int | None = None,
) -> DataCube:
    """Spark port of the reference's synthetic cube generator
    (reference: tests/mockdata.py:13-64 + tests/conftest.py:33-56):
    evenly spaced x/y inside a bbox, a date_range for t, seeded
    rng.integers(-100, 100) values — long format, 4-D (x, y, t, band).

    ``num_partitions`` stands in for the reference's dask-chunked layout
    (FIXTURES.md F1 requires single- vs multi-partition result equality).
    """
    spatial_extent = spatial_extent or {
        "west": 10.45,
        "east": 10.5,
        "south": 46.1,
        "north": 46.2,
    }
    if data is not None:
        size = data.shape
    size_x, size_y, size_t, size_b = size
    bands = list(bands)[:size_b]
    xs = np.arange(
        spatial_extent["west"],
        spatial_extent["east"],
        (spatial_extent["east"] - spatial_extent["west"]) / size_x,
    )[:size_x]
    ys = np.arange(
        spatial_extent["south"],
        spatial_extent["north"],
        (spatial_extent["north"] - spatial_extent["south"]) / size_y,
    )[:size_y]
    ts = pd.date_range(temporal_extent[0], temporal_extent[1], periods=size_t)
    if data is None:
        rng = np.random.default_rng(seed)
        data = rng.integers(-100, 100, size=(size_x, size_y, size_t, size_b)).astype(
            dtype
        )
    xi, yi, ti, bi = np.meshgrid(
        np.arange(size_x),
        np.arange(size_y),
        np.arange(size_t),
        np.arange(size_b),
        indexing="ij",
    )
    pdf = pd.DataFrame(
        {
            "x": xs[xi.ravel()],
            "y": ys[yi.ravel()],
            "t": ts[ti.ravel()],
            "band": np.asarray(bands, dtype=object)[bi.ravel()],
            "value": data.ravel().astype("float64"),
        }
    )
    df = spark.createDataFrame(pdf)
    if num_partitions:
        df = df.repartition(num_partitions)
    return DataCube(
        df, dims=("x", "y", "t", "band"), crs="EPSG:4326", attrs={"seed": seed}
    )

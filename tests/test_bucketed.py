"""Bucketed cube storage: the co-located-join layout must eliminate the
exchange for joins keyed on the bucket columns."""

import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_spark.sources.load import (
    create_fake_rastercube,
    load_bucketed_cube,
    save_cube_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    a = create_fake_rastercube(spark, size=(8, 6, 3, 2), seed=1)
    b = create_fake_rastercube(spark, size=(8, 6, 3, 2), seed=2)
    save_cube_bucketed(a, "cube_a", n_buckets=4, path=str(base / "a"))
    save_cube_bucketed(b, "cube_b", n_buckets=4, path=str(base / "b"))
    dims = a.meta.dims
    yield (
        load_bucketed_cube(spark, "cube_a", dims),
        load_bucketed_cube(spark, "cube_b", dims),
    )  # x_idx / y_idx ride along as extra (non-dim) columns
    spark.sql("DROP TABLE IF EXISTS cube_a")
    spark.sql("DROP TABLE IF EXISTS cube_b")


def test_bucketed_roundtrip_values(spark, bucketed_pair):
    a, _ = bucketed_pair
    orig = create_fake_rastercube(spark, size=(8, 6, 3, 2), seed=1)
    got = sorted(map(tuple, a.df.drop("x_idx", "y_idx").collect()))
    want = sorted(map(tuple, orig.df.collect()))
    assert got == want
    # derived integer grid indices: exact, dense, zero-based
    idx = a.df.select("x", "x_idx").distinct().collect()
    assert sorted(r["x_idx"] for r in idx) == list(range(8))


def test_bucketed_join_no_exchange(spark, bucketed_pair):
    """Join on the derived integer bucket keys (x_idx, y_idx): both sides
    are storage-partitioned identically AND the keys are non-float (float
    keys make the planner disable bucketed scans), so the physical plan
    must contain NO Exchange."""
    a, b = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.df.join(b.df.select(
            "x_idx", "y_idx", "t", "band", F.col("value").alias("v2")
        ), ["x_idx", "y_idx"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_has_exchange(spark, bucketed_pair):
    """Control: the same join from plain (unbucketed) frames shuffles —
    proves the no-Exchange assertion above is the bucketing, not AQE."""
    a = create_fake_rastercube(spark, size=(8, 6, 3, 2), seed=1)
    b = create_fake_rastercube(spark, size=(8, 6, 3, 2), seed=2)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.df.join(
            b.df.select("x", "y", F.col("value").alias("v2")), ["x", "y"]
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_zordered_layout_tight_file_stats(spark, tmp_path):
    """Z-order sink: every written file covers a compact (x, y) rectangle,
    so parquet footer min/max stats can prune bbox queries — the sum of
    per-file bbox areas must be a small fraction of what an unordered
    layout gives (where every file spans the full extent)."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.sources.load import save_cube_zordered

    n = 64
    df = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).cast("double").alias("x"),
            (F.col("id") / n).cast("long").cast("double").alias("y"),
            (F.col("id") * 1.0).alias("value"),
        )
        # scatter rows so the input has NO spatial locality to begin with
        .repartition(8)
    )
    cube = DataCube(df, dims=("x", "y"))
    out = str(tmp_path / "zorder")
    save_cube_zordered(cube, out, n_files=16)

    files = sorted(glob.glob(out + "/*.parquet"))
    assert len(files) >= 8  # range partitioner may merge a few
    full_area = float(n - 1) * float(n - 1)
    total = 0.0
    for f in files:
        md = pq.ParquetFile(f).metadata
        xs, ys = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in ("x", "y") and col.statistics is not None:
                    (xs if name == "x" else ys).append(
                        (col.statistics.min, col.statistics.max)
                    )
        x_lo, x_hi = min(a for a, _ in xs), max(b for _, b in xs)
        y_lo, y_hi = min(a for a, _ in ys), max(b for _, b in ys)
        total += (x_hi - x_lo) * (y_hi - y_lo)
    naive = len(files) * full_area  # unordered: every file spans everything
    assert total < 0.3 * naive, (total, naive)

    # and the layout is only a layout: values roundtrip exactly
    back = spark.read.parquet(out)
    assert back.count() == n * n
    assert back.agg(F.sum("value")).first()[0] == df.agg(F.sum("value")).first()[0]


def test_zorder_value_locality():
    """Morton curve sanity: neighbors in (x, y) are near on the curve,
    quadrants separate."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    from pyspark.sql import functions as F

    from openeo_processes_dask_spark.sources.load import zorder_value

    df = spark.createDataFrame(
        [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (255.0, 255.0)], "x double, y double"
    )
    z = df.select(
        zorder_value(F.col("x"), F.col("y"), 0.0, 1.0, 0.0, 1.0, bits=8).alias("z")
    ).collect()
    vals = [r["z"] for r in z]
    assert vals[0] == 0 and vals[1] == 1 and vals[2] == 2
    assert vals[3] == (1 << 16) - 1  # all 16 bits set

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

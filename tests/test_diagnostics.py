"""PlanReport: structured plan-shape assertions."""

from __future__ import annotations

from pyspark.sql import functions as F

from openeo_processes_dask_spark.diagnostics import plan_report


def test_plan_report_counts_joins_and_exchanges(spark):
    a = spark.range(1000).select(F.col("id"), (F.col("id") % 7).alias("k"))
    b = spark.range(7).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
    joined = a.join(F.broadcast(b), "k").groupBy("tag").count()
    joined.collect()  # finalize the AQE plan so codegen spans are marked
    r = plan_report(joined)
    assert r.broadcast_joins == 1
    assert r.nested_loop_joins == 0
    assert r.exchanges >= 1  # the groupBy
    assert r.python_free
    assert r.codegen_spans >= 1
    assert "bhj=1" in r.summary()


def test_plan_report_sees_pushdown_and_python(spark, tmp_path):
    import os

    p = os.path.join(str(tmp_path), "t")
    spark.range(100).select(
        F.col("id"), (F.col("id") * 2.0).alias("v")
    ).write.parquet(p)
    df = spark.read.parquet(p).where(F.col("id") > 50).select("id")
    r = plan_report(df)
    assert r.scans == 1
    assert any("id" in f for f in r.pushed_filters)

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def plus1(s):
        return s + 1

    r2 = plan_report(spark.range(10).select(plus1(F.col("id"))))
    assert r2.python_evals == 1 and not r2.python_free


def test_plan_report_on_engine_operator(spark):
    """Gopher filter must stay a no-exchange, python-free scan."""
    from openeo_processes_dask_spark.training.filtering import gopher_filter

    docs = spark.createDataFrame(
        [(1, "some words here for the test of it all")], ["doc_id", "text"]
    )
    r = plan_report(gopher_filter(docs))
    assert r.exchanges == 0
    assert r.python_free

"""stream_weighted_reservoir: online A-ES weighted sampling per key."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_spark.streaming.events import (
    run_stream_to_memory,
)
from openeo_processes_dask_spark.streaming.sessions import (
    stream_weighted_reservoir,
)
from openeo_processes_dask_spark.training.sampling import (
    sample_weighted_fixed,
)

SCHEMA = "user_id bigint, event_id bigint, t timestamp, value double"


@pytest.fixture(scope="module")
def batch_df(spark):
    rows = [
        (
            i % 4,
            i,
            f"2024-01-01 00:{i % 60:02d}:00",
            float((i * 37) % 50 + 1),
        )
        for i in range(240)
    ]
    return spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, t string, value double"
    ).select(
        "user_id", "event_id", F.col("t").cast("timestamp").alias("t"), "value"
    )


def _drain(spark, stream, name):
    out = stream_weighted_reservoir(stream, k=5, seed=9)
    q = run_stream_to_memory(out, name, output_mode="append")
    q.awaitTermination(120)
    return spark.table(name)


def test_single_batch_equals_batch_sample(spark, batch_df):
    d = os.path.join(tempfile.gettempdir(), "res_stream_one")
    batch_df.orderBy("event_id").coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(SCHEMA).parquet(d)
    got = {
        (r["user_id"], r["event_id"])
        for r in _drain(spark, stream, "res_one").collect()
    }
    expect = {
        (r["user_id"], r["event_id"])
        for r in sample_weighted_fixed(
            batch_df, 5, "value", ["user_id"], seed=9, id_col="event_id"
        ).collect()
    }
    assert got == expect


def test_multi_batch_admits_superset_containing_batch_sample(spark, batch_df):
    """Two micro-batches: the final reservoir is the batch sample, and the
    emitted (admitted-over-time) set is a superset of it — early
    admissions later evicted stay emitted (online-quota caveat), but
    nothing from the true sample is ever missed."""
    d = os.path.join(tempfile.gettempdir(), "res_stream_two")
    first = batch_df.where(F.col("event_id") < 120)
    second = batch_df.where(F.col("event_id") >= 120)
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    first.coalesce(1).write.mode("append").parquet(d)
    second.coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = {
        (r["user_id"], r["event_id"])
        for r in _drain(spark, stream, "res_two").collect()
    }
    expect = {
        (r["user_id"], r["event_id"])
        for r in sample_weighted_fixed(
            batch_df, 5, "value", ["user_id"], seed=9, id_col="event_id"
        ).collect()
    }
    assert expect <= got
    # each user admits at least k and at most 2k over two batches
    from collections import Counter

    per_user = Counter(u for u, _ in got)
    assert all(5 <= n <= 10 for n in per_user.values()), per_user

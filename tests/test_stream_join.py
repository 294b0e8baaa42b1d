"""streaming/events.py stream_stream_join — watermarked two-stream join."""

import datetime as dt

from pyspark.sql import functions as F

from openeo_processes_dask_spark.streaming.events import (
    run_stream_to_memory,
    stream_stream_join,
)


def _write_stream_dir(spark, tmp_path, name, rows):
    d = str(tmp_path / name)
    spark.createDataFrame(
        rows, "user_id bigint, t timestamp, value double"
    ).orderBy("t").coalesce(1).write.mode("overwrite").parquet(d)
    return d


def _read_stream(spark, d):
    return spark.readStream.schema(
        "user_id bigint, t timestamp, value double"
    ).parquet(d)


def test_stream_stream_join_matches_batch(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    views = [
        (1, ts(0), 1.0), (1, ts(60), 2.0), (2, ts(5), 3.0),
        (3, ts(10), 4.0),
    ]
    clicks = [
        (1, ts(10), 10.0),   # joins view@0 (within 30m)
        (1, ts(65), 20.0),   # joins view@60
        (2, ts(50), 30.0),   # 45m after view@5 -> NO match
        (3, ts(10), 40.0),   # same instant -> match
        (4, ts(1), 50.0),    # no view for user 4
    ]
    vd = _write_stream_dir(spark, tmp_path, "views", views)
    cd = _write_stream_dir(spark, tmp_path, "clicks", clicks)
    out = stream_stream_join(
        _read_stream(spark, vd), _read_stream(spark, cd),
        on="user_id", within="30 minutes",
    )
    q = run_stream_to_memory(out, "ssj_test", output_mode="append")
    q.awaitTermination(120)
    got = sorted(
        (r["l_user_id"], r["l_value"], r["r_value"])
        for r in spark.table("ssj_test").collect()
    )
    assert got == [(1, 1.0, 10.0), (1, 2.0, 20.0), (3, 4.0, 40.0)]

    # batch twin: identical condition on the static frames
    bv = spark.read.parquet(vd).alias("v")
    bc = spark.read.parquet(cd).alias("c")
    batch = sorted(
        (r["u"], r["lv"], r["rv"])
        for r in bv.join(
            bc,
            (F.col("v.user_id") == F.col("c.user_id"))
            & (F.col("c.t") >= F.col("v.t"))
            & (F.col("c.t") <= F.col("v.t") + F.expr("INTERVAL 30 minutes")),
        )
        .select(
            F.col("v.user_id").alias("u"),
            F.col("v.value").alias("lv"),
            F.col("c.value").alias("rv"),
        )
        .collect()
    )
    assert got == batch


def test_stream_stream_left_outer(spark, tmp_path):
    """Outer-join NULL emission is WATERMARK-gated: an unmatched left row
    only materializes once the watermark passes its join-state expiry, so
    a later micro-batch must advance the watermark first (with a single
    AvailableNow batch the NULL is withheld — pinned semantics)."""
    import os
    import time

    t0 = dt.datetime(2024, 1, 1)
    vd = str(tmp_path / "v2")
    # file A: the real events; files B and C (strictly later mtimes):
    # far-future rows. Trigger 2 (file B) advances the watermark past
    # A's state expiry AT BATCH END; trigger 3 (file C) then performs
    # the eviction that emits A's unmatched row — outer NULLs always
    # trail the watermark bump by one trigger.
    spark.createDataFrame(
        [(1, t0, 1.0), (2, t0, 2.0)],
        "user_id bigint, t timestamp, value double",
    ).coalesce(1).write.mode("overwrite").parquet(vd)
    for hours in (3, 6):
        time.sleep(1.1)
        spark.createDataFrame(
            [(99, t0 + dt.timedelta(hours=hours), 0.0)],
            "user_id bigint, t timestamp, value double",
        ).coalesce(1).write.mode("append").parquet(vd)
    # the GLOBAL watermark is the MIN across both streams (default
    # multipleWatermarkPolicy), so the clicks side must advance too — a
    # far-future click (user 99, matches no view) rides along in batch 0
    cd = _write_stream_dir(
        spark, tmp_path, "c2",
        [
            (1, t0 + dt.timedelta(minutes=5), 9.0),
            (99, t0 + dt.timedelta(hours=9), 0.0),
        ],
    )
    out = stream_stream_join(
        spark.readStream.schema(
            "user_id bigint, t timestamp, value double"
        ).option("maxFilesPerTrigger", 1).parquet(vd),
        _read_stream(spark, cd),
        on="user_id", within="30 minutes", how="left_outer",
    )
    q = run_stream_to_memory(out, "ssj_lo", output_mode="append")
    q.awaitTermination(180)
    rows = {
        (r["l_user_id"], r["r_value"])
        for r in spark.table("ssj_lo").collect()
    }
    assert (1, 9.0) in rows
    assert (2, None) in rows

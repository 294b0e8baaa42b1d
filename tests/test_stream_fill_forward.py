"""streaming/sessions.py stream_fill_forward — the stateful streaming
twin of operators/interval.py fill_forward (LOCF gap fill)."""

import datetime as dt
import random

from openeo_processes_dask_spark.operators.interval import fill_forward
from openeo_processes_dask_spark.streaming.sessions import (
    stream_fill_forward,
)

SCHEMA = "event_id bigint, t timestamp, k bigint, value double"


def _drain(out, name):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _rows(n=200, null_every=4):
    random.seed(23)
    t0 = dt.datetime(2024, 1, 1)
    return [
        (
            i,
            t0 + dt.timedelta(minutes=i),
            i % 3,
            None if i % null_every == 2 else round(random.uniform(0, 9), 2),
        )
        for i in range(n)
    ]


def test_stream_fill_forward_matches_batch(spark, tmp_path):
    """Single sorted-batch drain == the batch LOCF window row for row,
    and `filled` marks exactly the patched gaps."""
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    d = str(tmp_path / "ff_src")
    df.orderBy("t").coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(SCHEMA).parquet(d)
    _drain(stream_fill_forward(stream), "ff_test")
    got = {
        (r["k"], r["event_id"]): (r["value"], r["filled"])
        for r in spark.table("ff_test").collect()
    }
    exp = {
        (r["k"], r["event_id"]): r["value"]
        for r in fill_forward(
            df, "value", on="t", by="k", tie_col="event_id"
        ).collect()
    }
    assert len(got) == len(rows)
    orig = {(k, eid): v for eid, _, k, v in rows}
    for key, (v, filled) in got.items():
        assert v == exp[key], key
        assert filled == (orig[key] is None and v is not None), key


def test_stream_fill_forward_max_gap_matches_batch(spark, tmp_path):
    """The staleness bound replays the batch rule: a carried value
    older than max_gap (relative to the gap row's own t) is unusable,
    and a later observation resets the clock."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 0, 5.0),
        (2, t0 + dt.timedelta(seconds=30), 0, None),   # 30s old -> fill
        (3, t0 + dt.timedelta(seconds=300), 0, None),  # 300s old -> stale
        (4, t0 + dt.timedelta(seconds=310), 0, 7.0),   # fresh observation
        (5, t0 + dt.timedelta(seconds=350), 0, None),  # 40s old -> fill
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    d = str(tmp_path / "ffg_src")
    df.orderBy("t").coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(SCHEMA).parquet(d)
    _drain(stream_fill_forward(stream, max_gap=60), "ffg_test")
    got = {
        r["event_id"]: (r["value"], r["filled"])
        for r in spark.table("ffg_test").collect()
    }
    assert got[2] == (5.0, True)
    assert got[3] == (None, False)
    assert got[5] == (7.0, True)
    exp = {
        r["event_id"]: r["value"]
        for r in fill_forward(
            df, "value", on="t", by="k", tie_col="event_id", max_gap=60
        ).collect()
    }
    assert {e: v for e, (v, _) in got.items()} == exp


def test_stream_fill_forward_state_carries_across_batches(
    spark, tmp_path
):
    """Two files -> two micro-batches: batch 2's gap is filled with the
    observation carried in batch 1's state."""
    t0 = dt.datetime(2024, 1, 1)
    d = str(tmp_path / "ff_src2")
    spark.createDataFrame(
        [(1, t0, 0, 3.5)], SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(d)
    spark.createDataFrame(
        [(2, t0 + dt.timedelta(minutes=1), 0, None)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(SCHEMA)
        .parquet(d)
    )
    _drain(stream_fill_forward(stream), "ff_test2")
    got = {
        r["event_id"]: (r["value"], r["filled"])
        for r in spark.table("ff_test2").collect()
    }
    assert got[1] == (3.5, False)
    assert got[2] == (3.5, True)


def test_stream_fill_forward_late_row_never_backward_fills(
    spark, tmp_path
):
    """ADVICE r11 #1: a cross-batch late NULL row (t BEFORE the carried
    state's t) stays NULL in BOTH modes — with and without max_gap —
    instead of being filled from the FUTURE observation (which would be
    backward fill, not LOCF)."""
    t0 = dt.datetime(2024, 1, 1)
    for name, gap in (("ff_late_nogap", None), ("ff_late_gap", 3600.0)):
        d = str(tmp_path / name)
        # batch 1: observation at t0+10min enters state
        spark.createDataFrame(
            [(1, t0 + dt.timedelta(minutes=10), 0, 4.0)], SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(d)
        # batch 2: late NULL row at t0 (precedes the carried state)
        spark.createDataFrame(
            [(2, t0, 0, None)], SCHEMA
        ).coalesce(1).write.mode("append").parquet(d)
        stream = (
            spark.readStream.option("maxFilesPerTrigger", 1)
            .schema(SCHEMA)
            .parquet(d)
        )
        _drain(stream_fill_forward(stream, max_gap=gap), name)
        got = {
            r["event_id"]: (r["value"], r["filled"])
            for r in spark.table(name).collect()
        }
        assert got[1] == (4.0, False), (name, got)
        assert got[2] == (None, False), (name, got)

"""asof_join (operators/interval.py) — the data-level merge_asof /
temporal-join twin. Brute-force parity against pandas.merge_asof for
all three directions, tolerance, how, per-key grouping, duplicate
right timestamps (deterministic max-struct representative), and
unmatched lefts."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_spark.operators.interval import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    lefts = [
        # (id, k, t)
        (1, "a", 10.0), (2, "a", 25.0), (3, "a", 3.0),
        (4, "b", 10.0), (5, "b", 100.0),
        (6, "c", 7.0),          # key with no rights at all
    ]
    rights = [
        # (k, t, v)
        ("a", 5.0, 50.0), ("a", 10.0, 100.0), ("a", 20.0, 200.0),
        ("b", 11.0, 110.0), ("b", 90.0, 900.0),
    ]
    ldf = spark.createDataFrame(lefts, "id int, k string, t double")
    rdf = spark.createDataFrame(rights, "k string, t double, v double")
    lp = pd.DataFrame(lefts, columns=["id", "k", "t"])
    rp = pd.DataFrame(rights, columns=["k", "t", "v"])
    return ldf, rdf, lp, rp


def _got(df):
    rows = df.orderBy("id").collect()
    return [(r["id"], r["right_t"], r["right_v"]) for r in rows]


def _exp(lp, rp, direction, tolerance=None):
    m = pd.merge_asof(
        lp.sort_values("t"),
        rp.sort_values("t").rename(columns={"t": "right_t", "v": "right_v"}),
        left_on="t",
        right_on="right_t",
        by="k",
        direction=direction,
        tolerance=tolerance,
    ).sort_values("id")
    return [
        (int(r.id), None if pd.isna(r.right_t) else r.right_t,
         None if pd.isna(r.right_v) else r.right_v)
        for r in m.itertuples()
    ]


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_matches_pandas_merge_asof(spark, frames, direction):
    ldf, rdf, lp, rp = frames
    got = _got(asof_join(ldf, rdf, on="t", by="k", direction=direction))
    assert got == _exp(lp, rp, direction)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_tolerance_matches_pandas(spark, frames, direction):
    ldf, rdf, lp, rp = frames
    got = _got(
        asof_join(
            ldf, rdf, on="t", by="k", direction=direction, tolerance=5.0
        )
    )
    assert got == _exp(lp, rp, direction, tolerance=5.0)


def test_inner_drops_unmatched(spark, frames):
    ldf, rdf, _, _ = frames
    got = _got(
        asof_join(ldf, rdf, on="t", by="k", direction="backward", how="inner")
    )
    ids = [g[0] for g in got]
    assert 6 not in ids          # key c: no rights
    assert 3 not in ids          # t=3 before every 'a' right
    assert all(g[1] is not None for g in got)


def test_equal_time_right_matches_backward_and_forward(spark):
    l = spark.createDataFrame([(1, 10.0)], "id int, t double")
    r = spark.createDataFrame([(10.0, 1.0)], "t double, v double")
    for d in ("backward", "forward", "nearest"):
        got = asof_join(l, r, on="t", direction=d).collect()[0]
        assert got["right_t"] == 10.0 and got["right_v"] == 1.0, d


def test_nearest_tie_prefers_backward(spark):
    l = spark.createDataFrame([(1, 10.0)], "id int, t double")
    r = spark.createDataFrame(
        [(8.0, 1.0), (12.0, 2.0)], "t double, v double"
    )
    got = asof_join(l, r, on="t", direction="nearest").collect()[0]
    assert got["right_t"] == 8.0


def test_duplicate_right_timestamps_deterministic(spark):
    # two rights at the same (k, t): the max payload struct wins,
    # regardless of partitioning
    l = spark.createDataFrame([(1, "a", 10.0)], "id int, k string, t double")
    r = spark.createDataFrame(
        [("a", 5.0, 1.0), ("a", 5.0, 9.0)], "k string, t double, v double"
    )
    for parts in (1, 7):
        got = asof_join(
            l, r.repartition(parts), on="t", by="k"
        ).collect()[0]
        assert got["right_v"] == 9.0, parts


def test_timestamp_on_column_and_tolerance_seconds(spark):
    l = spark.createDataFrame(
        [(1, "2020-01-01 00:01:00")], "id int, ts string"
    ).select("id", F.col("ts").cast("timestamp").alias("ts"))
    r = spark.createDataFrame(
        [("2020-01-01 00:00:00", 5.0)], "ts string, v double"
    ).select(F.col("ts").cast("timestamp").alias("ts"), F.col("v"))
    hit = asof_join(l, r, on="ts", tolerance=60).collect()[0]
    assert hit["right_v"] == 5.0
    miss = asof_join(l, r, on="ts", tolerance=59).collect()[0]
    assert miss["right_v"] is None


def test_plan_is_one_partitioned_window_no_join(spark, frames):
    ldf, rdf, _, _ = frames
    out = asof_join(ldf, rdf, on="t", by="k")
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in phys
    assert "CartesianProduct" not in phys
    assert "SortMergeJoin" not in phys and "BroadcastHashJoin" not in phys


def test_snapshot_validity_intervals(spark):
    from openeo_processes_dask_spark.streaming.events import (
        snapshot_validity_intervals,
    )

    snaps = spark.createDataFrame(
        [("a", 1.0, 10.0), ("a", 5.0, 50.0), ("a", 5.0, 60.0),
         ("b", 3.0, 30.0)],
        "k string, t double, v double",
    )
    rows = {
        (r["k"], r["__valid_from__"]): (r["__valid_to__"], r["v"])
        for r in snapshot_validity_intervals(snaps, on="t", by="k").collect()
    }
    # duplicate (a, 5.0) collapses to max payload (60.0); intervals
    # partition each key's timeline; last one open-ended
    assert rows == {
        ("a", 1.0): (5.0, 10.0),
        ("a", 5.0): (None, 60.0),
        ("b", 3.0): (None, 30.0),
    }


def test_stream_asof_matches_batch_backward(spark, frames, tmp_path):
    """The streaming as-of (interval-containment rewrite) must emit the
    SAME row set as the batch asof_join backward over the same data."""
    from openeo_processes_dask_spark.streaming.events import (
        run_stream_to_memory,
        stream_asof_against,
    )

    ldf, rdf, _, _ = frames
    path = str(tmp_path / "asof_stream")
    ldf.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema("id int, k string, t double").parquet(
        path
    )
    out = stream_asof_against(stream, rdf, on="t", by="k", how="left")
    q = run_stream_to_memory(out, "t_stream_asof", output_mode="append")
    q.awaitTermination(120)
    got = {
        (r["id"], r["right_t"], r["right_v"])
        for r in spark.table("t_stream_asof").collect()
    }
    batch = {
        (r["id"], r["right_t"], r["right_v"])
        for r in asof_join(
            ldf, rdf, on="t", by="k", direction="backward", how="left"
        ).collect()
    }
    assert got == batch


def test_fill_forward_locf(spark):
    from openeo_processes_dask_spark.operators.interval import fill_forward

    rows = [
        # (id, k, t, v): NULL gaps fill from the key's last non-null
        (1, "a", 1.0, 10.0), (2, "a", 2.0, None), (3, "a", 3.0, None),
        (4, "a", 4.0, 40.0), (5, "a", 5.0, None),
        (6, "b", 1.0, None),             # leading NULL: stays NULL
        (7, "b", 2.0, 70.0), (8, "b", 3.0, None),
    ]
    df = spark.createDataFrame(rows, "id int, k string, t double, v double")
    got = {
        r["id"]: r["v"]
        for r in fill_forward(df, "v", on="t", by="k", tie_col="id").collect()
    }
    assert got == {1: 10.0, 2: 10.0, 3: 10.0, 4: 40.0, 5: 40.0,
                   6: None, 7: 70.0, 8: 70.0}


def test_fill_forward_tie_break_deterministic(spark):
    from openeo_processes_dask_spark.operators.interval import fill_forward

    # two rows at the SAME (k, t); tie_col orders them, so the NULL in
    # id=2 fills from id=1 (same timestamp, smaller tie) — stable under
    # repartitioning
    rows = [(1, "a", 5.0, 11.0), (2, "a", 5.0, None), (3, "a", 6.0, None)]
    df = spark.createDataFrame(rows, "id int, k string, t double, v double")
    for parts in (1, 5):
        got = {
            r["id"]: r["v"]
            for r in fill_forward(
                df.repartition(parts), "v", on="t", by="k", tie_col="id"
            ).collect()
        }
        assert got == {1: 11.0, 2: 11.0, 3: 11.0}, parts


def test_fill_forward_multiple_columns_one_window(spark):
    from openeo_processes_dask_spark.operators.interval import fill_forward

    rows = [(1, 1.0, 1.0, None), (2, 2.0, None, 20.0), (3, 3.0, None, None)]
    df = spark.createDataFrame(rows, "id int, t double, a double, b double")
    out = fill_forward(df, ["a", "b"], on="t", tie_col="id")
    got = {r["id"]: (r["a"], r["b"]) for r in out.collect()}
    assert got == {1: (1.0, None), 2: (1.0, 20.0), 3: (1.0, 20.0)}
    # all filled columns share ONE window exec (one exchange + sort)
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Window") <= 1 or phys.count("Exchange") <= 2


def test_fill_forward_max_gap_bounds_staleness(spark):
    from openeo_processes_dask_spark.operators.interval import fill_forward

    rows = [
        (1, 0.0, 10.0), (2, 1.0, None), (3, 2.0, None),
        (4, 10.0, None),  # 10 units after the last reading: too stale
    ]
    df = spark.createDataFrame(rows, "id int, t double, v double")
    got = {
        r["id"]: r["v"]
        for r in fill_forward(
            df, "v", on="t", tie_col="id", max_gap=2.0
        ).collect()
    }
    assert got == {1: 10.0, 2: 10.0, 3: 10.0, 4: None}


def test_fill_forward_max_gap_per_column_clock(spark):
    from openeo_processes_dask_spark.operators.interval import fill_forward

    # a and b were last observed at DIFFERENT times; the gap must be
    # measured per column against its own last reading
    rows = [
        (1, 0.0, 1.0, None), (2, 3.0, None, 2.0), (3, 4.0, None, None),
    ]
    df = spark.createDataFrame(rows, "id int, t double, a double, b double")
    got = {
        r["id"]: (r["a"], r["b"])
        for r in fill_forward(
            df, ["a", "b"], on="t", tie_col="id", max_gap=2.0
        ).collect()
    }
    # at t=4: a's last obs t=0 (gap 4 > 2 -> NULL), b's t=3 (gap 1 -> 2.0)
    assert got == {1: (1.0, None), 2: (None, 2.0), 3: (None, 2.0)}


def test_fill_forward_max_gap_timestamp_seconds(spark):
    from openeo_processes_dask_spark.operators.interval import fill_forward

    rows = [
        (1, "2020-01-01 00:00:00", 7.0),
        (2, "2020-01-01 00:00:30", None),
        (3, "2020-01-01 00:02:00", None),
    ]
    df = spark.createDataFrame(rows, "id int, ts string, v double").select(
        "id", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    got = {
        r["id"]: r["v"]
        for r in fill_forward(
            df, "v", on="ts", tie_col="id", max_gap=60
        ).collect()
    }
    assert got == {1: 7.0, 2: 7.0, 3: None}


def test_null_on_rights_never_match(spark):
    """ADVICE r10: a NULL-time right must not become a phantom backward
    match (it would sort NULLS-FIRST in the union window)."""
    l = spark.createDataFrame([(1, "a", 10.0)], "id int, k string, t double")
    r = spark.createDataFrame(
        [("a", None, 99.0), ("a", 5.0, 50.0)], "k string, t double, v double"
    )
    for d in ("backward", "forward", "nearest"):
        got = asof_join(l, r, on="t", by="k", direction=d).collect()[0]
        assert got["right_v"] != 99.0, d
    # with ONLY a NULL-time right, there is no match at all
    r2 = spark.createDataFrame([("a", None, 99.0)], "k string, t double, v double")
    got = asof_join(l, r2, on="t", by="k", direction="backward").collect()[0]
    assert got["right_t"] is None and got["right_v"] is None
    assert (
        asof_join(l, r2, on="t", by="k", how="inner").count() == 0
    )


def test_null_on_left_gets_null_match(spark):
    """A left row with NULL time cannot be distance-matched: NULL right
    columns under how='left', dropped under how='inner' — for EVERY
    direction (forward/nearest would otherwise phantom-match the first
    right, since NULLs sort first)."""
    l = spark.createDataFrame(
        [(1, "a", None), (2, "a", 10.0)], "id int, k string, t double"
    )
    r = spark.createDataFrame([("a", 5.0, 50.0)], "k string, t double, v double")
    for d in ("backward", "forward", "nearest"):
        rows = {
            x["id"]: (x["right_t"], x["right_v"])
            for x in asof_join(l, r, on="t", by="k", direction=d).collect()
        }
        assert rows[1] == (None, None), d
        assert rows[2][1] == 50.0 or d == "forward", d
    inner = asof_join(l, r, on="t", by="k", how="inner")
    assert [x["id"] for x in inner.collect()] == [2]


def test_empty_right_payload_match_time_only(spark):
    """VERDICT r10 #4: a right relation with ONLY the on/by columns
    degrades to a match-time-only as-of instead of an opaque analysis
    error on max(struct())."""
    l = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 3.0)], "id int, k string, t double"
    )
    r = spark.createDataFrame([("a", 5.0), ("a", 9.0)], "k string, t double")
    out = asof_join(l, r, on="t", by="k", direction="backward")
    assert set(out.columns) == {"id", "k", "t", "right_t"}
    got = {x["id"]: x["right_t"] for x in out.collect()}
    assert got == {1: 9.0, 2: None}


def test_on_dtype_mismatch_raises(spark):
    """VERDICT r10 #4: timestamp-vs-numeric 'on' mix must raise, not
    silently compare unix micros against raw numbers."""
    l = spark.createDataFrame([(1, "2020-01-01 00:00:00")], "id int, ts string")
    l = l.select("id", F.col("ts").cast("timestamp").alias("t"))
    r = spark.createDataFrame([(5.0, 1.0)], "t double, v double")
    with pytest.raises(ValueError, match="incompatible 'on' dtypes"):
        asof_join(l, r, on="t")
    with pytest.raises(ValueError, match="incompatible 'on' dtypes"):
        asof_join(r.select("t", "v"), l.select("t"), on="t")


def test_missing_on_or_by_column_raises(spark):
    l = spark.createDataFrame([(1, 1.0)], "id int, t double")
    r = spark.createDataFrame([(1.0, 2.0)], "ts double, v double")
    with pytest.raises(ValueError, match="must exist on both sides"):
        asof_join(l, r, on="t")
    with pytest.raises(ValueError, match="must exist on both sides"):
        asof_join(l, r.withColumnRenamed("ts", "t"), on="t", by="k")


def test_snapshot_validity_intervals_null_time_dropped(spark):
    from openeo_processes_dask_spark.streaming.events import (
        snapshot_validity_intervals,
    )

    snaps = spark.createDataFrame(
        [("a", None, 99.0), ("a", 1.0, 10.0)], "k string, t double, v double"
    )
    rows = snapshot_validity_intervals(snaps, on="t", by="k").collect()
    assert len(rows) == 1
    assert rows[0]["__valid_from__"] == 1.0

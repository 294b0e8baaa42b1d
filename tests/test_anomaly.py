"""training/anomaly.py — rolling z-score anomaly detection."""

import statistics

import pytest

from openeo_processes_dask_spark.training.anomaly import (
    anomalies,
    rolling_zscore,
)


def test_rolling_zscore_matches_statistics(spark):
    vals = [10.0, 11.0, 9.0, 10.5, 50.0, 10.2]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["seq", "value"])
    got = {
        r["seq"]: r["zscore"]
        for r in rolling_zscore(df, "value", ["seq"], window=4).collect()
    }
    # seq 0: no history; seq 1: one history row -> NULL
    assert got[0] is None and got[1] is None
    for i in range(2, len(vals)):
        hist = vals[max(0, i - 4) : i]
        exp = (vals[i] - statistics.mean(hist)) / statistics.stdev(hist)
        assert got[i] == pytest.approx(exp, rel=1e-9), i
    # the spike at seq 4 is a huge positive outlier
    assert got[4] > 10


def test_rolling_zscore_zero_variance_is_null(spark):
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(4)] + [(4, 9.0)], ["seq", "value"]
    )
    got = {
        r["seq"]: r["zscore"]
        for r in rolling_zscore(df, "value", ["seq"], window=3).collect()
    }
    assert got[3] is None  # constant history -> sd 0 -> NULL, not inf
    assert got[4] is None


def test_anomalies_partitioned(spark):
    rows = [("a", i, 1.0 + (i % 3) * 0.1) for i in range(30)]
    rows[20] = ("a", 20, 99.0)
    rows += [("b", i, float(i)) for i in range(10)]  # steady ramp: no alarms? z bounded
    df = spark.createDataFrame(rows, ["k", "seq", "value"])
    out = anomalies(
        df, "value", ["seq"], partition_cols=["k"], window=10,
        threshold=3.0,
    ).collect()
    assert [(r["k"], r["seq"]) for r in out] == [("a", 20)]


def test_rolling_zscore_rejects_tiny_window(spark):
    df = spark.createDataFrame([(1, 1.0)], ["seq", "value"])
    with pytest.raises(ValueError):
        rolling_zscore(df, "value", ["seq"], window=1)


def test_stream_anomaly_matches_batch(spark, tmp_path):
    """Single-batch drain of the online detector must equal the batch
    rolling-window operator row for row."""
    import datetime as dt
    import random

    from pyspark.sql import functions as F

    from openeo_processes_dask_spark.streaming.sessions import stream_anomaly

    random.seed(5)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(300):
        band = "ab"[i % 2]
        v = random.gauss(10, 1)
        if i in (100, 201):
            v = 60.0
        rows.append((i, t0 + dt.timedelta(minutes=i), band, v))
    d = str(tmp_path / "anom_src")
    df = spark.createDataFrame(
        rows, "event_id bigint, t timestamp, band string, value double"
    )
    df.orderBy("t").coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(
        "event_id bigint, t timestamp, band string, value double"
    ).parquet(d)
    out = stream_anomaly(stream, window=15, threshold=3.0)
    q = (
        out.writeStream.format("memory")
        .queryName("anom_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["event_id"], round(r["zscore"], 6))
        for r in spark.table("anom_test").collect()
    }
    exp = {
        (r["event_id"], round(r["zscore"], 6))
        for r in anomalies(
            df, "value", ["t", "event_id"], partition_cols=["band"],
            window=15, threshold=3.0,
        ).collect()
    }
    assert got == exp
    assert {e for e, _ in got} >= {100, 201}


# --- ema ----------------------------------------------------------------

def _py_ema(vals, num=2, den=10):
    out, prev = [], None
    for v in vals:
        vm = round(v * 1_000_000)
        prev = vm if prev is None else (num * vm + (den - num) * prev) // den
        out.append(prev)
    return out


def test_ema_matches_python_replay(spark):
    from openeo_processes_dask_spark.training.anomaly import ema

    rows = [("a", i, [5.0, 7.25, 1.5, 9.0, 9.0, 0.25][i]) for i in range(6)]
    rows += [("b", 0, 3.0), ("b", 1, 4.5)]
    df = spark.createDataFrame(rows, "k string, t long, value double").repartition(4)
    out = ema(df, "value", ["t"], ["k"], alpha_num=2, alpha_den=10)
    got_a = [
        r["ema_micro"]
        for r in out.where("k = 'a'").orderBy("t").collect()
    ]
    assert got_a == _py_ema([5.0, 7.25, 1.5, 9.0, 9.0, 0.25])
    got_b = [
        r["ema_micro"]
        for r in out.where("k = 'b'").orderBy("t").collect()
    ]
    assert got_b == _py_ema([3.0, 4.5])


def test_ema_alpha_one_is_identity(spark):
    from openeo_processes_dask_spark.training.anomaly import ema

    df = spark.createDataFrame(
        [("a", i, float(i) + 0.5) for i in range(4)],
        "k string, t long, value double",
    )
    out = ema(df, "value", ["t"], ["k"], alpha_num=1, alpha_den=1)
    for r in out.collect():
        assert r["ema_micro"] == round(r["value"] * 1_000_000)


def test_ema_plan_is_python_free(spark):
    from openeo_processes_dask_spark.diagnostics import plan_report
    from openeo_processes_dask_spark.training.anomaly import ema

    df = spark.createDataFrame(
        [("a", 1, 2.0)], "k string, t long, value double"
    )
    r = plan_report(ema(df, "value", ["t"], ["k"]))
    assert r.python_free


def test_ema_rejects_bad_alpha_and_negative_values(spark):
    import pytest

    from openeo_processes_dask_spark.training.anomaly import ema

    df = spark.createDataFrame([("a", 1, -2.0)], "k string, t long, value double")
    with pytest.raises(ValueError):
        ema(df, "value", ["t"], ["k"], alpha_num=0)
    with pytest.raises(ValueError):
        ema(df, "value", ["t"], ["k"], alpha_num=3, alpha_den=2)
    with pytest.raises(Exception, match="non-negative"):
        ema(df, "value", ["t"], ["k"]).collect()


def test_stream_ema_matches_batch(spark, tmp_path):
    """Single-batch drain of the online EMA must equal the batch fold
    row for row (both walk the same integer recurrence)."""
    import datetime as dt
    import random

    from openeo_processes_dask_spark.streaming.sessions import stream_ema
    from openeo_processes_dask_spark.training.anomaly import ema

    random.seed(11)
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), i % 3, round(random.uniform(0, 50), 2))
        for i in range(240)
    ]
    schema = "event_id bigint, t timestamp, k bigint, value double"
    df = spark.createDataFrame(rows, schema)
    d = str(tmp_path / "ema_src")
    df.orderBy("t").coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(schema).parquet(d)
    out = stream_ema(stream, alpha_num=3, alpha_den=7)
    q = (
        out.writeStream.format("memory")
        .queryName("ema_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["k"], r["event_id"]): r["ema_micro"]
        for r in spark.table("ema_test").collect()
    }
    exp = {
        (r["k"], r["event_id"]): r["ema_micro"]
        for r in ema(
            df, "value", ["t", "event_id"], ["k"], alpha_num=3, alpha_den=7
        ).collect()
    }
    assert got == exp and len(got) == 240


def test_stream_ema_state_carries_across_batches(spark, tmp_path):
    """Two sequential files -> two micro-batches: the second batch must
    continue from the first's EMA, not restart."""
    import datetime as dt

    from openeo_processes_dask_spark.streaming.sessions import stream_ema

    t0 = dt.datetime(2024, 1, 1)
    schema = "event_id bigint, t timestamp, k bigint, value double"
    d = str(tmp_path / "ema_src2")
    b1 = spark.createDataFrame([(1, t0, 0, 10.0)], schema)
    b1.coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.option("maxFilesPerTrigger", 1).schema(schema).parquet(d)
    out = stream_ema(stream, alpha_num=2, alpha_den=10)
    q = (
        out.writeStream.format("memory")
        .queryName("ema_test2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    b2 = spark.createDataFrame(
        [(2, t0 + dt.timedelta(minutes=1), 0, 20.0)], schema
    )
    b2.coalesce(1).write.mode("append").parquet(d)
    q2 = (
        stream_ema(
            spark.readStream.option("maxFilesPerTrigger", 1)
            .schema(schema)
            .parquet(d),
            alpha_num=2,
            alpha_den=10,
        )
        .writeStream.format("memory")
        .queryName("ema_test3")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got = {
        r["event_id"]: r["ema_micro"]
        for r in spark.table("ema_test3").collect()
    }
    # event 1: 10_000_000; event 2: (2*20e6 + 8*10e6) // 10 = 12_000_000
    assert got == {1: 10_000_000, 2: 12_000_000}


def test_autocorr_lag1_known_series(spark):
    import numpy as np

    from openeo_processes_dask_spark.training.anomaly import autocorr_lag1

    rows = [("alt", i, float((i % 2) * 10)) for i in range(20)]
    rows += [("lin", i, float(i)) for i in range(20)]
    rows += [("const", i, 5.0) for i in range(5)]
    rows += [("short", 0, 1.0)]  # no pairs at all
    df = spark.createDataFrame(rows, "k string, t long, value double")
    got = {
        r["k"]: (r["n_pairs"], r["corr"])
        for r in autocorr_lag1(df, "value", ["t"], ["k"]).collect()
    }
    assert got["alt"] == (19, -1.0)
    assert got["lin"] == (19, 1.0)
    assert got["const"][1] is None  # zero variance
    assert "short" not in got  # lag leaves zero pairs -> no row
    # noisy series vs numpy
    vals = [((i * 37 + 11) % 100) / 4.0 for i in range(50)]
    df2 = spark.createDataFrame(
        [("n", i, v) for i, v in enumerate(vals)],
        "k string, t long, value double",
    )
    r = autocorr_lag1(df2, "value", ["t"], ["k"]).collect()[0]
    x = np.array(vals)
    assert abs(r["corr"] - np.corrcoef(x[1:], x[:-1])[0, 1]) < 1e-6


def test_autocorr_partitioning_invariant(spark):
    from openeo_processes_dask_spark.training.anomaly import autocorr_lag1

    rows = [("k", i, ((i * 13 + 5) % 97) / 3.0) for i in range(200)]
    a = autocorr_lag1(
        spark.createDataFrame(rows, "k string, t long, value double")
        .repartition(11),
        "value", ["t"], ["k"],
    ).collect()
    b = autocorr_lag1(
        spark.createDataFrame(rows, "k string, t long, value double")
        .coalesce(1),
        "value", ["t"], ["k"],
    ).collect()
    assert a == b


def test_ema_and_autocorr_single_exchange_plans(spark):
    """Both per-key scans must stay ONE exchange (the key partition) —
    a second Exchange would mean an accidental extra shuffle."""
    from openeo_processes_dask_spark.training.anomaly import (
        autocorr_lag1,
        ema,
    )

    df = spark.createDataFrame(
        [("a", i, float(i % 7)) for i in range(50)],
        "k string, t long, value double",
    )
    for out in (
        ema(df, "value", ["t"], ["k"]),
        autocorr_lag1(df, "value", ["t"], ["k"]),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        # AQE repr can mention an exchange twice; count distinct plan ids
        # is overkill — assert the cheap invariant instead: no shuffle
        # beyond hashpartitioning on the key column
        import re

        parts = set(re.findall(r"hashpartitioning\(([a-zA-Z_0-9#, ]+)\)", plan))
        assert all(p.startswith("k#") for p in parts), parts

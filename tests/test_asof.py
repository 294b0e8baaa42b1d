"""functions/asof.py — the bucketed nearest-label merge that replaced
the resample family's label×label crossJoin (VERDICT r9 #1/#2).

Checks brute-force parity (including the tie-break contract), the edge
cases a bucketed scheme can get wrong (labels straddling bucket
boundaries, empty buckets between sparse clusters, one-sided inputs,
all-equal values), and that the produced plan contains neither a
CartesianProduct nor a BroadcastNestedLoopJoin.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_spark.functions.asof import nearest_label_map


def _mk(spark, vals, l_name, v_name):
    df = spark.createDataFrame(
        [(float(v),) for v in vals], "v double"
    )
    return df.select(
        F.col("v").alias(l_name), F.col("v").alias(v_name)
    ).distinct()


def _brute(lefts, rights):
    """{left: nearest right} with the helper's tie-break: min dist,
    then smaller right value."""
    out = {}
    for l in lefts:
        if not rights:
            continue
        out[l] = min(rights, key=lambda r: (abs(l - r), r))
    return out


def _run(spark, lefts, rights, n_buckets=16):
    m = nearest_label_map(
        _mk(spark, lefts, "__l__", "__lv__"),
        _mk(spark, rights, "__r__", "__rv__"),
        n_buckets=n_buckets,
    )
    return {r["__l__"]: r["__r__"] for r in m.collect()}


def test_matches_brute_force_dense_and_sparse(spark):
    lefts = [0.0, 1.5, 2.0, 7.7, 8.0, 50.0, 51.2, 99.0, 100.0]
    rights = [0.4, 2.0, 2.6, 49.0, 52.0, 100.0]
    assert _run(spark, lefts, rights) == _brute(lefts, rights)
    # sparse clusters with many empty buckets between them: the spine
    # prev/next fills must carry candidates across the gap
    lefts = [0.0, 1.0, 1000.0, 1001.0]
    rights = [2.0, 998.0]
    assert _run(spark, lefts, rights, n_buckets=64) == _brute(lefts, rights)


def test_tie_breaks_to_smaller_right(spark):
    # target 5 equidistant from 4 and 6 -> the smaller right wins,
    # matching the old min_by(struct(dist, label)) contract
    assert _run(spark, [5.0], [4.0, 6.0]) == {5.0: 4.0}


def test_boundary_labels_and_extremes(spark):
    # lefts outside the rights' range, and labels exactly on bucket
    # boundaries (lo, hi, and interior multiples of width)
    lefts = [float(i) for i in range(0, 33)]
    rights = [0.0, 8.0, 16.0, 24.0, 32.0]
    assert _run(spark, lefts, rights, n_buckets=8) == _brute(lefts, rights)


def test_empty_sides(spark):
    assert _run(spark, [], [1.0, 2.0]) == {}
    assert _run(spark, [1.0, 2.0], []) == {}


def test_all_equal_values(spark):
    # degenerate range (width clamps to 1.0): everything in bucket 0
    assert _run(spark, [3.0, 3.0], [3.0]) == {3.0: 3.0}


def test_random_parity_many_buckets(spark):
    import random

    rng = random.Random(421)
    lefts = sorted({round(rng.uniform(-50, 50), 3) for _ in range(120)})
    rights = sorted({round(rng.uniform(-60, 40), 3) for _ in range(80)})
    for nb in (4, 16, 128):
        assert _run(spark, lefts, rights, n_buckets=nb) == _brute(
            lefts, rights
        ), nb


def test_plan_has_no_bnlj_or_cartesian(spark):
    m = nearest_label_map(
        _mk(spark, [1.0, 2.0], "__l__", "__lv__"),
        _mk(spark, [1.5], "__r__", "__rv__"),
    )
    phys = m._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in phys, phys
    assert "CartesianProduct" not in phys, phys


def test_temporal_micros_distance_is_exact(spark):
    # long micros survive: two sources 1 us on either side of the target
    rows = [("2020-01-01 00:00:00.000001",), ("2019-12-31 23:59:59.999999",)]
    src = spark.createDataFrame(rows, ["t"]).select(
        F.col("t").cast("timestamp").alias("__r__"),
        F.unix_micros(F.col("t").cast("timestamp")).alias("__rv__"),
    )
    tgt = spark.createDataFrame([("2020-01-01 00:00:00",)], ["t"]).select(
        F.col("t").cast("timestamp").alias("__l__"),
        F.unix_micros(F.col("t").cast("timestamp")).alias("__lv__"),
    )
    got = nearest_label_map(tgt, src).collect()
    assert len(got) == 1
    # equidistant at 1 us -> tie-break to the smaller (earlier) source
    assert got[0]["__dist__"] == 1
    assert str(got[0]["__r__"]).startswith("2019-12-31 23:59:59.999999")


def test_outlier_robust_bucket_range(spark):
    """ADVICE r10: one far outlier must not stretch the bucket range
    until every real label shares one bucket. The bucket RANGE now comes
    from the [p0.1%, p99.9%] percentile span (outliers clamp into the
    edge buckets), and parity must hold regardless."""
    import random

    rng = random.Random(7)
    lefts = sorted(rng.uniform(0.0, 100.0) for _ in range(400))
    rights = sorted(rng.uniform(0.0, 100.0) for _ in range(300))
    # one label a million range-widths away on each side
    lefts.append(1e8)
    rights.append(-1e8)
    got = _run(spark, lefts, rights, n_buckets=None)
    assert got == _brute(lefts, rights)


def test_adaptive_buckets_default_path(spark):
    """n_buckets=None (the production path) sizes the spine from the
    probed cardinality and still matches brute force."""
    lefts = [float(i) * 1.7 for i in range(200)]
    rights = [float(i) * 2.3 + 0.5 for i in range(150)]
    assert _run(spark, lefts, rights, n_buckets=None) == _brute(lefts, rights)

"""Round-10 hardening pins (VERDICT r9 #4/#8): the AUC lane's NaN-score
guard and the dimension_labels driver bound."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_auc_nan_scores_excluded(spark):
    """A NaN score must be excluded like NULL (VERDICT r9 #4): NaN sorts
    above every real value in Spark, so an unguarded AUC silently counts
    NaN-scored rows as the top-ranked predictions. The AUC over clean
    rows + NaN/NULL junk must equal the AUC over the clean rows alone."""
    from openeo_processes_dask_spark.training.classifier import auc

    clean = [(0.1, 0), (0.2, 0), (0.6, 1), (0.8, 1), (0.4, 0), (0.5, 1)]
    df = spark.createDataFrame(clean, "s double, y int")
    base = auc(df, "s", "y").collect()[0]

    dirty = df.unionByName(
        spark.createDataFrame(
            [(float("nan"), 0), (float("nan"), 1), (None, 1)],
            "s double, y int",
        )
    )
    got = auc(dirty, "s", "y").collect()[0]
    assert got["n_pos"] == base["n_pos"] == 3
    assert got["n_neg"] == base["n_neg"] == 3
    assert got["u2"] == base["u2"]
    assert got["auc"] == base["auc"]
    # hand check: positives {.5,.6,.8} all above negatives except
    # (.4 neg < .5 pos ok; .4 > nothing) -> pairs won: 3*3 = 9 minus
    # the (.5 pos vs .4 neg ok) ... all 9 pairs have pos > neg -> AUC 1
    assert float(base["auc"]) == 1.0


def test_auc_nan_only_scores_degenerate_not_crash(spark):
    from openeo_processes_dask_spark.training.classifier import auc

    df = spark.createDataFrame(
        [(float("nan"), 0), (float("nan"), 1)], "s double, y int"
    )
    row = auc(df, "s", "y").collect()[0]
    assert row["n_pos"] == 0 and row["n_neg"] == 0
    assert row["auc"] is None


def test_dimension_labels_bounded(spark):
    """dimension_labels returns the full label relation by contract —
    above max_labels it must raise the sized IrregularAxisTooLarge
    message instead of setting up a driver flood (VERDICT r9 #8). The
    probe itself is bounded: limit(max+1).count() never scans past the
    cap."""
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.exceptions import IrregularAxisTooLarge
    from openeo_processes_dask_spark.operators.general import (
        dimension_labels,
    )

    df = spark.range(100).select(
        F.col("id").cast("timestamp").alias("t"),
        F.lit(0.0).alias("x"),
        F.lit(1.0).alias("value"),
    )
    cube = DataCube(df, dims=("t", "x"), value_col="value")

    labels = dimension_labels(cube, "t")
    assert labels.count() == 100  # default cap (1e6): fine

    with pytest.raises(IrregularAxisTooLarge, match="distinct"):
        dimension_labels(cube, "t", max_labels=50)
    # exactly at the cap: allowed
    assert dimension_labels(cube, "t", max_labels=100).count() == 100

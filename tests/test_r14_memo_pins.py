"""r14 optimization pins.

1. The memoized k-means assignment Column and the memoized Hamming
   band-explode expression must produce bit-identical results to the
   original functional constructions (the r13 expr-memo contract,
   extended to the two builders r14 memoized).
2. The ``load_table`` memo is METADATA-ONLY (VERDICT r13 #5): the
   memoized DataFrame carries no cache/checkpoint in its plan, and a
   touched mtime invalidates the entry — the door to silent cross-run
   result caching stays closed.
"""

import os
import shutil

import numpy as np
from pyspark.sql import functions as F

from openeo_processes_dask_spark.exprmemo import _MEMO, memoized_exprs
from openeo_processes_dask_spark.training.clustering import (
    _assign_expr,
    _snap_micro,
)
from openeo_processes_dask_spark.training.dedup import (
    _hamming_band_explode,
    banded_hamming_incremental,
)

CENTS = [
    [1.5, -2.0, 0.25],
    [0.0, 0.0, 0.0],
    [-3.75, 1.125, 2.5],
]

VECS = [
    (0, [1.4, -2.1, 0.3]),
    (1, [0.1, 0.0, -0.05]),
    (2, [-3.7, 1.2, 2.4]),
    (3, [100.0, -50.0, 25.0]),
]


def test_assign_expr_memo_identity_and_equality(spark):
    df = spark.createDataFrame(VECS, "vec_id long, embedding array<double>")
    snapped = _snap_micro(F.col("embedding"))
    memo1 = _assign_expr(snapped, CENTS, memo_key="snap::embedding")
    memo2 = _assign_expr(snapped, CENTS, memo_key="snap::embedding")
    assert memo1 is memo2  # memo hit: one immutable unresolved tree
    fresh = _assign_expr(snapped, CENTS)  # functional, unmemoized
    got = {r["vec_id"]: r["c"] for r in df.select(
        "vec_id", memo1.alias("c")).collect()}
    exp = {r["vec_id"]: r["c"] for r in df.select(
        "vec_id", fresh.alias("c")).collect()}
    assert got == exp
    # different centroids -> different entry
    other = _assign_expr(snapped, [[9.0, 9.0, 9.0]] + CENTS[1:],
                         memo_key="snap::embedding")
    assert other is not memo1


def test_hamming_band_explode_matches_functional(spark):
    rows = [(0, 0x0123456789ABCDEF), (1, -1), (2, 0), (3, 42)]
    df = spark.createDataFrame(rows, "id long, sig long")
    bands, band_bits = 8, 8
    mask = (1 << band_bits) - 1
    got = sorted(
        (r["id"], r["bb"]["band"], r["bb"]["chunk"])
        for r in df.select(
            "id",
            _hamming_band_explode("sig", bands, band_bits).alias("bb"),
        ).collect()
    )
    exp_rows = df.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright(F.col("sig"), bi * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    )
    exp = sorted(
        (r["id"], r["bb"]["band"], r["bb"]["chunk"])
        for r in exp_rows.collect()
    )
    assert got == exp
    # memo hit
    assert _hamming_band_explode("sig", 8, 8) is _hamming_band_explode(
        "sig", 8, 8
    )


def test_banded_hamming_incremental_end_to_end(spark):
    new = spark.createDataFrame(
        [(10, 0b1011), (11, -(1 << 63))], "id long, sig long"
    )
    seen = spark.createDataFrame(
        [(1, 0b1010), (2, 0b1011), (3, -1)], "id long, sig long"
    )
    got = sorted(
        (r["new_id"], r["seen_id"], r["hamming"])
        for r in banded_hamming_incremental(
            new, seen, max_hamming=3, bands=8
        ).collect()
    )
    # (11, 1): 0x8000...0 vs 0b1010 differ in exactly 3 bits and share
    # six all-zero bands — a real <=3 match, not an artifact
    assert got == [(10, 1, 1), (10, 2, 0), (11, 1, 3)]


def test_load_table_memo_is_metadata_only(spark, tmp_path):
    from openeo_processes_dask_spark.sources.load import (
        _TABLE_MEMO,
        load_table,
    )

    sf_dir = str(tmp_path)
    spark.range(0, 10).toDF("x").write.parquet(f"{sf_dir}/t.parquet")
    df1 = load_table(spark, sf_dir, "t")
    df2 = load_table(spark, sf_dir, "t")
    assert df1 is df2  # memo hit on unchanged (session, path, mtime)
    # METADATA-ONLY: the memoized plan contains no cached or
    # checkpointed relation — every action scans parquet
    plan = df1._jdf.queryExecution().optimizedPlan().toString()
    for marker in ("InMemoryRelation", "LogicalRDD", "Checkpoint"):
        assert marker not in plan, plan
    assert "Relation" in plan and "parquet" in plan
    assert not df1.isStreaming
    assert df1.storageLevel.useMemory is False
    assert df1.storageLevel.useDisk is False
    # mtime invalidation: rewriting the table yields a FRESH DataFrame
    # reflecting the new data
    assert df1.count() == 10
    shutil.rmtree(f"{sf_dir}/t.parquet")
    spark.range(0, 7).toDF("x").write.parquet(f"{sf_dir}/t.parquet")
    os.utime(
        f"{sf_dir}/t.parquet",
        ns=(os.stat(f"{sf_dir}/t.parquet").st_mtime_ns + 1_000_000,) * 2,
    )
    df3 = load_table(spark, sf_dir, "t")
    assert df3 is not df1
    assert df3.count() == 7
    # and the memo key carries the applicationId, not a bare path
    assert all(k[0] is not None for k in _TABLE_MEMO)


def test_exprmemo_cap_clears(spark):
    before = dict(_MEMO)
    try:
        for i in range(300):
            memoized_exprs(("__cap_probe__", i), lambda: i)
        assert len(_MEMO) <= 260  # cap bounds growth (clear-at-256)
    finally:
        _MEMO.clear()
        _MEMO.update(
            {k: v for k, v in before.items() if k[1] != "__cap_probe__"}
        )

"""Stateless streaming decontamination screen: drained (id, shk) rows
aggregated per id equal batch decontaminate bit-for-bit, the shared
benchmark_digests builder feeds both lanes, and short/clean docs emit
nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from openeo_processes_dask_spark.training.dedup import (
    benchmark_digests,
    decontaminate,
    stream_contamination_screen,
)

_BENCH = [
    (100, "the quick brown fox jumps over the lazy dog"),
    (101, "pack my box with five dozen liquor jugs today"),
]
_TRAIN = [
    # shares the full 9-token bench run -> many offending 5-grams
    (1, "intro words the quick brown fox jumps over the lazy dog outro"),
    # shares exactly one 5-gram window
    (2, "pack my box with five unrelated trailing words here"),
    # clean
    (3, "completely unrelated text with no overlap whatsoever at all"),
    # shorter than n tokens
    (4, "tiny doc"),
    (5, ""),
]


def test_stream_contamination_equals_batch(spark, tmp_path):
    bench = spark.createDataFrame(_BENCH, ["doc_id", "text"])
    train = spark.createDataFrame(_TRAIN, ["doc_id", "text"])
    keys = benchmark_digests(bench, "text", n=5)
    batch = sorted(
        (r["id"], r["n_shared"])
        for r in decontaminate(train, bench, n=5).collect()
    )
    assert batch and batch[0][0] == 1  # doc 1 is contaminated
    d = str(tmp_path / "contam_stream")
    train.where("doc_id % 2 = 0").coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    train.where("doc_id % 2 = 1").coalesce(1).write.mode(
        "append"
    ).parquet(d)
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema("doc_id bigint, text string")
        .parquet(d)
    )
    out = stream_contamination_screen(stream, keys, n=5)
    q = (
        out.writeStream.format("memory")
        .queryName("t_contam_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    drained = spark.table("t_contam_stream")
    # per-row digests are distinct -> landed rows unique per (id, shk)
    assert drained.count() == drained.distinct().count()
    agg = sorted(
        (r["id"], r["n"])
        for r in drained.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert agg == batch
    # clean / short / empty docs emitted nothing
    landed_ids = {r["id"] for r in drained.select("id").collect()}
    assert landed_ids.isdisjoint({3, 4, 5})


def test_benchmark_digests_distinct(spark):
    bench = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")], ["doc_id", "text"]
    )
    keys = benchmark_digests(bench, "text", n=5)
    # identical docs collapse: digests are corpus-distinct
    assert keys.count() == keys.distinct().count() == 2

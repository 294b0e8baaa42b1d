"""training/bloom.py — broadcast Bloom prefilter for anti-join dedup."""

from pyspark.sql import functions as F

from openeo_processes_dask_spark.training.bloom import (
    bloom_build,
    bloom_might_contain,
    dedup_against_bloom,
)


def test_bloom_no_false_negatives(spark):
    seen = spark.createDataFrame(
        [(f"doc-{i}",) for i in range(300)], ["key"]
    )
    bitmap = bloom_build(seen, ["key"], m_bits=1 << 12, k=3)
    hits = (
        seen.where(bloom_might_contain(["key"], bitmap, 1 << 12, 3))
        .count()
    )
    assert hits == 300  # every inserted key must test positive


def test_bloom_rejects_most_unseen(spark):
    seen = spark.createDataFrame(
        [(f"doc-{i}",) for i in range(300)], ["key"]
    )
    bitmap = bloom_build(seen, ["key"], m_bits=1 << 13, k=3)
    probe = spark.createDataFrame(
        [(f"other-{i}",) for i in range(1000)], ["key"]
    )
    fp = probe.where(
        bloom_might_contain(["key"], bitmap, 1 << 13, 3)
    ).count()
    # 300 keys x 3 bits in 8192 -> fill ~11%; fp rate ~ 0.11^3 ~ 0.13%
    assert fp < 50


def test_dedup_against_bloom_equals_plain_anti_join(spark):
    new = spark.createDataFrame(
        [(i, f"text-{i % 40}") for i in range(200)], ["doc_id", "fp"]
    )
    seen = spark.createDataFrame(
        [(1000 + j, f"text-{j}") for j in range(0, 40, 2)],
        ["doc_id", "fp"],
    )
    got = {
        r["doc_id"]
        for r in dedup_against_bloom(new, seen, ["fp"], m_bits=1 << 10).collect()
    }
    exp = {
        r["doc_id"]
        for r in new.join(
            seen.select("fp").distinct(), "fp", "left_anti"
        ).collect()
    }
    assert got == exp
    assert got == {i for i in range(200) if (i % 40) % 2 == 1}


def test_bloom_plan_is_codegen_only(spark):
    from openeo_processes_dask_spark.diagnostics import plan_report

    seen = spark.createDataFrame([("a",), ("b",)], ["key"])
    bitmap = bloom_build(seen, ["key"], m_bits=256, k=2)
    probe = spark.createDataFrame([("a",), ("z",)], ["key"])
    flt = probe.where(bloom_might_contain(["key"], bitmap, 256, 2))
    r = plan_report(flt)
    assert r.python_free and r.exchanges == 0

"""Round-9 additions: exactly-k weighted sampling (A-ES), batched exact
cosine top-k, and the ANN recall@k evaluation harness."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_spark.training.sampling import (
    sample_weighted_fixed,
)
from openeo_processes_dask_spark.training.similarity import (
    ann_recall,
    cosine_topk,
    cosine_topk_batch,
    lsh_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, ["en", "de", "fr"][i % 3], (i * 37) % 900 + 5) for i in range(600)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, w long")


@pytest.fixture(scope="module")
def vecs(spark):
    # deterministic 8-dim vectors, no zero vector
    rows = [
        (i, [math.sin(0.1 * i * (d + 1)) + 0.01 for d in range(8)])
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


# ------------------------------------------------- sample_weighted_fixed


def test_weighted_fixed_exact_k_per_group(docs):
    out = sample_weighted_fixed(docs, 15, "w", ["lang"], seed=3)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 15, "de": 15, "fr": 15}


def test_weighted_fixed_deterministic_and_seeded(docs):
    a = sorted(r.doc_id for r in
               sample_weighted_fixed(docs, 15, "w", ["lang"], seed=3)
               .collect())
    b = sorted(r.doc_id for r in
               sample_weighted_fixed(docs, 15, "w", ["lang"], seed=3)
               .repartition(7).collect())
    assert a == b  # pure function of (seed, id, weight)
    c = sorted(r.doc_id for r in
               sample_weighted_fixed(docs, 15, "w", ["lang"], seed=4)
               .collect())
    assert a != c


def test_weighted_fixed_bias_toward_heavy_rows(spark):
    # 500 light rows (w=1) + 20 heavy rows (w=1000): a 20-row A-ES draw
    # must be dominated by heavy rows (each heavy row's key beats a light
    # row's with prob ~1000/1001)
    rows = [(i, 1) for i in range(500)] + [(1000 + i, 1000) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    picked = {r.doc_id for r in
              sample_weighted_fixed(df, 20, "w", seed=11).collect()}
    assert len(picked) == 20
    assert sum(1 for d in picked if d >= 1000) >= 15


def test_weighted_fixed_nonpositive_weights_lose(spark):
    # zero/negative weights clamp to ~0: ln(u)/1e-12 is hugely negative,
    # so they are never selected ahead of ANY positive-weight row
    rows = [(i, 5) for i in range(10)] + [(100 + i, 0) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    picked = {r.doc_id for r in
              sample_weighted_fixed(df, 10, "w", seed=2).collect()}
    assert picked == set(range(10))


def test_weighted_fixed_grouped_plan_shape(docs):
    """The grouped path must compile to WindowGroupLimit (map-side per-
    group top-k before the single exchange) — the 100 TB contract."""
    plan = (
        sample_weighted_fixed(docs, 15, "w", ["lang"], seed=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange") == 1


# --------------------------------------------------- cosine_topk_batch


def test_batch_topk_matches_per_query(vecs):
    queries = vecs.where(F.col("vec_id").isin(0, 7, 13)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = cosine_topk_batch(vecs, queries, k=6)
    by_q = {
        qid: [(r["vec_id"], r["cosine"]) for r in
              sorted(rows, key=lambda r: (-r["cosine"], r["vec_id"]))]
        for qid, rows in (
            (qid, [r for r in got.collect() if r["query_id"] == qid])
            for qid in (0, 7, 13)
        )
    }
    for qid in (0, 7, 13):
        qvec = [float(v) for v in
                vecs.where(F.col("vec_id") == qid).first()["embedding"]]
        single = [(r["vec_id"], r["cosine"]) for r in
                  cosine_topk(vecs, qvec, k=6).collect()]
        assert by_q[qid] == single, qid


def test_batch_topk_plan_no_cartesian(vecs):
    queries = vecs.limit(3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    plan = (
        cosine_topk_batch(vecs, queries, k=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan


def test_batch_topk_exact_k_rows(vecs):
    queries = vecs.where(F.col("vec_id").isin(1, 2)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = cosine_topk_batch(vecs, queries, k=9)
    counts = {r["query_id"]: r["n"] for r in
              out.groupBy("query_id").agg(F.count("*").alias("n")).collect()}
    assert counts == {1: 9, 2: 9}


# ---------------------------------------------------------- ann_recall


def test_ann_recall_exact_method_is_one(vecs):
    query = [float(v) for v in
             vecs.where(F.col("vec_id") == 0).first()["embedding"]]
    out = ann_recall(
        vecs,
        query,
        {
            "brute": lambda d, q, k: cosine_topk(d, q, k),
            "empty": lambda d, q, k: cosine_topk(
                d.where(F.col("vec_id") < 0), q, k
            ),
        },
        k=8,
    ).collect()
    got = {r["method"]: (r["hits"], r["recall"]) for r in out}
    assert got["brute"] == (8, 1.0)
    assert got["empty"] == (0, 0.0)
    # rows come back in sorted method order
    assert [r["method"] for r in out] == ["brute", "empty"]


# ---------------------------------------------------- temperature_weights


def test_temperature_weights_limits(spark):
    from openeo_processes_dask_spark.training.sampling import (
        temperature_weights,
    )

    rows = (
        [(i, "big", 90) for i in range(90)]
        + [(100 + i, "small", 10) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    # alpha=1: natural token proportions (big has 8100 of 8200... compute)
    w1 = {r["source"]: r["weight"] for r in
          temperature_weights(df, 1.0).collect()}
    tot = 90 * 90 + 10 * 10
    assert abs(w1["big"] - 8100 / tot) < 1e-6
    assert abs(sum(w1.values()) - 1.0) < 1e-5
    # alpha=0: uniform regardless of size
    w0 = {r["source"]: r["weight"] for r in
          temperature_weights(df, 0.0).collect()}
    assert w0 == {"big": 0.5, "small": 0.5}
    # 0<alpha<1: tail upweighted vs natural, head still heavier
    wh = {r["source"]: r["weight"] for r in
          temperature_weights(df, 0.5).collect()}
    assert wh["small"] > w1["small"] and wh["big"] > wh["small"]


# ------------------------------------------------- ivf index + batch search


def test_ivf_index_search_matches_inline_ivf_topk(vecs):
    from openeo_processes_dask_spark.training.similarity import (
        ivf_index,
        ivf_search_batch,
        ivf_topk,
    )

    cents, assigned = ivf_index(vecs, n_centroids=8)
    queries = vecs.where(F.col("vec_id").isin(0, 5)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = ivf_search_batch(assigned, cents, queries, k=6, nprobe=3)
    for qid in (0, 5):
        batch_rows = sorted(
            (r["vec_id"], r["cosine"])
            for r in got.collect()
            if r["query_id"] == qid
        )
        qvec = [float(v) for v in
                vecs.where(F.col("vec_id") == qid).first()["embedding"]]
        inline = sorted(
            (r["vec_id"], r["cosine"])
            for r in ivf_topk(
                vecs, qvec, k=6, n_centroids=8, nprobe=3
            ).collect()
        )
        assert batch_rows == inline, qid


def test_ivf_index_search_plan_shape(vecs):
    from openeo_processes_dask_spark.training.similarity import (
        ivf_index,
        ivf_search_batch,
    )

    cents, assigned = ivf_index(vecs, n_centroids=8)
    queries = vecs.limit(2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    plan = (
        ivf_search_batch(assigned, cents, queries, k=4, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan


def test_dedup_pair_recall_counts(spark):
    from openeo_processes_dask_spark.training.dedup import dedup_pair_recall

    exact = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "id1 long, id2 long"
    )
    approx = spark.createDataFrame(
        [(1, 2), (3, 4), (7, 8), (9, 10)], "id1 long, id2 long"
    )
    row = dedup_pair_recall(exact, approx).first()
    assert (row["true_pairs"], row["cand_pairs"], row["hits"]) == (3, 4, 2)
    assert row["recall"] == round(2 / 3, 6)
    assert row["precision"] == 0.5
    plan = (
        dedup_pair_recall(exact, approx)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_dedup_pair_recall_empty_sides_null_ratios(spark):
    from openeo_processes_dask_spark.training.dedup import dedup_pair_recall

    empty = spark.createDataFrame([], "id1 long, id2 long")
    some = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
    row = dedup_pair_recall(empty, some).first()
    assert row["true_pairs"] == 0 and row["recall"] is None
    assert row["precision"] == 0.0
    row = dedup_pair_recall(some, empty).first()
    assert row["cand_pairs"] == 0 and row["precision"] is None
    assert row["recall"] == 0.0


def test_ann_recall_lsh_between_zero_and_one(vecs):
    query = [float(v) for v in
             vecs.where(F.col("vec_id") == 0).first()["embedding"]]
    out = ann_recall(
        vecs,
        query,
        {"lsh4": lambda d, q, k: lsh_topk(d, q, k, n_planes=4)},
        k=8,
    ).first()
    assert 0.0 <= out["recall"] <= 1.0
    assert out["hits"] == round(out["recall"] * 8)

"""training.sampling: deterministic sampling / capping / packing tests."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_spark.training.sampling import (
    assign_shards,
    cap_per_group,
    pack_greedy_first_fit,
    pack_tokens_contiguous,
    sample_stratified,
    sample_uniform,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "fr"][i % 3], (i * 37) % 900 + 5) for i in range(600)]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")


def test_sample_uniform_deterministic_and_calibrated(docs):
    a = sorted(r.doc_id for r in sample_uniform(docs, 0.3, seed=7).collect())
    b = sorted(r.doc_id for r in sample_uniform(docs, 0.3, seed=7).collect())
    assert a == b  # partitioning-independent determinism
    assert 0.2 < len(a) / 600 < 0.4  # calibrated rate
    c = sorted(r.doc_id for r in sample_uniform(docs, 0.3, seed=8).collect())
    assert a != c  # seed actually matters
    # monotone: a smaller fraction is a subset of a larger one (same seed)
    small = set(r.doc_id for r in sample_uniform(docs, 0.1, seed=7).collect())
    assert small <= set(a)


def test_sample_stratified_rates(docs):
    out = sample_stratified(
        docs, {"en": 1.0, "de": 0.0}, "lang", seed=7, default=0.5
    ).groupBy("lang").count().collect()
    got = {r["lang"]: r["count"] for r in out}
    assert got["en"] == 200 and "de" not in got
    assert 60 < got["fr"] < 140


def test_cap_per_group_topk(docs):
    out = cap_per_group(
        docs, ["lang"], 5, [F.col("n_tokens").desc(), F.col("doc_id")]
    ).toPandas()
    assert (out.groupby("lang").size() == 5).all()
    want = (
        docs.toPandas()
        .sort_values(["n_tokens", "doc_id"], ascending=[False, True])
        .groupby("lang")
        .head(5)
    )
    assert set(map(tuple, out[["lang", "doc_id"]].values)) == set(
        map(tuple, want[["lang", "doc_id"]].values)
    )


def test_assign_shards_stable_and_spread(docs):
    out = assign_shards(docs, 8, seed=3).toPandas()
    assert out["shard"].between(0, 7).all()
    assert out["shard"].nunique() == 8
    again = assign_shards(docs.repartition(13), 8, seed=3).toPandas()
    merged = out.merge(again, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["shard_a"] == merged["shard_b"]).all()


def test_pack_contiguous_invariants(docs):
    budget = 1000
    sharded = assign_shards(docs, 4, seed=3)
    out = pack_tokens_contiguous(
        sharded, budget, "n_tokens", shard_col="shard"
    ).toPandas()
    src = sharded.toPandas()
    # every token of every doc is placed exactly once
    per_doc = out.groupby("doc_id")["seg_tokens"].sum()
    for _, r in src.iterrows():
        assert per_doc[r["doc_id"]] == r["n_tokens"]
    # no segment exceeds budget; all but the last per shard are exactly full
    seg = out.groupby(["shard", "segment"])["seg_tokens"].sum().reset_index()
    assert (seg["seg_tokens"] <= budget).all()
    last = seg.groupby("shard")["segment"].max().reset_index()
    full = seg.merge(last, on=["shard", "segment"], how="left", indicator=True)
    assert (
        full[full["_merge"] == "left_only"]["seg_tokens"] == budget
    ).all()
    # a doc spans at most ceil(n/budget)+1 segments
    spans = out.groupby("doc_id").size()
    limits = src.set_index("doc_id")["n_tokens"] // budget + 2
    assert (spans <= limits[spans.index]).all()


def test_pack_greedy_first_fit(docs):
    budget = 1000
    sharded = assign_shards(docs, 4, seed=3)
    out = pack_greedy_first_fit(
        sharded, budget, "n_tokens", shard_col="shard"
    ).toPandas()
    src = sharded.toPandas()
    assert len(out) == len(src)  # no doc dropped or split
    # bin totals within budget (no oversized docs in this fixture)
    totals = out.groupby(["shard", "bin"])["n_tokens"].sum()
    assert (totals <= budget).all()
    # matches a sequential python first-fit per shard
    for shard, g in src.sort_values("doc_id").groupby("shard"):
        free, want = [], {}
        for _, r in g.iterrows():
            n = r["n_tokens"]
            for i, room in enumerate(free):
                if n <= room:
                    free[i] = room - n
                    want[r["doc_id"]] = i
                    break
            else:
                free.append(budget - n)
                want[r["doc_id"]] = len(free) - 1
        got = out[out["shard"] == shard].set_index("doc_id")["bin"].to_dict()
        assert got == want


def test_split_assign(docs):
    from openeo_processes_dask_spark.training.sampling import split_assign

    out = split_assign(docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=5)
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}  # no NULL leftover
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert sum(counts.values()) == 600
    # deterministic: same assignment on re-run and under repartitioning
    again = split_assign(docs.repartition(7), {"train": 0.8, "val": 0.1, "test": 0.1}, seed=5)
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"] for r in again.collect()}
    assert a == b
    # partial weights hold out the remainder as NULL
    held = split_assign(docs, {"train": 0.5}, seed=5)
    n_null = held.where(F.col("split").isNull()).count()
    assert 0 < n_null < 600


def test_logreg_matches_numpy_exactly(spark):
    """Distributed integer-micro GD must produce BIT-IDENTICAL weights to
    a sequential NumPy replay, independent of input partitioning — the
    property the DuckDB oracle twin relies on."""
    import hashlib
    import math

    import numpy as np

    from openeo_processes_dask_spark.training.classifier import (
        fit_logreg,
        hashed_features,
        predict_logreg,
    )

    dim, iters, lr = 16, 3, 1.0
    texts = [
        (i, ("good quality prose with many words " * 3) if i % 2 == 0
         else ("spam spam buy now click " * 4), float(1 - i % 2))
        for i in range(40)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in texts], "id bigint, text string"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in texts], "id bigint, y double"
    )
    feats = hashed_features(docs, "id", "text", dim=dim)
    w1 = fit_logreg(feats, labels, dim, iterations=iters, lr=lr)
    w2 = fit_logreg(
        feats.repartition(13), labels.repartition(7), dim,
        iterations=iters, lr=lr,
    )
    assert w1 == w2  # partitioning-independent integers

    # sequential NumPy replay with the same md5 buckets + integer math
    def md5long(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    cnts = {}
    ys = {}
    for i, t, y in texts:
        ys[i] = y
        for tok in t.lower().split():
            b = md5long(tok) % dim
            cnts.setdefault(i, {}).setdefault(b, 0)
            cnts[i][b] += 1
    n = len(texts)
    w = [0] * (dim + 1)
    for _ in range(iters):
        g = [0] * (dim + 1)
        for i in cnts:
            s = w[0] + sum(c * w[1 + b] for b, c in cnts[i].items())
            p = 1.0 / (1.0 + math.exp(-s / 1e6))
            d = (p - ys[i]) * 1e6
            gd = int(math.floor(abs(d) + 0.5) * (1 if d >= 0 else -1))
            g[0] += gd
            for b, c in cnts[i].items():
                g[1 + b] += gd * c
        def upd(wi, gi):
            d = lr * gi / n
            return wi - int(math.floor(abs(d) + 0.5) * (1 if d >= 0 else -1))
        w = [upd(w[j], g[j]) for j in range(dim + 1)]
    assert w1 == w

    # and the classifier actually separates the two classes
    pred = {r["id"]: r["score"] for r in
            predict_logreg(feats, w1, dim).collect()}
    good = np.mean([pred[i] for i, _, y in texts if y == 1.0])
    bad = np.mean([pred[i] for i, _, y in texts if y == 0.0])
    assert good > 0.9 and bad < 0.1


def test_subsequence_topk_finds_planted_pattern(spark):
    """The planted spike window must rank first with distance ~0; a
    constant series (sd=0) must not crash and sits at z=0 distance from
    nothing in particular."""
    import numpy as np

    from openeo_processes_dask_spark.training.tsearch import subsequence_topk

    pattern = [1.0, 5.0, 1.0, 5.0, 1.0]
    rows = []
    rng = np.random.default_rng(0)
    for key in ("a", "b"):
        vals = list(rng.uniform(10, 20, size=40))
        if key == "b":
            # plant a scaled+shifted copy of the pattern (z-norm invariant)
            vals[17:22] = [100 + 7 * v for v in pattern]
        for i, v in enumerate(vals):
            rows.append((key, i, float(v)))
    rows += [("c", i, 3.0) for i in range(10)]  # constant series, sd=0
    df = spark.createDataFrame(rows, "k string, i bigint, value double")
    out = subsequence_topk(
        df, pattern, key_cols=["k"], time_col="i", value_col="value", k=3
    ).collect()
    assert out[0]["k"] == "b" and out[0]["t"] == 17
    assert out[0]["dist"] < 1e-6


def test_mix_corpus_hits_budget_shares(spark):
    from pyspark.sql import functions as F

    from openeo_processes_dask_spark.training.sampling import mix_corpus

    df = spark.createDataFrame(
        [(i, "web" if i < 8000 else "wiki", 100) for i in range(10_000)],
        ["doc_id", "source", "n_chars"],
    )
    # web has 800k tokens, wiki 200k; budget 100k split 50/50
    out = mix_corpus(
        df, {"web": 0.5, "wiki": 0.5}, 100_000,
        group_col="source", token_col="n_chars",
    )
    got = {
        r["source"]: r["tok"]
        for r in out.groupBy("source").agg(F.sum("n_chars").alias("tok")).collect()
    }
    # Bernoulli: expect ~50k tokens per group, tolerate 20%
    assert abs(got["web"] - 50_000) < 10_000
    assert abs(got["wiki"] - 50_000) < 10_000
    # unlisted groups are dropped
    df2 = df.withColumn(
        "source", F.when(F.col("doc_id") % 2 == 0, "junk").otherwise("web")
    )
    out2 = mix_corpus(df2, {"web": 1.0}, 10_000)
    assert out2.where(F.col("source") == "junk").count() == 0
    # determinism: same seed -> identical row set
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in mix_corpus(
        df, {"web": 0.5, "wiki": 0.5}, 100_000).collect())
    assert a == b


def test_top_quality_fraction_grouped_and_global(spark):
    import pytest

    from openeo_processes_dask_spark.training.sampling import (
        top_quality_fraction,
    )

    rows = [
        # group a: scores 4,3,2,1 -> top 50% keeps ids 1,2
        (1, "a", 4.0), (2, "a", 3.0), (3, "a", 2.0), (4, "a", 1.0),
        # group b: 3 rows -> ceil(1.5)=2 kept; tie on 5.0 -> lower id
        (5, "b", 5.0), (6, "b", 5.0), (7, "b", 0.0),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "score"])
    got = sorted(
        r["doc_id"]
        for r in top_quality_fraction(
            df, "score", 0.5, group_col="source"
        ).collect()
    )
    assert got == [1, 2, 5, 6]
    # ungrouped: top 50% of all 7 -> ceil(3.5)=4 rows
    got_all = sorted(
        r["doc_id"]
        for r in top_quality_fraction(df, "score", 0.5).collect()
    )
    assert got_all == [1, 2, 5, 6]
    with pytest.raises(ValueError):
        top_quality_fraction(df, "score", 1.5)


def test_top_quality_fraction_edge_fractions(spark):
    from openeo_processes_dask_spark.training.sampling import (
        top_quality_fraction,
    )

    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], ["doc_id", "score"]
    )
    assert top_quality_fraction(df, "score", 0.0).count() == 0
    assert top_quality_fraction(df, "score", 1.0).count() == 2


# --- hash_negatives -----------------------------------------------------

def test_hash_negatives_excludes_pos_and_query_and_is_deterministic(spark):
    from openeo_processes_dask_spark.training.sampling import hash_negatives

    pool = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "query_id long, pos_id long"
    )
    out = hash_negatives(pairs, pool, k=3, pool_mod=2, seed=7)
    rows = out.collect()
    # every pair gets exactly k negatives; none equal pos or query
    by_pair = {}
    for r in rows:
        by_pair.setdefault((r["query_id"], r["pos_id"]), []).append(r)
    assert set(by_pair) == {(1, 2), (3, 4), (5, 6)}
    for (q, p), rs in by_pair.items():
        assert sorted(x["neg_rank"] for x in rs) == [1, 2, 3]
        assert all(x["neg_id"] not in (q, p) for x in rs)
    # determinism under repartitioning
    out2 = hash_negatives(pairs.repartition(5), pool.repartition(7), k=3,
                          pool_mod=2, seed=7)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, out2.collect()))
    # a different seed picks different negatives
    out3 = hash_negatives(pairs, pool, k=3, pool_mod=2, seed=8)
    assert sorted(map(tuple, rows)) != sorted(map(tuple, out3.collect()))


def test_hash_negatives_plan_broadcasts_candidates(spark):
    from openeo_processes_dask_spark.diagnostics import plan_report
    from openeo_processes_dask_spark.training.sampling import hash_negatives

    pool = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2)], "query_id long, pos_id long")
    r = plan_report(hash_negatives(pairs, pool, k=2, pool_mod=1))
    assert "BroadcastNestedLoopJoin" in r.text or "BroadcastHashJoin" in r.text


def test_hash_negatives_validates(spark):
    import pytest

    from openeo_processes_dask_spark.training.sampling import hash_negatives

    pool = spark.createDataFrame([(1,)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2)], "query_id long, pos_id long")
    with pytest.raises(ValueError):
        hash_negatives(pairs, pool, k=0)
    with pytest.raises(ValueError):
        hash_negatives(pairs, pool, pool_mod=0)


def test_leakage_safe_split_components_share_folds(spark):
    from openeo_processes_dask_spark.training.sampling import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    # two chains and one isolated pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], "id1 long, id2 long"
    )
    out = {r["doc_id"]: (r["comp_id"], r["fold"])
           for r in leakage_safe_split(docs, pairs, n_folds=4).collect()}
    assert len(out) == 40  # every doc assigned, incl. singletons
    assert out[1] == out[2] == out[3] == out[4]
    assert out[10] == out[11] and out[20] == out[21]
    assert out[1][0] == 1 and out[10][0] == 10  # canonical min id
    assert all(0 <= f < 4 for _, f in out.values())
    # seeds move folds; components still stay together
    out2 = {r["doc_id"]: r["fold"]
            for r in leakage_safe_split(docs, pairs, n_folds=4, seed=9).collect()}
    assert out2[1] == out2[4]
    assert any(out[i][1] != out2[i] for i in out)


def test_leakage_safe_split_validates(spark):
    import pytest

    from openeo_processes_dask_spark.training.sampling import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame([(1,)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
    with pytest.raises(ValueError):
        leakage_safe_split(docs, pairs, n_folds=1)


def test_quality_buckets_ccnet_terciles(spark):
    import pytest

    from openeo_processes_dask_spark.training.sampling import (
        quality_buckets,
    )

    # lang en: 7 rows with scores (ties on 5) -> ntile(3) sizes 3/2/2
    rows = [
        (1, "en", 10), (2, "en", 5), (3, "en", 5), (4, "en", 20),
        (5, "en", 1), (6, "en", 5), (7, "en", 30),
        (8, "de", 2), (9, "de", 9),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "score"])
    out = {
        r["doc_id"]: (r["bucket"], r["bucket_label"])
        for r in quality_buckets(
            df, "score", n_buckets=3, group_col="lang",
            labels=["head", "middle", "tail"],
        ).collect()
    }
    # order by (score, id): 5,2,3,6,1,4,7 -> buckets 3/2/2
    assert [out[i][0] for i in (5, 2, 3, 6, 1, 4, 7)] == [
        1, 1, 1, 2, 2, 3, 3
    ]
    assert out[5][1] == "head" and out[7][1] == "tail"
    # per-group: de ranks independently
    assert out[8][0] == 1 and out[9][0] == 2
    # descending: higher score = better = head
    desc = {
        r["doc_id"]: r["bucket"]
        for r in quality_buckets(
            df, "score", n_buckets=3, group_col="lang",
            ascending=False,
        ).collect()
    }
    assert desc[7] == 1 and desc[5] == 3

    with pytest.raises(ValueError):
        quality_buckets(df, "score", n_buckets=0)
    with pytest.raises(ValueError):
        quality_buckets(df, "score", n_buckets=3, labels=["a"])
    with pytest.raises(ValueError):
        quality_buckets(df, "nope")


def test_mixture_plan_exact(spark):
    import pytest

    from openeo_processes_dask_spark.training.sampling import mixture_plan

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "books"),      # 4 tokens
            (2, "e f", "books"),          # books total 6
            (3, "g h i j k l m n", "web"),  # web 8
            (4, "", "empty_src"),         # 0 tokens
        ],
        ["doc_id", "text", "source"],
    )
    out = {
        r["domain"]: (r["n_tokens"], r["target_tokens"], r["epochs"],
                      r["rate_ppm"])
        for r in mixture_plan(
            docs, {"books": 0.5, "web": 0.25, "empty_src": 0.1},
            token_budget=100,
        ).collect()
    }
    # books: target 50 over 6 tokens -> ceil(50/6)=9 epochs,
    # rate = 50e6 // (6*9) = 925925
    assert out["books"] == (6, 50, 9, 925_925)
    # web: target 25 over 8 -> 4 epochs, rate 25e6 // 32 = 781250
    assert out["web"] == (8, 25, 4, 781_250)
    # zero-token domain: reported, zero lane
    assert out["empty_src"] == (0, 10, 0, 0)

    # unweighted domain reported with zeros
    out2 = {
        r["domain"]: r["target_tokens"]
        for r in mixture_plan(docs, {"books": 1.0}, 10).collect()
    }
    assert out2["web"] == 0 and out2["books"] == 10

    # non-dyadic float weight is exact via Fraction (floor semantics)
    out3 = {
        r["domain"]: r["target_tokens"]
        for r in mixture_plan(docs, {"books": 0.1}, 1000).collect()
    }
    from fractions import Fraction
    assert out3["books"] == 1000 * Fraction(0.1).numerator // Fraction(0.1).denominator

    with pytest.raises(ValueError):
        mixture_plan(docs, {"books": -0.1}, 100)
    with pytest.raises(ValueError):
        mixture_plan(docs, {"books": 0.5}, -1)

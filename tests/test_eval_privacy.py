"""training/retrieval.py ranking_metrics, training/pii.py k-anonymity,
training/textanalysis.py corpus_rollup — the r11-continuation lanes."""

import math

import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_spark.training.pii import k_anonymity, k_anonymize
from openeo_processes_dask_spark.training.retrieval import (
    GAIN_SCALE,
    ranking_metrics,
)
from openeo_processes_dask_spark.training.textanalysis import corpus_rollup


# ---------------------------------------------------------------- ranking


def _gain_micro(rel, pos):
    return round((2.0 ** rel - 1.0) / math.log2(pos + 1.0) * GAIN_SCALE)


def test_ranking_metrics_hand_computed(spark):
    # q1: retrieved a,b,c; judged: b rel 2, d rel 1 (missed), a rel 0
    # q2: retrieved e,f; nothing judged relevant
    results = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "c", 3), (2, "e", 1), (2, "f", 2)],
        ["query_id", "id", "rank"],
    )
    qrels = spark.createDataFrame(
        [(1, "b", 2), (1, "d", 1), (1, "a", 0), (2, "e", 0)],
        ["query_id", "id", "rel"],
    )
    out = {
        r["query_id"]: r.asDict()
        for r in ranking_metrics(results, qrels, k=10).collect()
    }
    q1 = out[1]
    dcg = _gain_micro(2, 2)  # b at rank 2
    idcg = _gain_micro(2, 1) + _gain_micro(1, 2)  # ideal: b then d
    assert q1["dcg_micro"] == dcg
    assert q1["idcg_micro"] == idcg
    assert q1["ndcg_at_k"] == round(dcg / idcg, 6)
    assert q1["mrr"] == (10**9 // 2) / 1e9
    assert q1["hits"] == 1 and q1["n_rel"] == 2
    assert q1["precision_at_k"] == 0.1
    assert q1["recall_at_k"] == 0.5
    # AP: one hit, at rank 2 with cum_hits 1 -> precision 0.5;
    # denominator min(n_rel=2, k=10) = 2
    assert q1["ap_micro"] == 500_000
    assert q1["map_at_k"] == 0.25
    q2 = out[2]
    assert q2["hits"] == 0 and q2["n_rel"] == 0
    assert q2["ndcg_at_k"] == 0.0 and q2["mrr"] == 0.0
    assert q2["recall_at_k"] == 0.0 and q2["dcg_micro"] == 0
    assert q2["ap_micro"] == 0 and q2["map_at_k"] == 0.0


def test_ranking_metrics_k_cutoff_and_perfect_run(spark):
    # perfect ordering at k=2: doc x (rel 3) then y (rel 1); z (rel 2)
    # ranked 3rd is outside k, so ideal@2 = x,z and ndcg < 1; at k=3 the
    # run misorders y/z, so ndcg < 1 there too, but dcg grows
    results = spark.createDataFrame(
        [(7, "x", 1), (7, "y", 2), (7, "z", 3)], ["query_id", "id", "rank"]
    )
    qrels = spark.createDataFrame(
        [(7, "x", 3), (7, "y", 1), (7, "z", 2)], ["query_id", "id", "rel"]
    )
    at2 = ranking_metrics(results, qrels, k=2).collect()[0]
    assert at2["dcg_micro"] == _gain_micro(3, 1) + _gain_micro(1, 2)
    assert at2["idcg_micro"] == _gain_micro(3, 1) + _gain_micro(2, 2)
    assert at2["hits"] == 2 and at2["n_rel"] == 3
    assert at2["precision_at_k"] == 1.0
    # AP@2: hits at ranks 1,2 with precisions 1/1 and 2/2; denominator
    # min(n_rel=3, k=2) = 2 -> MAP 1.0 (binary relevance ignores grades)
    assert at2["ap_micro"] == 2_000_000 and at2["map_at_k"] == 1.0
    at3 = ranking_metrics(results, qrels, k=3).collect()[0]
    assert at3["idcg_micro"] == (
        _gain_micro(3, 1) + _gain_micro(2, 2) + _gain_micro(1, 3)
    )
    assert at3["recall_at_k"] == 1.0 and at3["mrr"] == 1.0
    assert at3["ap_micro"] == 3_000_000 and at3["map_at_k"] == 1.0
    # the ideal permutation scores ndcg exactly 1
    perfect = spark.createDataFrame(
        [(7, "x", 1), (7, "z", 2), (7, "y", 3)], ["query_id", "id", "rank"]
    )
    assert ranking_metrics(perfect, qrels, k=3).collect()[0][
        "ndcg_at_k"
    ] == 1.0


def test_ranking_metrics_partition_invariance(spark):
    rows = [(q, f"d{q}_{i}", i) for q in range(6) for i in range(1, 9)]
    rels = [
        (q, f"d{q}_{i}", (q + i) % 4)
        for q in range(6)
        for i in range(1, 13)
    ]
    r1 = spark.createDataFrame(rows, ["query_id", "id", "rank"])
    q1 = spark.createDataFrame(rels, ["query_id", "id", "rel"])
    a = sorted(
        map(tuple, ranking_metrics(r1, q1, k=5).collect())
    )
    b = sorted(
        map(
            tuple,
            ranking_metrics(
                r1.repartition(7), q1.repartition(3), k=5
            ).collect(),
        )
    )
    assert a == b

    with pytest.raises(ValueError):
        ranking_metrics(r1, q1, k=0)


# ------------------------------------------------------------- k-anonymity


def test_k_anonymity_class_sizes_and_l_diversity(spark):
    rows = [
        # class (en, web): 3 rows, sensitive values {10, 10, 20}
        (1, "en", "web", 10),
        (2, "en", "web", 10),
        (3, "en", "web", 20),
        # class (de, web): 1 row -> suppressed at k=2
        (4, "de", "web", 30),
        # class (None, book): NULL quasi value is its own class of 2
        (5, None, "book", 40),
        (6, None, "book", 40),
    ]
    df = spark.createDataFrame(rows, ["id", "lang", "source", "age"])
    out = {
        r["id"]: r.asDict()
        for r in k_anonymity(
            df, ["lang", "source"], k=2, sensitive_col="age"
        ).collect()
    }
    assert out[1]["class_size"] == 3 and not out[1]["suppressed"]
    assert out[1]["distinct_sensitive"] == 2
    assert out[4]["class_size"] == 1 and out[4]["suppressed"]
    assert out[5]["class_size"] == 2 and not out[5]["suppressed"]
    assert out[5]["distinct_sensitive"] == 1  # k-anonymous but 1-diverse

    anon = {
        r["id"]: r.asDict()
        for r in k_anonymize(df, ["lang", "source"], k=2).collect()
    }
    assert anon[4]["lang"] is None and anon[4]["source"] is None
    assert anon[1]["lang"] == "en" and anon[1]["source"] == "web"
    masked = k_anonymize(df, ["lang", "source"], k=2, redaction="*")
    assert {
        r["source"] for r in masked.where("id = 4").collect()
    } == {"*"}


def test_l_diversity_profiles(spark):
    from openeo_processes_dask_spark.training.pii import l_diversity

    rows = [
        # class (en, web): freqs {10:3, 20:1, 30:1} -> sorted [3,1,1]
        (1, "en", "web", 10), (2, "en", "web", 10), (3, "en", "web", 10),
        (4, "en", "web", 20), (5, "en", "web", 30),
        # class (de, web): 2 rows, one value -> 1-diverse
        (6, "de", "web", 40), (7, "de", "web", 40),
        # class (None, book): NULL quasi forms its own class
        (8, None, "book", 50), (9, None, "book", 60),
    ]
    df = spark.createDataFrame(rows, ["id", "lang", "source", "age"])
    out = {
        (r["lang"], r["source"]): r.asDict()
        for r in l_diversity(
            df, ["lang", "source"], "age", l=2, c=2.0
        ).collect()
    }
    en = out[("en", "web")]
    assert en["class_size"] == 5 and en["distinct_l"] == 3
    assert en["top_count"] == 3 and en["tail_from_l"] == 2
    assert en["diverse"]
    # recursive (2,2): r_1=3 < 2*(r_2+r_3)=4 -> ok
    assert en["recursive_ok"]
    de = out[("de", "web")]
    assert de["distinct_l"] == 1 and not de["diverse"]
    # single value: tail empty -> never recursively diverse
    assert de["tail_from_l"] == 0 and not de["recursive_ok"]
    nb = out[(None, "book")]
    assert nb["distinct_l"] == 2 and nb["diverse"]

    # recursive at c=1: r_1=3 < (r_2+r_3)=2 is False for (en, web)
    strict = {
        (r["lang"], r["source"]): r["recursive_ok"]
        for r in l_diversity(
            df, ["lang", "source"], "age", l=2, c=1.0
        ).collect()
    }
    assert not strict[("en", "web")]
    # l=1 edge: head sum is empty, tail == class_size; everyone diverse
    l1 = l_diversity(df, ["lang", "source"], "age", l=1).collect()
    assert all(r["diverse"] for r in l1)
    assert all(r["tail_from_l"] == r["class_size"] for r in l1)
    assert "recursive_ok" not in l1[0].asDict()  # no c -> no column

    import pytest as _pt
    with _pt.raises(ValueError):
        l_diversity(df, ["lang"], "age", l=0)
    with _pt.raises(ValueError):
        l_diversity(df, ["lang"], "age", l=2, c=0.0)
    with _pt.raises(ValueError):
        l_diversity(df, [], "age", l=2)
    with _pt.raises(ValueError):
        l_diversity(df, ["nope"], "age", l=2)


def test_k_anonymity_validation(spark):
    df = spark.createDataFrame([(1, "en")], ["id", "lang"])
    with pytest.raises(ValueError):
        k_anonymity(df, ["lang"], k=0)
    with pytest.raises(ValueError):
        k_anonymity(df, [], k=2)
    with pytest.raises(ValueError):
        k_anonymity(df, ["nope"], k=2)
    with pytest.raises(ValueError):
        k_anonymity(df, ["lang"], k=2, sensitive_col="nope")
    # ADVICE r11 #3: a string redaction on a non-string quasi column
    # would silently coerce the column to string via when/otherwise
    # type unification — it must raise instead
    df2 = spark.createDataFrame([(1, "en", 30)], ["id", "lang", "age"])
    with pytest.raises(ValueError, match="age"):
        k_anonymize(df2, ["lang", "age"], k=2, redaction="*")
    # NULL suppression on the same mixed dtypes stays valid and keeps
    # the schema
    out = k_anonymize(df2, ["lang", "age"], k=2)
    assert dict(out.dtypes)["age"] == "bigint"


# ------------------------------------------------------------ corpus_rollup


def test_corpus_rollup_levels_match_manual_aggregates(spark):
    rows = [
        ("s1", "en", "a b c"),
        ("s1", "de", "d e"),
        ("s2", "en", "f"),
        ("s2", "en", "g h i j"),
    ]
    df = spark.createDataFrame(rows, ["source", "lang", "text"])
    out = corpus_rollup(df, ("source", "lang")).collect()
    by_gid = {}
    for r in out:
        by_gid.setdefault(r["gid"], []).append(r.asDict())
    # leaf level (gid 0) == plain groupBy
    leafs = {
        (r["source"], r["lang"]): (r["n_docs"], r["total_tokens"])
        for r in by_gid[0]
    }
    assert leafs[("s1", "en")] == (1, 3)
    assert leafs[("s2", "en")] == (2, 5)
    # source subtotals (gid 1): lang rolled up
    subs = {r["source"]: r["n_docs"] for r in by_gid[1]}
    assert subs == {"s1": 2, "s2": 2}
    assert all(r["lang"] is None for r in by_gid[1])
    # grand total (gid 3)
    (total,) = by_gid[3]
    assert total["n_docs"] == 4 and total["total_tokens"] == 10
    assert total["total_chars"] == sum(len(t) for _, _, t in rows)
    # exactly the three rollup levels, nothing else
    assert set(by_gid) == {0, 1, 3}


# -------------------------------------------------------- classifier eval


def test_calibration_bins_and_ece_hand_computed(spark):
    from openeo_processes_dask_spark.training.classifier import (
        calibration_bins,
        expected_calibration_error,
    )

    rows = [
        # bin 0: scores 0.0, 0.05; labels 0, 1 -> conf 50000, pos 1
        (0.0, 0), (0.05, 1),
        # bin 9: score 1.0 clamps into bin 9; 0.95 joins it
        (1.0, 1), (0.95, 0),
        # excluded: NULL score, NaN score, label 2
        (None, 1), (float("nan"), 0), (0.5, 2),
    ]
    df = spark.createDataFrame(rows, "s double, y int")
    bins = {
        r["bin"]: r.asDict()
        for r in calibration_bins(df, "s", "y", 10).collect()
    }
    assert set(bins) == {0, 9}
    b0 = bins[0]
    assert b0["n"] == 2 and b0["n_pos"] == 1
    assert b0["conf_micro"] == 50_000
    assert b0["mean_score"] == 0.025 and b0["pos_rate"] == 0.5
    assert b0["gap_micro"] == abs(50_000 - 1_000_000)
    b9 = bins[9]
    assert b9["n"] == 2 and b9["n_pos"] == 1
    assert b9["conf_micro"] == 1_950_000
    assert b9["gap_micro"] == 950_000
    ece = expected_calibration_error(df, "s", "y", 10).collect()[0]
    assert ece["n"] == 4
    assert ece["ece_micro"] == 950_000 + 950_000
    assert ece["ece"] == round(1_900_000 / 4 / 1e6, 6)


def test_confusion_at_threshold_hand_computed(spark):
    import pytest as _pytest

    from openeo_processes_dask_spark.training.classifier import (
        calibration_bins,
        confusion_at_threshold,
    )

    rows = [
        (0.9, 1), (0.8, 1), (0.7, 0),   # predicted positive
        (0.4, 1), (0.1, 0), (0.2, 0),   # predicted negative
        (0.5, 1),                        # boundary: s >= tau is positive
        (None, 1), (float("nan"), 1),    # excluded
    ]
    df = spark.createDataFrame(rows, "s double, y int")
    c = confusion_at_threshold(df, "s", "y", 0.5).collect()[0]
    assert (c["tp"], c["fp"], c["tn"], c["fn"]) == (3, 1, 2, 1)
    assert c["precision"] == 0.75
    assert c["recall"] == 0.75
    assert c["f1"] == 0.75
    assert c["accuracy"] == round(5 / 7, 6)
    # degenerate: no predicted positives -> NULL precision, not a crash
    neg = spark.createDataFrame([(0.1, 0), (0.2, 1)], "s double, y int")
    d = confusion_at_threshold(neg, "s", "y", 0.5).collect()[0]
    assert d["precision"] is None and d["recall"] == 0.0
    with _pytest.raises(ValueError):
        calibration_bins(df, "s", "y", 0)


def test_cohens_kappa_hand_computed(spark):
    from openeo_processes_dask_spark.training.classifier import (
        cohens_kappa,
    )

    # classic 2x2: a=yes 6 (b agrees 5), a=no 4 (b agrees 3);
    # marginals a: yes 6 / no 4, b: yes 6 / no 4
    rows = (
        [("y", "y")] * 5 + [("y", "n")] * 1
        + [("n", "n")] * 3 + [("n", "y")] * 1
        + [(None, "y"), ("y", None)]  # excluded
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["n"] == 10 and r["agree"] == 8
    assert r["pe_num"] == 6 * 6 + 4 * 4  # 52
    po, pe = 0.8, 0.52
    assert r["po"] == po and r["pe"] == pe
    assert r["kappa"] == round((po - pe) / (1 - pe), 6)
    # perfect agreement -> kappa 1; total disagreement on 2 balanced
    # classes -> kappa -1
    perfect = spark.createDataFrame(
        [("x", "x"), ("y", "y")], "a string, b string"
    )
    assert cohens_kappa(perfect, "a", "b").collect()[0]["kappa"] == 1.0
    inverted = spark.createDataFrame(
        [("x", "y"), ("y", "x")], "a string, b string"
    )
    assert cohens_kappa(inverted, "a", "b").collect()[0]["kappa"] == -1.0


def test_fairness_confusion_and_gaps_hand_computed(spark):
    from openeo_processes_dask_spark.training.classifier import (
        confusion_by_group,
        fairness_gaps,
    )

    rows = [
        # group A: sel 2/4, tpr 1/2, fpr 1/2
        ("A", 0.9, 1), ("A", 0.8, 0), ("A", 0.1, 1), ("A", 0.2, 0),
        # group B: all predicted positive, all labeled 1 ->
        # sel 1.0, tpr 1.0, fpr NULL (no negatives)
        ("B", 0.9, 1), ("B", 0.7, 1),
        # excluded rows
        ("A", None, 1), ("B", float("nan"), 0),
    ]
    df = spark.createDataFrame(rows, "g string, s double, y int")
    by_g = {
        r["group"]: r.asDict()
        for r in confusion_by_group(df, "s", "y", "g", 0.5).collect()
    }
    a = by_g["A"]
    assert (a["tp"], a["fp"], a["tn"], a["fn"]) == (1, 1, 1, 1)
    assert a["selection_rate"] == 0.5 and a["tpr"] == 0.5
    b = by_g["B"]
    assert b["selection_rate"] == 1.0 and b["tpr"] == 1.0
    assert b["fpr"] is None  # no negatives in the group
    gaps = fairness_gaps(df, "s", "y", "g", 0.5).collect()[0]
    assert gaps["n_groups"] == 2
    assert gaps["dp_gap"] == 0.5       # 1.0 - 0.5
    assert gaps["eo_tpr_gap"] == 0.5   # 1.0 - 0.5
    assert gaps["eo_fpr_gap"] == 0.0   # only group A has a defined fpr


def test_t_closeness_hand_example(spark):
    """Li et al. 2007 total-variation instance, hand-checked: global
    P = (1/2, 1/3, 1/6) over {x,y,z}; class A (2,1,1)/4 -> tvd 1/12;
    class B (1,1,0)/2 -> tvd 1/6. Exact-integer lane, so equality is
    strict at 6 decimals."""
    from openeo_processes_dask_spark.training.pii import t_closeness

    rows = [("A", "x"), ("A", "x"), ("A", "y"), ("A", "z"),
            ("B", "x"), ("B", "y")]
    df = spark.createDataFrame(rows, "q string, s string")
    out = {r["q"]: r for r in t_closeness(df, ["q"], "s", 0.1).collect()}
    assert out["A"]["tvd"] == 0.083333 and out["A"]["class_size"] == 4
    assert out["B"]["tvd"] == 0.166667 and out["B"]["class_size"] == 2
    assert out["A"]["violates"] is False
    assert out["B"]["violates"] is True  # 0.166667 > 0.1


def test_t_closeness_uniform_class_is_zero(spark):
    """A class whose sensitive distribution equals the global one has
    tvd exactly 0 — the integer formula cancels term by term."""
    from openeo_processes_dask_spark.training.pii import t_closeness

    rows = [("A", "x"), ("A", "y"), ("B", "x"), ("B", "y")]
    df = spark.createDataFrame(rows, "q string, s string")
    out = t_closeness(df, ["q"], "s", 0.0).collect()
    assert all(r["tvd"] == 0.0 for r in out)
    # violates is STRICT inequality: tvd 0 at t=0 does not violate
    assert all(r["violates"] is False for r in out)


def test_t_closeness_validation(spark):
    import pytest

    from openeo_processes_dask_spark.training.pii import t_closeness

    df = spark.createDataFrame([("A", "x")], "q string, s string")
    with pytest.raises(ValueError, match="t must be in"):
        t_closeness(df, ["q"], "s", 1.5)
    with pytest.raises(ValueError, match="at least one quasi"):
        t_closeness(df, [], "s", 0.5)
    with pytest.raises(ValueError, match="not in DataFrame"):
        t_closeness(df, ["q"], "nope", 0.5)

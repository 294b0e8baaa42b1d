"""LLM-pipeline curation ops added round 5: PII detect/redact, C4-style
line cleaning, bigram-LM perplexity, URL/domain ops. All pure Column
expressions (no UDFs) — these tests pin semantics; the driver gates pin
cross-engine values."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_pii_stats_and_redact(spark):
    from openeo_processes_dask_spark.training.pii import pii_redact, pii_stats

    df = spark.createDataFrame(
        [
            (1, "mail alice@example.com or bob.smith+x@sub.domain.org now"),
            (2, "server at 192.168.0.1 port open"),
            (3, "call 555-123-4567 or +1 555 987 6543"),
            (4, "ssn 123-45-6789 leaked"),
            (5, "nothing sensitive here"),
        ],
        "id bigint, text string",
    )
    stats = {r["id"]: r for r in pii_stats(df).collect()}
    assert stats[1]["pii_email"] == 2 and stats[1]["pii_total"] == 2
    assert stats[2]["pii_ipv4"] == 1
    assert stats[3]["pii_phone"] >= 1
    assert stats[4]["pii_ssn"] == 1
    # ssn must be counted as ssn, not phone (3-2-4 vs 3-3-4 grouping)
    assert stats[4]["pii_phone"] == 0
    assert stats[5]["pii_total"] == 0

    red = {r["id"]: r["text"] for r in pii_redact(df).collect()}
    assert red[1] == "mail [EMAIL] or [EMAIL] now"
    assert red[2] == "server at [IP] port open"
    assert "[PHONE]" in red[3] and "555" not in red[3].split("[PHONE]")[0]
    assert red[4] == "ssn [SSN] leaked"
    assert red[5] == "nothing sensitive here"


def test_c4_clean_line_rules(spark):
    from openeo_processes_dask_spark.training.filtering import (
        c4_clean,
        c4_filter,
    )

    text = "\n".join(
        [
            "this line survives the cleaning pass.",  # kept
            "no terminal punctuation on this line",  # dropped: no punct
            "short.",  # dropped: < 3 words
            "enable javascript to view this content.",  # dropped: marker
            "is this line kept as well?",  # kept
        ]
    )
    df = spark.createDataFrame([(1, text)], "id bigint, text string")
    row = c4_clean(df).collect()[0]
    assert row["n_lines_total"] == 5
    assert row["n_lines_kept"] == 2
    assert row["clean_text"] == (
        "this line survives the cleaning pass.\nis this line kept as well?"
    )
    assert not row["has_brace"] and not row["has_lorem"]

    # doc-level drops: brace / lorem ipsum / too few surviving lines
    docs = spark.createDataFrame(
        [
            (1, "good one stays here.\nsecond good line stays.\nthird line is fine."),
            (2, "code with a brace {.\nbut otherwise fine lines here.\nthird fine line."),
            (3, "Lorem Ipsum dolor sit amet.\nmore filler text here.\nthird line again."),
            (4, "only one surviving line."),
        ],
        "id bigint, text string",
    )
    kept = [r["id"] for r in c4_filter(docs, min_lines=2).collect()]
    assert kept == [1]


def test_bigram_nll_matches_hand_computation(spark):
    from openeo_processes_dask_spark.training.lm import bigram_nll

    # corpus: "a b a b" and "a b c" -> bigrams: (a,b)x2 from doc1 +
    # (b,a)x1, (a,b)x1 + (b,c)x1 from doc2
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in bigram_nll(df, k=0.5).collect()}
    # doc 3 has < 2 tokens: unscorable, absent
    assert set(out) == {1, 2}
    V = 3  # vocab over bigram positions is {a, b, c}; doc 3's lone "x"
    # never enters a bigram so it contributes nothing to the model
    c12 = {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    c1 = {"a": 3, "b": 2}
    def p(w1, w2):
        return (c12.get((w1, w2), 0) + 0.5) / (c1[w1] + 0.5 * V)
    nll1 = -(math.log(p("a", "b")) * 2 + math.log(p("b", "a"))) / 3
    nll2 = -(math.log(p("a", "b")) + math.log(p("b", "c"))) / 2
    assert out[1]["n_bigrams"] == 3
    assert out[2]["n_bigrams"] == 2
    assert abs(out[1]["nll"] - nll1) < 1e-12
    assert abs(out[2]["nll"] - nll2) < 1e-12
    # the repeated-bigram doc is more predictable -> lower nll
    assert out[1]["nll"] < out[2]["nll"]


def test_bigram_nll_cross_corpus_backoff(spark):
    from openeo_processes_dask_spark.training.lm import bigram_nll

    train = spark.createDataFrame([(1, "a b a b")], "doc_id bigint, text string")
    score = spark.createDataFrame([(9, "z q")], "doc_id bigint, text string")
    out = bigram_nll(score, train_df=train, k=0.5).collect()
    assert len(out) == 1
    # unseen bigram under unseen context -> floor p = 1/V, V = {a, b}
    assert abs(out[0]["nll"] - (-math.log(1 / 2))) < 1e-12


def test_url_domain_extraction(spark):
    from openeo_processes_dask_spark.training.urlops import (
        per_domain_stats,
        registered_domain,
        url_host,
    )

    df = spark.createDataFrame(
        [
            (1, "https://www.example.com/path?q=1", 10),
            (2, "http://sub.example.com:8080/x", 20),
            (3, "example.com/bare", 30),
            (4, "https://user@other.org/", 5),
            (5, "ftp://www.other.org/file", 5),
        ],
        "id bigint, url string, size bigint",
    )
    hosts = {r["id"]: r["h"] for r in df.select(
        "id", url_host(F.col("url")).alias("h")).collect()}
    assert hosts == {
        1: "www.example.com", 2: "sub.example.com", 3: "example.com",
        4: "other.org", 5: "www.other.org",
    }
    doms = {r["id"]: r["d"] for r in df.select(
        "id", registered_domain(F.col("url")).alias("d")).collect()}
    assert doms == {
        1: "example.com", 2: "example.com", 3: "example.com",
        4: "other.org", 5: "other.org",
    }
    stats = {r["domain"]: (r["n_docs"], r["total_size"]) for r in
             per_domain_stats(df, size_col="size").collect()}
    assert stats == {"example.com": (3, 60), "other.org": (2, 10)}


def test_pii_and_c4_plans_are_map_only(spark):
    """PII stats/redact and C4 cleaning must compile to pure projections:
    no Exchange, no Python evaluation — at 100 TB these run at parquet
    scan speed or they are mis-designed."""
    from openeo_processes_dask_spark.training.filtering import c4_clean
    from openeo_processes_dask_spark.training.pii import pii_redact, pii_stats

    df = spark.createDataFrame([(1, "x y z.")], "id bigint, text string")
    for out in (pii_stats(df), pii_redact(df), c4_clean(df)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan and "Arrow" not in plan


def test_remove_boilerplate_lines(spark):
    from openeo_processes_dask_spark.training.dedup import (
        remove_boilerplate_lines,
    )

    banner = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"{banner}\nunique content of doc one.\nmore doc one text."),
            (2, f"unique doc two line.\n{banner}"),
            (3, f"SUBSCRIBE  to our   newsletter\ndoc three body."),  # norm match
            (4, banner),  # all boilerplate -> ''
            (5, "no banner at all here."),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r["text"] for r in remove_boilerplate_lines(
        docs, "doc_id", "text", min_docs=3
    ).collect()}
    assert out[1] == "unique content of doc one.\nmore doc one text."
    assert out[2] == "unique doc two line."
    assert out[3] == "doc three body."
    assert out[4] == ""
    assert out[5] == "no banner at all here."
    # below-threshold shared lines survive (banner is in 4 distinct docs)
    out2 = {r["doc_id"]: r["text"] for r in remove_boilerplate_lines(
        docs, "doc_id", "text", min_docs=5
    ).collect()}
    assert banner in out2[1]


def test_dedup_lines_global_keep_first(spark):
    from openeo_processes_dask_spark.training.dedup import (
        dedup_lines_global,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta\ncommon line here\n\ntail one"),
            # both lines below are later dups of doc 1's (case/ws-norm)
            (2, "common line here\nunique middle\nCOMMON   LINE HERE"),
            (3, "common line here"),  # wholly duplicated -> ''
            (4, ""),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in dedup_lines_global(docs, "doc_id", "text").collect()
    }
    # first occurrence + blank line survive; later occurrences cut
    assert out[1] == "alpha beta\ncommon line here\n\ntail one"
    assert out[2] == "unique middle"
    assert out[3] == ""
    assert out[4] == ""
    # out_col variant leaves the source column untouched
    kept = dedup_lines_global(
        docs, "doc_id", "text", out_col="clean"
    ).collect()
    by_id = {r["doc_id"]: r for r in kept}
    assert by_id[2]["text"].startswith("common line here")
    assert by_id[2]["clean"] == "unique middle"


def test_latest_per_url_keeps_newest(spark):
    import datetime as dt

    from openeo_processes_dask_spark.training.urlops import latest_per_url

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", t0, 1.0, 1),
        ("a", t0 + dt.timedelta(days=2), 2.0, 2),
        ("a", t0 + dt.timedelta(days=1), 3.0, 3),
        ("b", t0, 4.0, 4),
        # timestamp tie on c -> tie_col (seq) decides
        ("c", t0, 5.0, 5),
        ("c", t0, 6.0, 6),
    ]
    df = spark.createDataFrame(
        rows, "url string, crawl_ts timestamp, value double, seq int"
    )
    got = {
        r["url"]: (r["value"], r["seq"])
        for r in latest_per_url(df, tie_col="seq").collect()
    }
    assert got == {"a": (2.0, 2), "b": (4.0, 4), "c": (6.0, 6)}


def test_latest_per_url_plan_is_window_group_limit(spark):
    import datetime as dt

    from openeo_processes_dask_spark.diagnostics import plan_report
    from openeo_processes_dask_spark.training.urlops import latest_per_url

    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 1.0, 1)],
        "url string, crawl_ts timestamp, value double, seq int",
    )
    r = plan_report(latest_per_url(df, tie_col="seq"))
    assert "WindowGroupLimit" in r.text and r.python_free


def test_quantize_and_chunk_plans_python_free(spark):
    from openeo_processes_dask_spark.diagnostics import plan_report
    from openeo_processes_dask_spark.training.similarity import (
        quantize_embeddings,
    )
    from openeo_processes_dask_spark.training.textanalysis import chunk_text

    emb = spark.createDataFrame(
        [(1, [0.5, -1.0])], ["vec_id", "embedding"]
    )
    r1 = plan_report(quantize_embeddings(emb))
    assert r1.python_free and r1.exchanges == 0
    docs = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    r2 = plan_report(chunk_text(docs, chunk_tokens=3, overlap=1))
    assert r2.python_free and r2.exchanges == 0


# --- token_entropy ------------------------------------------------------

def test_token_entropy_known_values(spark):
    import math

    from openeo_processes_dask_spark.training.textanalysis import (
        token_entropy,
    )

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # single token -> H = 0
            (2, "a b c d"),          # uniform over 4 -> H = ln 4
            (3, "a a b"),            # 2/3, 1/3
            (4, "   "),              # whitespace-only -> dropped
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["entropy"] == 0.0
    assert got[1]["n_tokens"] == 4 and got[1]["n_distinct"] == 1
    assert got[2]["entropy"] == round(math.log(4), 6)
    h3 = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert abs(got[3]["entropy"] - h3) < 1e-6
    assert got[3]["n_tokens"] == 3 and got[3]["n_distinct"] == 2


def test_token_entropy_case_fold(spark):
    from openeo_processes_dask_spark.training.textanalysis import (
        token_entropy,
    )

    df = spark.createDataFrame([(1, "Word word WORD")], "doc_id long, text string")
    r = token_entropy(df).collect()[0]
    assert r["n_distinct"] == 1 and r["entropy"] == 0.0


# --- classifier auc -----------------------------------------------------

def test_auc_degenerate_and_null_handling(spark):
    from openeo_processes_dask_spark.training.classifier import auc

    # all-positive labels -> n_neg = 0 -> NULL auc, no crash
    df = spark.createDataFrame([(0.1, 1), (0.9, 1)], "s double, y int")
    r = auc(df, "s", "y").collect()[0]
    assert r["n_neg"] == 0 and r["auc"] is None

    # NULL scores/labels and out-of-domain labels are excluded
    df2 = spark.createDataFrame(
        [(0.9, 1), (0.1, 0), (None, 1), (0.5, None), (0.7, 2)],
        "s double, y int",
    )
    r2 = auc(df2, "s", "y").collect()[0]
    assert (r2["n_pos"], r2["n_neg"], r2["auc"]) == (1, 1, 1.0)


def test_auc_partitioning_invariant_with_ties(spark):
    from openeo_processes_dask_spark.training.classifier import auc

    rows = [(float(i % 5), (i * 7 + 1) % 3 == 0) for i in range(200)]
    df1 = spark.createDataFrame(rows, "s double, y boolean").repartition(13)
    df2 = spark.createDataFrame(rows, "s double, y boolean").coalesce(1)
    r1 = auc(df1, "s", "y").collect()[0]
    r2 = auc(df2, "s", "y").collect()[0]
    assert r1 == r2
    # brute-force pairwise check
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    u = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    assert abs(r1["auc"] - u / (len(pos) * len(neg))) < 1e-6


# --- source_divergence --------------------------------------------------

def test_source_divergence_identical_and_disjoint(spark):
    import math

    from openeo_processes_dask_spark.training.textanalysis import (
        source_divergence,
    )

    df = spark.createDataFrame(
        [
            ("a", "x x y"), ("a", "y z"),
            ("b", "x x y y z"),          # same distribution as a
            ("c", "p q r p q r"),        # disjoint support
        ],
        "source string, text string",
    )
    got = {(r["g1"], r["g2"]): r["js"] for r in source_divergence(df).collect()}
    assert got[("a", "b")] == 0.0
    assert got[("a", "c")] == round(math.log(2), 6)
    assert got[("b", "c")] == round(math.log(2), 6)


def test_source_divergence_matches_python(spark):
    import math
    from collections import Counter

    from openeo_processes_dask_spark.training.textanalysis import (
        source_divergence,
    )

    texts = {
        "a": "w1 w2 w2 w3 w4 w4 w4",
        "b": "w2 w3 w3 w5",
    }
    df = spark.createDataFrame(
        list(texts.items()), "source string, text string"
    )
    r = source_divergence(df).collect()[0]
    ca, cb = Counter(texts["a"].split()), Counter(texts["b"].split())
    na, nb = sum(ca.values()), sum(cb.values())
    js = 0.0
    for tok in set(ca) | set(cb):
        p, q = ca.get(tok, 0) / na, cb.get(tok, 0) / nb
        if p > 0:
            js += 0.5 * p * math.log(2 * p / (p + q))
        if q > 0:
            js += 0.5 * q * math.log(2 * q / (p + q))
    assert abs(r["js"] - js) < 1e-6
    assert (r["n_tokens_1"], r["n_tokens_2"]) == (na, nb)


# --- funnel -------------------------------------------------------------

def test_funnel_known_paths(spark):
    import datetime as dt

    from openeo_processes_dask_spark.training.funnel import funnel

    t0 = dt.datetime(2024, 1, 1)

    def ev(u, m, typ):
        return (u, t0 + dt.timedelta(minutes=m), typ)

    rows = [
        # user 1: full funnel in order
        ev(1, 0, "view"), ev(1, 5, "click"), ev(1, 9, "purchase"),
        # user 2: purchase BEFORE click -> funnel stops at 2
        ev(2, 0, "view"), ev(2, 8, "click"), ev(2, 3, "purchase"),
        # user 3: never clicked -> 1 step; its purchase is ignored
        ev(3, 0, "view"), ev(3, 4, "purchase"),
        # user 4: clicked before any view -> only the later view binds,
        # so the early click cannot count; no later click -> 1 step
        ev(4, 5, "view"), ev(4, 2, "click"),
        # user 5: no view at all -> absent from the result
        ev(5, 1, "click"), ev(5, 2, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    ).repartition(4)
    got = {
        r["user_id"]: r["steps_completed"]
        for r in funnel(df, ["view", "click", "purchase"]).collect()
    }
    assert got == {1: 3, 2: 2, 3: 1, 4: 1}


def test_funnel_greedy_earliest_binding(spark):
    import datetime as dt

    from openeo_processes_dask_spark.training.funnel import funnel

    t0 = dt.datetime(2024, 1, 1)
    # two views (m=0, m=10), click at m=5: greedy binds view@0 -> click@5
    rows = [
        (1, t0, "view"),
        (1, t0 + dt.timedelta(minutes=10), "view"),
        (1, t0 + dt.timedelta(minutes=5), "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    r = funnel(df, ["view", "click"]).collect()[0]
    assert r["steps_completed"] == 2
    assert r["t1"] == t0 and r["t2"] == t0 + dt.timedelta(minutes=5)


def test_funnel_validates(spark):
    import pytest

    from openeo_processes_dask_spark.training.funnel import funnel

    df = spark.createDataFrame(
        [(1, None, "view")], "user_id long, ts timestamp, event_type string"
    )
    with pytest.raises(ValueError):
        funnel(df, ["view"])


def test_retention_cohorts(spark):
    import datetime as dt

    from openeo_processes_dask_spark.training.funnel import retention

    t0 = dt.datetime(2024, 1, 1)  # a Monday
    rows = [
        (1, t0), (1, t0 + dt.timedelta(days=8)),    # cohort w0, back w1
        (2, t0 + dt.timedelta(days=2)),             # cohort w0, never back
        (3, t0 + dt.timedelta(days=7)),             # cohort w1
        (1, t0 + dt.timedelta(days=21)),            # user 1 back w3
        (3, t0 + dt.timedelta(days=7, hours=5)),    # same week dup -> 1 active
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp").repartition(3)
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in retention(df).collect()
    }
    w0, w1 = t0, t0 + dt.timedelta(days=7)
    assert got == {
        (w0, 0): 2, (w0, 1): 1, (w0, 3): 1,
        (w1, 0): 1,
    }


def test_top_paths_order_and_prefix(spark):
    import datetime as dt

    from openeo_processes_dask_spark.training.funnel import top_paths

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(7):
        seq = ["a", "b", "c", "d"] if u < 4 else ["a", "b"]
        for i, s in enumerate(seq):
            rows.append((u, t0 + dt.timedelta(minutes=i), i, s))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    ).repartition(3)
    got = [(r["rank"], r["path"], r["n_users"])
           for r in top_paths(df, k=5, prefix_len=3).collect()]
    # prefix_len=3 truncates the 4-event users to a>b>c
    assert got == [(1, "a>b>c", 4), (2, "a>b", 3)]


def test_top_paths_plan_has_window_group_limit(spark):
    from openeo_processes_dask_spark.diagnostics import plan_report
    from openeo_processes_dask_spark.training.funnel import top_paths

    import datetime as dt

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1, "a")],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    r = plan_report(top_paths(df, k=3, prefix_len=2))
    assert "WindowGroupLimit" in r.text and r.python_free


def test_stream_funnel_matches_batch(spark, tmp_path):
    """Single sorted-batch drain, aggregated to max step per user, must
    equal the batch funnel's steps_completed row for row."""
    import datetime as dt
    import random

    from pyspark.sql import functions as F

    from openeo_processes_dask_spark.streaming.sessions import stream_funnel
    from openeo_processes_dask_spark.training.funnel import funnel

    random.seed(3)
    t0 = dt.datetime(2024, 1, 1)
    types = ["view", "click", "purchase", "noise"]
    rows = [
        (i, t0 + dt.timedelta(minutes=i), i % 9, random.choice(types))
        for i in range(400)
    ]
    schema = "event_id bigint, t timestamp, k bigint, event string"
    df = spark.createDataFrame(rows, schema)
    d = str(tmp_path / "funnel_src")
    df.orderBy("t").coalesce(1).write.mode("overwrite").parquet(d)
    out = stream_funnel(
        spark.readStream.schema(schema).parquet(d),
        ["view", "click", "purchase"],
    )
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["k"]: r["m"]
        for r in spark.table("funnel_test")
        .groupBy("k")
        .agg(F.max("step").alias("m"))
        .collect()
    }
    exp = {
        r["k"]: r["steps_completed"]
        for r in funnel(
            df.withColumnRenamed("event", "event_type")
            .withColumnRenamed("t", "ts"),
            ["view", "click", "purchase"],
            user_col="k",
            ts_col="ts",
        ).collect()
    }
    assert got == exp and got  # non-trivial fixture


def test_isotonic_calibrate_pava(spark):
    from openeo_processes_dask_spark.training.classifier import (
        isotonic_calibrate,
    )

    rows = [(1.0, 0), (1.0, 0), (2.0, 1), (3.0, 0), (4.0, 1), (4.0, 1), (5.0, 1)]
    df = spark.createDataFrame(rows, "s double, y int").repartition(3)
    got = sorted(
        (r["s"], r["n"], r["n_pos"], r["calibrated"])
        for r in isotonic_calibrate(df, "s", "y").collect()
    )
    # per-score rates 0, 1, 0, 1, 1 -> the 1/0 violation pools to 0.5
    assert got == [
        (1.0, 2, 0, 0.0),
        (2.0, 1, 1, 0.5),
        (3.0, 1, 0, 0.5),
        (4.0, 2, 2, 1.0),
        (5.0, 1, 1, 1.0),
    ]
    # monotone by construction
    fits = [c for _, _, _, c in got]
    assert fits == sorted(fits)


def test_isotonic_already_monotone_is_identity(spark):
    from openeo_processes_dask_spark.training.classifier import (
        isotonic_calibrate,
    )

    rows = [(1.0, 0)] * 4 + [(2.0, 1), (2.0, 0)] + [(3.0, 1)] * 3
    df = spark.createDataFrame(rows, "s double, y int")
    got = {r["s"]: r["calibrated"]
           for r in isotonic_calibrate(df, "s", "y").collect()}
    assert got == {1.0: 0.0, 2.0: 0.5, 3.0: 1.0}

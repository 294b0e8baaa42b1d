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

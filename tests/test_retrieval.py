"""training/retrieval.py — inverted index + multi-query BM25."""

import math

from openeo_processes_dask_spark.training.retrieval import (
    bm25_search,
    build_inverted_index,
)

CORPUS = {
    1: "the cat sat on the mat",
    2: "the dog chased the cat and the cat ran",
    3: "dogs and cats living together",
    4: "nothing relevant here at all whatsoever",
    5: "cat cat cat dog",
}


def _df(spark):
    return spark.createDataFrame(list(CORPUS.items()), ["doc_id", "text"])


def _python_bm25(terms, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in CORPUS.items()}
    n = len(CORPUS)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, ws in toks.items():
        s = 0
        for t in terms:
            dfreq = sum(1 for v in toks.values() if t in v)
            idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
            tf = ws.count(t)
            if tf:
                c = idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(ws) / avgdl)
                )
                s += round(c * 1e6)
        if s > 0:
            out[i] = s / 1e6
    return out


def test_bm25_search_matches_python_replay(spark):
    postings, stats = build_inverted_index(_df(spark))
    queries = spark.createDataFrame(
        [(10, ["cat", "dog"]), (20, ["mat"]), (30, ["zebra"])],
        ["query_id", "terms"],
    )
    rows = bm25_search(postings, stats, queries, k=3).collect()
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["id"], r["score"])
        )
    for q, terms in [(10, ["cat", "dog"]), (20, ["mat"]), (30, ["zebra"])]:
        exp = _python_bm25(terms)
        ranked = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        exp_rows = [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]
        assert got.get(q, []) == exp_rows, q
    assert 30 not in got  # zero-hit query emits nothing


def test_bm25_search_duplicate_query_terms_counted_once(spark):
    postings, stats = build_inverted_index(_df(spark))
    q1 = spark.createDataFrame([(1, ["cat"])], ["query_id", "terms"])
    q2 = spark.createDataFrame([(1, ["cat", "cat"])], ["query_id", "terms"])
    r1 = [(r["id"], r["score"]) for r in bm25_search(postings, stats, q1).collect()]
    r2 = [(r["id"], r["score"]) for r in bm25_search(postings, stats, q2).collect()]
    assert r1 == r2


def test_bm25_search_topk_plan_is_window_group_limit(spark):
    from openeo_processes_dask_spark.diagnostics import plan_report

    postings, stats = build_inverted_index(_df(spark))
    queries = spark.createDataFrame([(1, ["cat"])], ["query_id", "terms"])
    r = plan_report(bm25_search(postings, stats, queries, k=2))
    assert "WindowGroupLimit" in r.text
    assert r.python_free


# --- rrf_fuse ----------------------------------------------------------

def test_rrf_fuse_known_fusion(spark):
    from openeo_processes_dask_spark.training.retrieval import (
        RRF_SCALE,
        rrf_fuse,
    )

    lex = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], ["rank", "id"])
    den = spark.createDataFrame([(1, 20), (2, 30), (3, 40)], ["rank", "id"])
    got = {
        r["id"]: (r["rank"], r["rrf_micro"], r["n_lists"])
        for r in rrf_fuse([lex, den], k0=60, k=10).collect()
    }
    s = lambda r: RRF_SCALE // (60 + r)  # noqa: E731
    assert got[20] == (1, s(2) + s(1), 2)  # in both lists -> wins
    assert got[30] == (2, s(3) + s(2), 2)
    assert got[10] == (3, s(1), 1)
    assert got[40] == (4, s(3), 1)


def test_rrf_fuse_tie_breaks_by_id(spark):
    from openeo_processes_dask_spark.training.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 7), (2, 5)], ["rank", "id"])
    b = spark.createDataFrame([(1, 5), (2, 7)], ["rank", "id"])
    rows = rrf_fuse([a, b], k=10).collect()
    # identical fused scores -> id ASC decides
    assert [r["id"] for r in rows] == [5, 7]
    assert rows[0]["rrf_micro"] == rows[1]["rrf_micro"]


def test_rrf_fuse_respects_k_and_validates(spark):
    import pytest

    from openeo_processes_dask_spark.training.retrieval import rrf_fuse

    a = spark.createDataFrame([(i, i * 100) for i in range(1, 9)], ["rank", "id"])
    assert rrf_fuse([a], k=3).count() == 3
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([a], k0=0)


def test_stream_ranking_metrics_final_matches_batch(spark, tmp_path):
    """r12 pin (VERDICT r11 #7): two micro-batches of result rows ->
    each query's FINAL emission (n_seen == its run length) equals the
    batch ranking_metrics row bit-for-bit, and interim emissions carry
    a smaller n_seen."""
    import datetime as dt

    from openeo_processes_dask_spark.training.retrieval import (
        ranking_metrics,
        stream_ranking_metrics,
    )

    t0 = dt.datetime(2024, 3, 1)
    # 3 queries x 4 ranks; qrels grade some ids 1-3
    results_rows = [
        (t0 + dt.timedelta(seconds=i), qid, qid * 100 + r, r)
        for i, (qid, r) in enumerate(
            (q, r) for q in (1, 2, 3) for r in (1, 2, 3, 4)
        )
    ]
    qrels_rows = [
        (1, 101, 3), (1, 103, 1), (1, 999, 2),   # 999 never retrieved
        (2, 202, 2),
        # query 3 judged nothing relevant
        (3, 999, 0),
    ]
    schema = "t timestamp, query_id long, id long, rank long"
    results = spark.createDataFrame(results_rows, schema)
    qrels = spark.createDataFrame(
        qrels_rows, "query_id long, id long, rel long"
    )

    d = str(tmp_path / "runs")
    # batch 1: ranks 1-2; batch 2: ranks 3-4 (two files)
    results.where("rank <= 2").coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    results.where("rank > 2").coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(schema)
        .parquet(d)
    )
    out = stream_ranking_metrics(stream, qrels, k=4)
    qy = (
        out.writeStream.format("memory")
        .queryName("srm_pin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    qy.awaitTermination(180)
    drained = spark.table("srm_pin").collect()
    finals = {
        r["query_id"]: r.asDict()
        for r in drained
        if r["n_seen"] == 4
    }
    interim = [r for r in drained if r["n_seen"] == 2]
    assert len(finals) == 3 and len(interim) == 3
    batch = {
        r["query_id"]: r.asDict()
        for r in ranking_metrics(
            results.drop("t"), qrels, k=4
        ).collect()
    }
    for qid, b in batch.items():
        f = dict(finals[qid])
        f.pop("n_seen")
        assert f == b, (qid, f, b)
    # interim rows only see ranks 1-2: query 1's interim hits == 1
    i1 = next(r for r in interim if r["query_id"] == 1)
    assert i1["hits"] == 1 and i1["precision_at_k"] == 0.25


def test_round_half_up_double_matches_spark_f_round(spark):
    """ADVICE r12 #2: the streaming replay's integer rounding must agree
    with JVM F.round on adversarial doubles — including values where
    floor(x + 0.5) disagrees because the binary sum crosses an integer
    through FP error (0.49999999999999994 + 0.5 == 1.0 in doubles)."""
    from pyspark.sql import functions as F

    from openeo_processes_dask_spark.training.retrieval import (
        _round_half_up_double,
    )

    cases = [
        0.49999999999999994,  # floor(x+0.5) == 1; HALF_UP == 0
        0.5, 1.5, 2.5, 0.4999999999, 1.4999999999999998,
        2.6757457245, 999999.5000000001, 123456.49999999999,
        0.0, 7.0, 1e-12, 0.999999999999999,
    ]
    df = spark.createDataFrame([(x,) for x in cases], "x double")
    jvm = {
        r["x"]: r["r"]
        for r in df.select("x", F.round("x").alias("r")).collect()
    }
    for x in cases:
        assert _round_half_up_double(x) == jvm[x], x
    # and the motivating counterexample really does split the two paths
    assert _round_half_up_double(0.49999999999999994) == 0
    assert math.floor(0.49999999999999994 + 0.5) == 1

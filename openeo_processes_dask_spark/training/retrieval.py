"""Inverted-index ranked retrieval — the MANY-queries scale path.

:func:`...textanalysis.bm25_topk` inlines one query's terms as literals
and scans the corpus per query: right for ad-hoc exploration, wrong for a
curation pipeline scoring thousands of topic probes. This module builds
the classic inverted index ONCE (postings + document stats — one corpus
scan each) and answers a whole query TABLE with joins: cost is then
driven by postings actually touched, not corpus size × query count.

No reference counterpart (LLM-pipeline lane). Scoring uses the same
Lucene-form BM25 as bm25_topk; per-term contributions are snapped to
integer micro-units before the per-(query, doc) sum, so the aggregate is
order-independent — bit-identical under any partitioning and exactly
replayable by the DuckDB oracle (the engine's established idiom: k-means
centroids, logreg gradients, DSIR weights).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_inverted_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(postings, doc_stats): postings = (term, id, tf) — one explode +
    one hash aggregate keyed by (term, id); doc_stats = (id, dl). At
    100 TB both are write-once tables partitioned/bucketed by term
    (postings) and id (doc_stats) — the layout every retrieval join
    reuses; here they stay DataFrames."""
    from openeo_processes_dask_spark.training.textanalysis import tokens

    toks = df.select(
        F.col(id_col).alias("id"),
        tokens(F.lower(F.col(text_col))).alias("w"),
    )
    postings = (
        toks.select("id", F.explode("w").alias("term"))
        .groupBy("term", "id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doc_stats = toks.select("id", F.size("w").alias("dl"))
    return postings, doc_stats


def bm25_search(
    postings: DataFrame,
    doc_stats: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    query_id_col: str = "query_id",
    terms_col: str = "terms",
) -> DataFrame:
    """Top-``k`` BM25 answers for EVERY query in ``queries``
    (query_id, terms array<string>). Returns (query_id, rank, id, score).

    Plan: query terms explode (query-table sized), join the per-term df
    stats (term-vocabulary sized — broadcastable), join postings on term
    (the only corpus-driven join, keyed by term so a term-partitioned
    postings table prunes), one hash aggregate on (query_id, id) summing
    integer micro-unit contributions, then row_number <= k per query —
    compiles to WindowGroupLimit, so only k rows per query cross the
    final exchange. N and avgdl are two driver scalars (metadata)."""
    stats = doc_stats.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).first()
    n_docs, avgdl = stats["n"], float(stats["avgdl"] or 1.0)
    if not n_docs:
        return queries.select(
            F.col(query_id_col).alias("query_id"),
            F.lit(1).alias("rank"),
            F.lit(None).cast("long").alias("id"),
            F.lit(0.0).alias("score"),
        ).where(F.lit(False))
    term_df = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.col(terms_col)).alias("term"),
    ).distinct()
    # idf from the joined df counts — same Lucene always-positive form
    # and the same association order as bm25_topk's driver-side literals
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    matched = (
        qt.join(term_df, "term")
        .join(postings, "term")
        .join(doc_stats, "id")
    )
    dl = F.col("dl").cast("double")
    tf = F.col("tf").cast("double")
    norm = F.lit(k1) * (F.lit(1 - b) + F.lit(b) * dl / F.lit(avgdl))
    contrib = idf * (tf * (k1 + 1)) / (tf + norm)
    scored = (
        matched.select(
            "query_id",
            "id",
            F.round(contrib * 1e6).cast("long").alias("c_micro"),
        )
        .groupBy("query_id", "id")
        .agg(F.sum("c_micro").alias("s_micro"))
        .where(F.col("s_micro") > 0)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("s_micro").desc(), F.col("id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "id",
            (F.col("s_micro") / 1e6).alias("score"),
        )
    )

"""Distributed n-gram language-model scoring for corpus quality.

The CCNet/KenLM pattern from public LLM-data pipelines (Wenzek et al.
2020): score every document by its negative log-likelihood under a
language model trained on the corpus itself (or a trusted reference
corpus) and keep the low-perplexity tail. No reference counterpart (the
reference is a geospatial engine) — LLM-pipeline lane.

Spark-first shape, no UDFs anywhere:

1. tokenize once into an array column (materialized — per the repo-wide
   rule that higher-order-function lambdas re-evaluate per element);
2. bigram instances via ``zip_with(slice, slice)`` + ``explode`` — a
   map-side transform;
3. context counts ``c1(w1)``, pair counts ``c12(w1, w2)`` — two hash
   aggregates on token keys (map-side combined);
4. add-k smoothed conditional ``p = (c12 + k) / (c1 + k·V)`` joined back
   onto the bigram instances — an equi-join on the bigram key, then one
   per-doc aggregate.

At 100 TB: tokens/bigrams shuffle as (hashable, short) strings, the
count relations are vocabulary-sized (≪ corpus), and AQE broadcasts the
count sides when they fit. V (vocab size) is the only driver-side
scalar — a single count, centroid-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per bigram INSTANCE (multiplicity kept)."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != "",
    )
    with_toks = df.select(id_col, toks.alias("__toks")).where(
        F.size("__toks") >= 2
    )
    n = F.size("__toks")
    pairs = F.zip_with(
        F.slice("__toks", 1, n - 1),
        F.slice("__toks", 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return with_toks.select(
        id_col, F.explode(pairs).alias("__bg")
    ).select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))


def bigram_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
    train_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean negative log-likelihood under an add-k-smoothed
    bigram model: ``nll = avg(-ln((c12 + k) / (c1 + k·V)))`` over the
    document's bigram instances (perplexity = exp(nll)).

    ``train_df`` lets the model train on a different (trusted) corpus
    than the one being scored — the CCNet arrangement; default is
    self-scoring. ``c1(w)`` counts occurrences of ``w`` as a bigram
    context, so each conditional distribution sums to 1 over the vocab.

    Returns (id, n_bigrams, nll) — documents with < 2 tokens are absent
    (no bigram evidence; callers treat missing as unscorable).
    """
    scored = _doc_bigrams(df, id_col, text_col)
    train = (
        scored
        if train_df is None
        else _doc_bigrams(train_df, id_col, text_col)
    )
    # ONE corpus-scale aggregate: c12. The context counts and the vocab
    # both derive from the (vocabulary-sized) c12 relation — c1(w) =
    # Σ_w2 c12(w, w2), vocab = distinct keys of either side — so the
    # bigram instances shuffle exactly once however large the corpus is.
    c12 = train.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        c12.select(F.col("w1").alias("w"))
        .union(c12.select(F.col("w2").alias("w")))
        .distinct()
        .count()
    )
    # cross-corpus scoring joins pair counts and context counts
    # SEPARATELY: an unseen pair under a SEEN context must get the add-k
    # floor k/(c1 + k·V) of that context's distribution — coalescing the
    # whole conditional to 1/V would hand unseen pairs under frequent
    # contexts MORE mass than rare seen pairs (inverting the quality
    # signal) and break per-context normalization. Unseen context:
    # c12 = c1 = 0 -> k/(k·V) = 1/V, the uniform floor.
    joined = (
        scored.join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .select(
            id_col,
            (
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(k))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k * vocab))
            ).alias("__p"),
        )
    )
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.avg(-F.log("__p")).alias("nll"),
    )

"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting.

Everything here is pure Spark SQL expressions (codegen, no Python), so a
100 TB corpus pass is a single scan with map-side-only work — no shuffle at
all for per-document scores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process

# language marker words (synthetic-corpus-friendly heuristic; the point is a
# deterministic, SQL-expressible n-gram/stopword vote, not linguistics)
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "nicht", "das"],
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "los", "que", "y"],
    "fr": ["le", "les", "des", "et", "est"],
    "zh": ["de", "shi", "le", "bu", "wo"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


@process
def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish refinement: punctuation splits are
    already whitespace-separated in this corpus)."""
    return F.size(tokens(text))


@process
def char_count(text: Column) -> Column:
    return F.length(text)


@process
def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\w\s]", "")
    return (F.length(text) - F.length(stripped)) / F.greatest(
        F.length(text), F.lit(1)
    )


def _in_list(word: Column, words: list[str]) -> Column:
    """Membership test usable inside higher-order-function lambdas.

    ``Column.isin`` inside an ``F.filter`` lambda hits a Spark type-coercion
    bug (the lambda variable coerces the IN list to BIGINT and the cast
    blows up under ANSI) — ``array_contains`` against a literal array
    resolves types correctly and stays codegen'd.
    """
    return F.array_contains(F.array(*[F.lit(w) for w in words]), word)


@process
def stopword_ratio(text: Column) -> Column:
    toks = tokens(F.lower(text))
    n_stop = F.size(F.filter(toks, lambda w: _in_list(w, STOPWORDS)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


@process
def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
    )
    return total / F.greatest(F.size(toks), F.lit(1))


@process
def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + word-length band +
    low punctuation + some stopwords (C4/Gopher-rule flavored)."""
    n_tok = token_count(text).cast("double")
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), 1.0).otherwise(0.0)
    mwl = mean_word_length(text)
    mwl_ok = F.when((mwl >= 2) & (mwl <= 12), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) <= 0.2, 1.0).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(text) >= 0.01, 1.0).otherwise(0.0)
    return (len_ok + mwl_ok + punct_ok + stop_ok) / F.lit(4.0)


@process
def language_id(text: Column) -> Column:
    """Marker-word vote; argmax with lexicographic tie-break (deterministic,
    replicable in ANSI SQL for the oracle)."""
    toks = tokens(F.lower(text))

    # NB: a `lambda w, ms=markers:` default-arg closure breaks here —
    # PySpark's higher-order-function wrapper introspects the signature and
    # binds a lambda variable per parameter, so `ms` would become a Column.
    def marker_filter(ms):
        return lambda w: _in_list(w, ms)

    scores = [
        F.struct(
            F.size(F.filter(toks, marker_filter(markers))).alias("score"),
            # negative-lexicographic tie-break: greatest() picks the max
            # struct, so invert the lang ordering via a fixed rank
            F.lit(-i).alias("rank"),
            F.lit(lang).alias("lang"),
        )
        for i, (lang, markers) in enumerate(sorted(LANG_MARKERS.items()))
    ]
    return F.greatest(*scores).getField("lang")


@process
def doc_fingerprint(text: Column) -> Column:
    """Whole-document fingerprint: md5 of whitespace-normalized lowercase
    text. Stable across runs/engines (md5 exists in Spark and DuckDB)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


def shingles_from_tokens(toks: Column, n: int = 5) -> Column:
    """Word n-gram shingles from an ALREADY-MATERIALIZED token array column.

    Performance contract: ``toks`` must be a plain column reference, not an
    inline ``split(...)`` expression — Spark re-evaluates lambda-captured
    subexpressions per array element, turning an inlined split into
    O(tokens²) regex work per document (measured ~30× slowdown on the
    documents table). Materialize tokens with a select first.
    """
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def shingles(text: Column, n: int = 5) -> Column:
    """Word n-gram shingles as strings (empty array when < n tokens).
    Prefer tokenizing into a materialized column + ``shingles_from_tokens``
    in hot paths (see its performance contract)."""
    return shingles_from_tokens(tokens(F.lower(text)), n)


@process
def min_shingle_fingerprint(text: Column, n: int = 5) -> Column:
    """Winnowing-flavored fingerprint: lexicographic min of the md5s of the
    word n-gram shingles (falls back to the whole-doc fingerprint for short
    docs). One expression, no shuffle."""
    sh = shingles(text, n)
    return F.coalesce(
        F.array_min(F.transform(sh, F.md5)), doc_fingerprint(text)
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach all per-document scores in one projection."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("n_tokens"),
        char_count(t).alias("n_chars_computed"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t).alias("stopword_ratio"),
        mean_word_length(t).alias("mean_word_len"),
        quality_score(t).alias("quality"),
        language_id(t).alias("lang_pred"),
        doc_fingerprint(t).alias("fingerprint"),
    )


def tfidf_top_terms(
    df, id_col: str, text_col: str, k: int = 5, min_df: int = 1
):
    """Top-``k`` terms per document by TF-IDF — corpus-level keyword
    extraction (document profiling / topic heuristics in training-data
    curation).

    tf = in-document term count; idf = ln(N / df) with df = number of
    documents containing the term. Deterministic ties: 6-decimal score
    DESC, then term ASC.

    Plan at 100 TB: one tokenize+explode, ONE (id, term) hash aggregate
    (tf), one term-keyed aggregate (df — output is vocabulary-sized, tiny
    vs corpus), a broadcast-joinable df table back onto tf, and a
    row_number ≤ k filter that compiles to WindowGroupLimit — map tasks
    forward at most k rows per document before the final exchange. Terms
    shuffle as strings once; documents never shuffle whole.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from openeo_processes_dask_spark.training.dedup import _spread

    n_docs = df.count()
    tok = _spread(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t__"))
    ).select("id", F.explode(tokens(F.lower(F.col("__t__")))).alias("term"))
    tf = tok.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
    )
    # AQE picks broadcast when the vocabulary is small; a web-scale
    # vocabulary (100M+ terms) shuffle-joins on the term key instead
    scored = tf.join(dfreq, "term").select(
        "id",
        "term",
        (
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("df"))
        ).alias("tfidf"),
    )
    # rank over the ROUNDED score: two terms can tie mathematically
    # (tf1*ln(N/df1) == tf2*ln(N/df2)) while the doubles differ in the
    # last ulp per engine — ranking the 6-decimal value with a term
    # tiebreak keeps the order (and the oracle compare) deterministic
    scored = scored.withColumn("tfidf", F.round("tfidf", 6))
    w = Window.partitionBy("id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("id", "term", "rank", "tfidf")
    )


def corpus_stats(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Per-slice corpus report — the dataset card every training run
    starts from: document and token counts plus exact interpolated length
    quantiles per (source, language) slice.

    One hash aggregate over (group_cols); lengths are computed in the
    scan projection so the shuffle carries two ints per row, never text.
    ``percentile`` is Spark's exact interpolated percentile — the same
    definition as DuckDB/Postgres ``quantile_cont``, which keeps the
    oracle comparison exact (the approx sketch would not be).  Exact
    percentile holds the GROUP's values, so this is safe when slices fit
    an executor (thousands of sources x a length column); for heavier
    cardinalities swap in approx_percentile and drop the oracle to
    rows-only.
    """
    lens = df.select(
        *group_cols,
        F.length(F.col(text_col)).cast("long").alias("__chars"),
        token_count(F.col(text_col)).cast("long").alias("__toks"),
    )
    return lens.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__toks").alias("total_tokens"),
        F.round(F.avg("__chars"), 6).alias("mean_chars"),
        F.percentile("__chars", F.lit(0.5)).alias("p50_chars"),
        F.percentile("__chars", F.lit(0.9)).alias("p90_chars"),
    )


def corpus_rollup(
    df: DataFrame,
    dims: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Hierarchical corpus telemetry: doc/char/token totals at EVERY
    prefix level of ``dims`` — per (source, lang), per source, and the
    grand total — in ONE pass via ``ROLLUP`` grouping sets. This is the
    dataset-card rollup a mixture-weights dashboard reads: the same
    numbers :func:`corpus_stats` gives for the leaf slices, plus every
    subtotal, without re-scanning per level.

    Returns ``dims... , n_docs, total_chars, total_tokens, gid`` where
    ``gid`` is the grouping id (0 = leaf row, bit set = that dim is
    rolled up — Spark ``grouping_id()`` and DuckDB ``GROUPING()`` use
    the same leftmost-is-most-significant convention, verified in the
    gate). ``gid`` disambiguates a genuine NULL dim value from a
    subtotal row.

    Plan at 100 TB: lengths are computed in the scan projection so the
    shuffle carries three ints per row; ROLLUP compiles to a single
    Expand + hash aggregate with map-side partial combine — (levels)x
    the aggregate state of the leaf groupBy, never a second corpus scan.
    """
    lens = df.select(
        *dims,
        F.length(F.col(text_col)).cast("long").alias("__chars"),
        token_count(F.col(text_col)).cast("long").alias("__toks"),
    )
    return lens.rollup(*dims).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__chars").alias("total_chars"),
        F.sum("__toks").alias("total_tokens"),
        F.grouping_id().cast("long").alias("gid"),
    )


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    k: int = 1000,
    min_count: int = 1,
    id_col: str | None = None,
) -> DataFrame:
    """Corpus vocabulary: global top-``k`` terms by total count with
    document frequency — the table a tokenizer-training or stopword-
    mining pass starts from.

    Returns (rank, term, n_total, n_docs), rank 1-based, deterministic
    ties (count DESC, term ASC).

    Plan: one (term) hash aggregate (partial map-side combine makes the
    shuffle vocabulary-sized, not token-sized), then a global top-k that
    compiles to TakeOrderedAndProject — every partition forwards at most
    k rows, no full sort. The rank projection windows over the already-
    k-sized result."""
    from pyspark.sql import Window

    rid = (
        F.col(id_col) if id_col else F.monotonically_increasing_id()
    )
    agg = (
        df.select(
            rid.alias("__rid"),
            tokens(F.lower(F.col(text_col))).alias("toks"),
        )
        .select("__rid", F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.countDistinct("__rid").alias("n_docs"),
        )
        .where(F.col("n_total") >= min_count)
    )
    topk = agg.orderBy(F.col("n_total").desc(), F.col("term")).limit(k)
    w = Window.orderBy(F.col("n_total").desc(), F.col("term"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "term", "n_total", "n_docs"
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 ranked retrieval over the corpus for one bag-of-terms
    query — the classic lexical search a curation pipeline uses to find
    topic-relevant documents (idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
    the Lucene-style always-positive form).

    Returns (rank, id, score) for the global top-k, deterministic ties
    (6-decimal score DESC, id ASC).

    Plan at 100 TB: the query is literal, so per-document term counts are
    ONE codegen'd projection over the token array (no explode, no join
    for scoring); df counts for the |query| terms are one tiny aggregate
    collected to the driver (|query| numbers) and inlined as literals;
    the global top-k compiles to TakeOrderedAndProject. One scan + one
    scalar subquery-free pass."""
    from pyspark.sql import Window

    terms = sorted(set(t.lower() for t in query_terms))
    # r14 (guide §2.4/§6, the r13 change-18 class): the corpus arrives
    # as one scan partition at fixture scale, and BOTH passes below
    # (the df-stats aggregate and the scoring projection) chain the
    # tokenize directly onto the scan — spread it so neither pass runs
    # single-task. Keyless: the stats are exact-integer/sub-2^53 sums
    # (order-independent) and scoring is per-row; a no-op at scale.
    from openeo_processes_dask_spark.training.dedup import _spread

    base = _spread(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t__"))
    ).select("id", tokens(F.lower(F.col("__t__"))).alias("w"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size("w")).alias("avgdl"),
        *[
            F.sum(
                F.when(F.array_contains("w", t), 1).otherwise(0)
            ).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    ).first()
    n_docs, avgdl = stats["n"], float(stats["avgdl"] or 1.0)
    if not n_docs:
        # empty corpus: empty (rank, id, score) result with the schema
        return base.select(
            F.lit(1).alias("rank"), "id", F.lit(0.0).alias("score")
        ).where(F.lit(False))
    import math as _m

    idf = [
        _m.log(1.0 + (n_docs - stats[f"df_{i}"] + 0.5) / (stats[f"df_{i}"] + 0.5))
        for i in range(len(terms))
    ]
    dl = F.size("w").cast("double")
    norm = F.lit(k1) * (F.lit(1 - b) + F.lit(b) * dl / F.lit(avgdl))
    score = None
    for i, t in enumerate(terms):
        # factory + _in_list: a default-arg closure (lambda x, t=t: ...)
        # makes PySpark bind t as a lambda VARIABLE (see language_id's
        # marker_filter note), and a bare == inside the lambda hits the
        # lambda type-coercion bug (see _in_list)
        def _tf_filter(term):
            return lambda x: _in_list(x, [term])

        tf = F.size(F.filter(F.col("w"), _tf_filter(t))).cast("double")
        term = F.lit(idf[i]) * (tf * (k1 + 1)) / (tf + norm)
        score = term if score is None else (score + term)
    scored = base.select(
        "id", F.round(score, 6).alias("score")
    ).where(F.col("score") > 0)
    topk = scored.orderBy(F.col("score").desc(), F.col("id")).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "id", "score"
    )


def token_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon entropy (nats) of the whitespace-token
    distribution — the standard gibberish/keyword-stuffing signal next
    to the repetition ratios: natural prose sits in a band, while
    single-token spam (H→0) and random-string noise (H→ln n) fall out
    of it. CCNet/RedPajama-class pipelines threshold exactly this.

    Returns ``(doc_id, n_tokens, n_distinct, entropy)`` for documents
    with at least one token (empty/whitespace-only docs drop out);
    ``entropy = ln(n) - sum(c·ln c)/n`` over per-token counts ``c``,
    rounded to 6 decimals (the repo's float-output convention — absorbs
    libm/summation-order ulps, cf. bm25_topk).

    Plan at 100 TB: explode to (doc, token) → ONE hash aggregate keyed
    (doc, token) → ONE keyed by doc — the token_count/vocabulary shape;
    map-side partial aggregation absorbs within-doc repetition before
    the shuffle, and no text beyond single tokens ever moves.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    counts = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias(
            "clogc"
        ),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(
            F.log(F.col("n_tokens").cast("double"))
            - F.col("clogc") / F.col("n_tokens"),
            6,
        ).alias("entropy"),
    )


def chunk_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window document chunking — the context-window splitter of
    RAG indexing and long-document training prep. Emits
    (id, chunk_id, n_tokens, chunk) with chunks of ``chunk_tokens``
    whitespace tokens starting every ``chunk_tokens - overlap`` tokens.
    A trailing start is kept only while it still covers unseen tokens
    (``start < n - overlap``), so no chunk is a strict subset of its
    predecessor. Empty documents emit nothing.

    Pure Column expressions: token array once, one ``sequence`` +
    ``explode`` fan-out, per-chunk ``slice`` — map-only over the scan,
    no shuffle, no UDF; chunk count per doc is ceil((n - overlap) /
    step), so output size is input-token-bound exactly like the
    segment-dedup explode."""
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})"
        )
    step = chunk_tokens - overlap
    toks = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("w")
    ).withColumn("n", F.size("w")).where(F.col("n") > 0)
    starts = F.filter(
        F.sequence(F.lit(0), F.col("n") - 1, F.lit(step)),
        lambda s: (s == 0) | (s < F.col("n") - F.lit(overlap)),
    )
    return (
        toks.select(
            "id", "w", F.posexplode(starts).alias("chunk_id", "start")
        )
        .select(
            "id",
            "chunk_id",
            F.slice(
                F.col("w"), F.col("start") + 1, F.lit(chunk_tokens)
            ).alias("ck"),
        )
        .select(
            "id",
            "chunk_id",
            F.size("ck").alias("n_tokens"),
            F.array_join("ck", " ").alias("chunk"),
        )
    )


def source_divergence(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (nats) between the unigram
    token distributions of corpus slices — the mixing/drift telemetry a
    curation pipeline watches: a crawl source whose JS against its own
    history jumps has changed character; two sources with near-zero JS
    are redundant in the mix.

    Returns ``(g1, g2, n_tokens_1, n_tokens_2, js)`` for every ordered
    pair g1 < g2 of distinct ``group_col`` values; js in [0, ln 2],
    rounded to 6 decimals (the float-output convention — probabilities
    are exact rationals c/n, only the log/sum tail is float).

    Plan at 100 TB: token counts per (group, token) — ONE hash aggregate
    with map-side combine — then the pair×token term relation is built
    by joining the per-group count relation to the (tiny, broadcast)
    group-pair relation and full-outer-matching the two sides token by
    token via a shuffle on token. Cost scales with |pairs| × vocab, not
    corpus size; the number of slices is assumed dashboard-small (it is
    a GROUP list), which is the documented contract.
    """
    toks = df.select(
        F.col(group_col).alias("g"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    counts = toks.groupBy("g", "tok").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("g").agg(F.sum("c").cast("long").alias("n"))
    groups = totals.select("g", "n")
    pairs = (
        groups.alias("ga")
        .join(groups.alias("gb"), F.col("ga.g") < F.col("gb.g"))
        .select(
            F.col("ga.g").alias("g1"),
            F.col("gb.g").alias("g2"),
            F.col("ga.n").alias("n1"),
            F.col("gb.n").alias("n2"),
        )
    )
    c1 = counts.select(
        F.col("g").alias("g1"), "tok", F.col("c").alias("c1")
    )
    c2 = counts.select(
        F.col("g").alias("g2"), "tok", F.col("c").alias("c2")
    )
    # full outer on token within each pair: union of each side's tokens,
    # then left joins pick up the counts (absent -> 0)
    tok_union = (
        c1.join(F.broadcast(pairs.select("g1", "g2")), "g1")
        .select("g1", "g2", "tok")
        .unionByName(
            c2.join(F.broadcast(pairs.select("g1", "g2")), "g2").select(
                "g1", "g2", "tok"
            )
        )
        .distinct()
    )
    terms = (
        tok_union.join(c1, ["g1", "tok"], "left")
        .join(c2, ["g2", "tok"], "left")
        .join(F.broadcast(pairs), ["g1", "g2"])
        .select(
            "g1",
            "g2",
            "n1",
            "n2",
            (F.coalesce(F.col("c1"), F.lit(0)).cast("double") / F.col("n1")).alias("p"),
            (F.coalesce(F.col("c2"), F.lit(0)).cast("double") / F.col("n2")).alias("q"),
        )
        .select(
            "g1",
            "g2",
            "n1",
            "n2",
            (
                F.when(
                    F.col("p") > 0,
                    F.lit(0.5)
                    * F.col("p")
                    * F.log(F.lit(2.0) * F.col("p") / (F.col("p") + F.col("q"))),
                ).otherwise(F.lit(0.0))
                + F.when(
                    F.col("q") > 0,
                    F.lit(0.5)
                    * F.col("q")
                    * F.log(F.lit(2.0) * F.col("q") / (F.col("p") + F.col("q"))),
                ).otherwise(F.lit(0.0))
            ).alias("term"),
        )
    )
    return (
        terms.groupBy("g1", "g2")
        .agg(
            F.max("n1").alias("n_tokens_1"),
            F.max("n2").alias("n_tokens_2"),
            F.round(F.sum("term"), 6).alias("js"),
        )
    )

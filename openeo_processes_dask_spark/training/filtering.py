"""Corpus quality filtering: Gopher-style repetition statistics and
rule-based keep/drop decisions for training-data curation.

The repetition rules from Gopher (Rae et al. 2021, table A1) and the C4
heuristics are per-document predicates, so the 100 TB plan must be a
single scan with map-side-only work — no shuffle, no state. The naive
implementation (explode n-grams, groupBy(doc_id, gram), count) keys a
corpus-sized shuffle on doc_id; instead every statistic here is computed
inside one projection:

  tokens -> n-grams -> array_sort -> one F.aggregate fold over the
  sorted array (equal grams are adjacent, so duplicate counts and the
  top-gram coverage fall out of run-length tracking).

The fold returns integer counts (occurrences / characters), not
fractions, so the DuckDB oracle (a plain unnest + GROUP BY twin) matches
bit-for-bit with no rounding convention.

No counterpart in the reference (an EO raster engine); this implements
the LLM-pipeline lane of the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openeo_processes_dask_spark.training.textanalysis import (
    STOPWORDS,
    _in_list,
    shingles_from_tokens,
    tokens,
)

# ---------------------------------------------------------------------------
# n-gram repetition statistics (Gopher table A1 family)
# ---------------------------------------------------------------------------

_STATS_FIELDS = "top_run", "top_chars", "dup_occ", "dup_chars", "tot_chars"


def _ngram_stats(sorted_grams: Column) -> Column:
    """One fold over an ALREADY-SORTED, ALREADY-MATERIALIZED gram array ->
    struct(top_run, top_chars, dup_occ, dup_chars, tot_chars).

    - top_run:   occurrences of the most frequent gram
    - top_chars: max over grams of occurrences * length(gram) — the
                 character coverage of the dominant gram
    - dup_occ:   gram occurrences belonging to grams seen more than once
    - dup_chars: characters in those duplicated occurrences
    - tot_chars: characters across all gram occurrences

    Sorting makes equal grams adjacent, so duplicate accounting is pure
    run-length tracking: when a run reaches length 2 it contributes both
    occurrences (the first retroactively), afterwards one each — no
    end-of-run flush, and the lambda touches only (acc, w), so nothing
    is re-evaluated per element (see shingles_from_tokens' performance
    contract).

    Performance contract: pass a plain column reference to the sorted
    array (materialize with a select first), never an inline
    array_sort(transform(...)) expression.
    """
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit("").alias("prev"),
        zero.alias("run"),
        zero.alias("top_run"),
        zero.alias("top_chars"),
        zero.alias("dup_occ"),
        zero.alias("dup_chars"),
        zero.alias("tot_chars"),
    )

    def merge(acc: Column, w: Column) -> Column:
        same = (acc.getField("run") > 0) & (w == acc.getField("prev"))
        run = F.when(same, acc.getField("run") + 1).otherwise(F.lit(1).cast("long"))
        wlen = F.length(w).cast("long")
        # a run reaching 2 retroactively counts its first occurrence too
        dup_inc = F.when(
            same, F.when(run == 2, F.lit(2)).otherwise(F.lit(1)).cast("long")
        ).otherwise(zero)
        return F.struct(
            w.alias("prev"),
            run.alias("run"),
            F.greatest(acc.getField("top_run"), run).alias("top_run"),
            F.greatest(acc.getField("top_chars"), run * wlen).alias("top_chars"),
            (acc.getField("dup_occ") + dup_inc).alias("dup_occ"),
            (acc.getField("dup_chars") + dup_inc * wlen).alias("dup_chars"),
            (acc.getField("tot_chars") + wlen).alias("tot_chars"),
        )

    def finish(acc: Column) -> Column:
        return F.struct(
            *[acc.getField(f).alias(f) for f in _STATS_FIELDS]
        )

    return F.aggregate(sorted_grams, init, merge, finish)


def ngram_repetition(
    df: DataFrame, n: int = 2, text_col: str = "text", prefix: str | None = None
) -> DataFrame:
    """Attach the word n-gram repetition counters to every row.

    Adds ``{prefix}top_run/top_chars/dup_occ/dup_chars/tot_chars/n_grams``
    (prefix defaults to ``g{n}_``). All integers; divide downstream for
    the Gopher fractions (top_chars/tot_chars vs the 0.20/0.18/0.16
    thresholds for n=2/3/4; dup_chars/tot_chars vs 0.15…0.10 for
    n=5…10). Single projection chain, zero shuffle.
    """
    p = f"g{n}_" if prefix is None else prefix
    toks = df.select("*", tokens(F.lower(F.col(text_col))).alias("__toks__"))
    grams = toks.select(
        "*", F.array_sort(shingles_from_tokens(F.col("__toks__"), n)).alias("__sg__")
    )
    stats = grams.select(
        "*", _ngram_stats(F.col("__sg__")).alias("__st__"), F.size("__sg__").alias(p + "n_grams")
    )
    out = stats.select(
        "*", *[F.col("__st__").getField(f).alias(p + f) for f in _STATS_FIELDS]
    )
    return out.drop("__toks__", "__sg__", "__st__")


# ---------------------------------------------------------------------------
# word-level statistics + Gopher rule set
# ---------------------------------------------------------------------------


def word_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach n_words, n_distinct_words, n_alpha_words, n_stopwords —
    the word-level inputs to the Gopher quality rules. One projection,
    zero shuffle; every count is an integer (exact oracle)."""
    toks_df = df.select("*", tokens(F.lower(F.col(text_col))).alias("__toks__"))
    t = F.col("__toks__")
    out = toks_df.select(
        "*",
        F.size(t).alias("n_words"),
        F.size(F.array_distinct(t)).alias("n_distinct_words"),
        F.size(F.filter(t, lambda w: w.rlike("[a-z]"))).alias("n_alpha_words"),
        F.size(F.filter(t, lambda w: _in_list(w, STOPWORDS))).alias("n_stopwords"),
        F.aggregate(
            t, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).alias("word_chars"),
    )
    return out.drop("__toks__")


def gopher_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_ratio: float = 0.8,
    min_stopwords: int = 2,
    max_top_2gram_frac: float = 0.20,
    max_dup_5gram_frac: float = 0.15,
) -> DataFrame:
    """Attach one boolean per Gopher rule plus the combined ``keep``.

    Rules (Gopher table A1, thresholds overridable): word-count band,
    mean-word-length band, >=80 % words alphabetic, >=2 stopwords,
    dominant word 2-gram covers <=20 % of gram characters, duplicated
    5-grams cover <=15 %. Emitting per-rule flags (not just the filter)
    is what a curation pipeline audits: rule hit-rates per source/shard.

    Plan: still one scan — the three projections (words, 2-grams,
    5-grams) chain map-side; nothing shuffles.
    """
    out = word_stats(df, text_col)
    out = ngram_repetition(out, 2, text_col)
    out = ngram_repetition(out, 5, text_col)
    nw = F.col("n_words").cast("double")
    mwl = F.try_divide(F.col("word_chars"), nw)
    rules = {
        "ok_words": (nw >= min_words) & (nw <= max_words),
        "ok_word_len": (mwl >= min_mean_word_len) & (mwl <= max_mean_word_len),
        "ok_alpha": F.try_divide(F.col("n_alpha_words"), nw) >= min_alpha_ratio,
        "ok_stopwords": F.col("n_stopwords") >= min_stopwords,
        "ok_top2gram": F.coalesce(
            F.try_divide(F.col("g2_top_chars"), F.col("g2_tot_chars"))
            <= max_top_2gram_frac,
            F.lit(True),  # < n tokens: no grams, rule vacuously passes
        ),
        "ok_dup5gram": F.coalesce(
            F.try_divide(F.col("g5_dup_chars"), F.col("g5_tot_chars"))
            <= max_dup_5gram_frac,
            F.lit(True),
        ),
    }
    out = out.select(
        "*", *[c.alias(name) for name, c in rules.items()]
    )
    keep = F.lit(True)
    for name in rules:
        keep = keep & F.col(name)
    return out.withColumn("keep", keep)


def gopher_filter(df: DataFrame, text_col: str = "text", **thresholds) -> DataFrame:
    """Rows passing every Gopher rule, original schema preserved."""
    flagged = gopher_flags(df, text_col, **thresholds)
    return flagged.where(F.col("keep")).select(*df.columns)


def repetition_removal(
    df: DataFrame,
    text_col: str = "text",
    n: int = 5,
    max_dup_frac: float = 0.3,
) -> DataFrame:
    """Drop documents whose duplicated word n-grams cover more than
    ``max_dup_frac`` of gram characters (boilerplate / template spam).
    The single-rule fast path of gopher_filter — one scan, no shuffle."""
    flagged = ngram_repetition(df, n, text_col, prefix="__r_")
    frac = F.try_divide(F.col("__r_dup_chars"), F.col("__r_tot_chars"))
    return flagged.where(F.coalesce(frac <= max_dup_frac, F.lit(True))).select(
        *df.columns
    )


def strip_markup(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
) -> DataFrame:
    """HTML/XML-ish markup stripping — the extraction step UPSTREAM of
    :func:`c4_clean` in a web-crawl pipeline (a trafilatura-lite for
    corpora whose text still carries tags): delete ``<...>`` tags,
    decode the six ubiquitous character entities, collapse whitespace
    runs, trim. Deliberately regex-only with no backreferences or
    lookarounds (the repo's pii.py convention) so the SAME pattern
    strings run identically on Java regex and the RE2-style oracle.

    Decode order matters and is the standard one: ``&amp;`` is decoded
    LAST so double-escaped entities survive one level
    (``&amp;lt;`` -> ``&lt;``, not ``<``) — the behavior every HTML
    entity decoder specifies.

    One chained codegen'd projection — map-only scan at 100 TB, no
    UDF, no shuffle."""
    out_col = out_col or text_col
    c = F.regexp_replace(F.col(text_col), r"<[^>]*>", " ")
    for ent, rep in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),  # LAST: preserves one level of double-escaping
    ):
        c = F.regexp_replace(c, ent, rep)
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.withColumn(out_col, c)


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_line_words: int = 3,
    line_markers: tuple = ("javascript", "cookie policy"),
    out_col: str = "clean_text",
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2, the public
    C4 recipe; no reference counterpart — LLM-pipeline lane): keep only
    lines that end in terminal punctuation AND have >= ``min_line_words``
    words AND carry none of the ``line_markers`` substrings; append the
    surviving lines as ``out_col`` plus bookkeeping columns
    ``n_lines_kept`` / ``n_lines_total`` and doc-level flags
    ``has_brace`` / ``has_lorem`` (C4 drops those documents wholesale).

    One codegen'd projection: split -> array filter (JVM higher-order
    function over the line array, simple predicates only) -> array_join.
    No UDF, no shuffle — a map-only scan at 100 TB.
    """
    lines = F.split(F.col(text_col), r"\n")

    def keep_line(ln: Column) -> Column:
        t = F.trim(ln)
        cond = t.rlike(r"[.!?\"']$") & (
            F.size(F.split(t, r"\s+")) >= min_line_words
        )
        for marker in line_markers:
            cond = cond & ~F.lower(t).contains(marker.lower())
        return cond

    kept = F.filter(lines, keep_line)
    return (
        df.withColumn("n_lines_total", F.size(lines))
        .withColumn(out_col, F.array_join(kept, "\n"))
        .withColumn("n_lines_kept", F.size(kept))
        .withColumn("has_brace", F.col(text_col).contains("{"))
        .withColumn("has_lorem", F.lower(F.col(text_col)).contains("lorem ipsum"))
    )


def c4_filter(
    df: DataFrame,
    text_col: str = "text",
    min_lines: int = 3,
    **clean_kwargs,
) -> DataFrame:
    """The document-level C4 gate over :func:`c4_clean`: drop documents
    with fewer than ``min_lines`` surviving lines, a ``{`` (code), or
    "lorem ipsum" (placeholder), and return the cleaned text in place of
    the original. Original column set preserved."""
    cleaned = c4_clean(df, text_col, out_col="__c4_text", **clean_kwargs)
    kept = cleaned.where(
        (F.col("n_lines_kept") >= min_lines)
        & ~F.col("has_brace")
        & ~F.col("has_lorem")
    )
    return kept.withColumn(text_col, F.col("__c4_text")).select(*df.columns)

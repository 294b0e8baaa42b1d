"""PII detection and redaction over document tables.

A standard stage of a large-scale training-data pipeline (alongside
dedup/quality filtering — no reference counterpart; the reference is a
geospatial engine): find and mask emails, phone numbers, IPv4 addresses
and SSN-shaped identifiers BEFORE the text ships into a training corpus.

Spark-first design: every detector is a single ``regexp_count`` /
``regexp_replace`` Column expression — pure JVM, whole-stage codegen, no
UDF, no shuffle; at 100 TB this runs as a map-only scan at parquet read
speed. The patterns deliberately avoid backreferences and lookarounds so
the same pattern string runs identically on Java regex (Spark) and RE2
(DuckDB oracle) — cross-engine verifiability is part of the contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: detector name -> (pattern, redaction token). Order matters for
#: redaction: SSN before phone (both are digit-dash shapes; SSN's
#: 3-2-4 grouping must not be half-eaten by the looser phone pattern),
#: IP before phone (dotted quads contain phone-like digit runs).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    "phone": (r"\b\+?\d{3}[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
}


def pii_counts(text: Column, kinds: tuple[str, ...] | None = None) -> dict:
    """Per-kind match-count Columns for ``text`` (codegen'd, no UDF)."""
    kinds = kinds or tuple(PII_PATTERNS)
    return {
        kind: F.regexp_count(text, F.lit(PII_PATTERNS[kind][0]))
        for kind in kinds
    }


def pii_stats(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] | None = None,
) -> DataFrame:
    """Append ``pii_<kind>`` count columns and a ``pii_total`` — the
    audit pass that decides which documents need redaction (or exclusion)
    without rewriting any text. Map-only; no shuffle."""
    kinds = kinds or tuple(PII_PATTERNS)
    out = df
    for kind, col in pii_counts(F.col(text_col), kinds).items():
        out = out.withColumn(f"pii_{kind}", col)
    total = None
    for kind in kinds:
        c = F.col(f"pii_{kind}")
        total = c if total is None else total + c
    return out.withColumn("pii_total", total)


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Replace every PII match with its bracket token ([EMAIL], [IP],
    [SSN], [PHONE]) — chained ``regexp_replace``, one codegen'd projection
    over the corpus. Detector order follows PII_PATTERNS (module note).
    Writes ``out_col`` (default: overwrite ``text_col``)."""
    kinds = kinds or tuple(PII_PATTERNS)
    col: Column = F.col(text_col)
    for kind in PII_PATTERNS:  # canonical order regardless of input order
        if kind not in kinds:
            continue
        pat, token = PII_PATTERNS[kind]
        col = F.regexp_replace(col, pat, token)
    return df.withColumn(out_col or text_col, col)


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    sensitive_col: str | None = None,
) -> DataFrame:
    """Annotate every row with its quasi-identifier equivalence-class
    statistics — the standard re-identification audit (Sweeney 2002,
    "k-anonymity: a model for protecting privacy") a training-data
    pipeline runs alongside PII redaction: redaction hides DIRECT
    identifiers, but a row whose (quasi-identifier) combination is shared
    by fewer than ``k`` rows is re-identifiable by linkage even with
    every email/SSN masked.

    Appends ``class_size`` (rows sharing this row's exact quasi tuple,
    NULLs matching NULLs) and ``suppressed`` (class_size < k). With
    ``sensitive_col`` also appends ``distinct_sensitive`` — the class's
    l-diversity (Machanavajjhala et al. 2007): a class can be k-anonymous
    yet leak the sensitive value when all k rows share it.

    Plan at 100 TB: one hash aggregate on the quasi key (map-side
    partial combine — class count is bounded by the quasi-value
    cross-product, not the corpus), then an equi-join back on the same
    key; AQE broadcasts the class table when it is small. Deliberately
    NOT a window: a window over the quasi key carries every row through
    the exchange with no partial aggregation.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not quasi_cols:
        raise ValueError("k_anonymity needs at least one quasi column")
    missing = [c for c in quasi_cols if c not in df.columns]
    if missing:
        raise ValueError(f"quasi columns not in DataFrame: {missing}")
    clash = {"class_size", "suppressed", "distinct_sensitive"} & set(
        df.columns
    )
    if clash:
        raise ValueError(
            f"input already has audit column(s) {sorted(clash)}; "
            "rename them before calling k_anonymity"
        )
    aggs = [F.count(F.lit(1)).alias("class_size")]
    if sensitive_col is not None:
        if sensitive_col not in df.columns:
            raise ValueError(
                f"sensitive column not in DataFrame: {sensitive_col!r}"
            )
        aggs.append(
            F.countDistinct(F.col(sensitive_col))
            .alias("distinct_sensitive")
        )
    # class-side keys renamed before the join: `classes` derives from
    # `df`, so unaliased references would be ambiguous self-join columns
    classes = df.groupBy(*quasi_cols).agg(*aggs).select(
        *[F.col(c).alias(f"__class_{c}") for c in quasi_cols],
        "class_size",
        *(["distinct_sensitive"] if sensitive_col is not None else []),
    )
    # null-safe join: a NULL quasi value is its own class (groupBy
    # already buckets NULLs together; eqNullSafe keeps the join aligned)
    cond = None
    for c in quasi_cols:
        term = F.col(c).eqNullSafe(F.col(f"__class_{c}"))
        cond = term if cond is None else cond & term
    extra = ["class_size"]
    if sensitive_col is not None:
        extra.append("distinct_sensitive")
    return (
        df.join(classes, cond, "left")
        .select(*df.columns, *extra)
        .withColumn("suppressed", F.col("class_size") < k)
    )


def t_closeness(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float,
) -> DataFrame:
    """Per-equivalence-class t-closeness audit (Li, Li & Venkatasubramanian
    2007, "t-Closeness: privacy beyond k-anonymity and l-diversity") —
    the third leg of the privacy trio: :func:`k_anonymity` bounds class
    SIZE, its ``distinct_sensitive`` column bounds l-DIVERSITY, and this
    bounds the DISTANCE between a class's sensitive-value distribution
    and the corpus-wide one (a class can be large and diverse yet still
    leak — e.g. 90% of its rows sharing one diagnosis when the global
    rate is 5%).

    Distance is total variation (the categorical-sensitive instance of
    the paper's EMD): ``tvd = ½ · Σ_v |P_class(v) − P_global(v)|``,
    computed in EXACT integer arithmetic so the result is
    order-independent and replayable by the oracle —
    ``tvd_num = Σ_{v in class} |n_cv·n − n_v·n_c| + n_c·(n − Σ_{v in
    class} n_v)`` over a 38-digit decimal lane (the second term folds
    every globally-present-but-class-absent value without crossing
    classes × values), ``tvd = round(tvd_num / (2·n_c·n), 6)``.
    Decimal(38) holds n_c·n up to 10^24-ish — far past any corpus.

    Returns one row per class: ``*quasi_cols, class_size,
    tvd, violates`` (``tvd > t`` on the rounded value, matching the
    oracle compare).

    Plan at 100 TB: one hash aggregate on (quasi, v) — map-side combine
    — then a broadcast join to the |V|-row global value histogram and a
    second hash aggregate per class; the corpus total rides in as a
    broadcast 1-row aggregate. No window, no per-row Python."""
    if not 0 <= t <= 1:
        raise ValueError(f"t must be in [0, 1], got {t}")
    if not quasi_cols:
        raise ValueError("t_closeness needs at least one quasi column")
    missing = [c for c in quasi_cols + [sensitive_col] if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    dec = "decimal(38,0)"
    cv = (
        df.groupBy(*quasi_cols, F.col(sensitive_col).alias("__v__"))
        .agg(F.count(F.lit(1)).cast(dec).alias("__n_cv__"))
    )
    vtot = F.broadcast(
        df.groupBy(F.col(sensitive_col).alias("__v__")).agg(
            F.count(F.lit(1)).cast(dec).alias("__n_v__")
        )
    )
    total = F.broadcast(
        df.agg(F.count(F.lit(1)).cast(dec).alias("__n__"))
    )
    # two-pass per class: n_c = Σ n_cv needs to be known per class
    # BEFORE the |…| terms, so aggregate counts first, then compute the
    # distance terms in a second projection-free aggregate
    per_class = (
        cv.join(vtot, "__v__")
        .crossJoin(total)
        .groupBy(*quasi_cols)
        .agg(
            F.sum("__n_cv__").alias("__n_c__"),
            F.sum("__n_v__").alias("__sum_nv__"),
            F.first("__n__").alias("__n__"),
            F.collect_list(
                F.struct("__n_cv__", "__n_v__")
            ).alias("__terms__"),
        )
    )
    # Σ|n_cv·n − n_v·n_c| over the class's present values: the per-class
    # value list is bounded by |V| (the sensitive domain — audit-sized
    # by contract), so folding it with aggregate() keeps the arithmetic
    # exact without a second shuffle
    present = F.aggregate(
        F.col("__terms__"),
        F.lit(0).cast(dec),
        lambda acc, s: acc
        + F.abs(
            s["__n_cv__"] * F.col("__n__")
            - s["__n_v__"] * F.col("__n_c__")
        ),
    )
    num = present + F.col("__n_c__") * (F.col("__n__") - F.col("__sum_nv__"))
    tvd = F.round(
        num.cast("double")
        / (F.lit(2.0) * F.col("__n_c__").cast("double")
           * F.col("__n__").cast("double")),
        6,
    )
    return per_class.select(
        *quasi_cols,
        F.col("__n_c__").cast("bigint").alias("class_size"),
        tvd.alias("tvd"),
        (tvd > F.lit(t)).alias("violates"),
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int,
    c: float | None = None,
) -> DataFrame:
    """Per-equivalence-class l-diversity audit (Machanavajjhala et al.
    2007, "l-Diversity: privacy beyond k-anonymity") — the middle leg of
    the privacy trio as a first-class CLASS-level relation:
    :func:`k_anonymity` annotates ROWS (and exposes ``distinct_sensitive``
    as a side column), this returns the per-class frequency profile the
    paper's two instantiations are defined on:

    - **distinct l-diversity**: ``diverse = distinct_l >= l`` (the class
      holds at least ``l`` distinct sensitive values);
    - **recursive (c,l)-diversity** (with ``c``): ``r_1 < c * (r_l +
      r_{l+1} + ... + r_m)`` over the class's sensitive-value frequencies
      sorted descending — the most frequent value must not dominate the
      tail. Evaluated in EXACT arithmetic: ``c`` is converted to the
      exact rational ``Fraction(c)`` (floats ARE rationals) and the test
      becomes an integer compare ``r_1 * den < num * tail`` over a
      38-digit decimal lane, so the verdict is order-independent and
      bit-replayable by the oracle. ``tail_from_l`` (the Σ r_i, i >= l)
      is emitted so auditors can re-derive the verdict at any ``c``.

    Returns one row per class: ``*quasi_cols, class_size, distinct_l,
    top_count, tail_from_l, diverse`` (+ ``recursive_ok`` when ``c``).

    Plan at 100 TB: one (quasi, v) hash aggregate (map-side combine),
    then one per-class aggregate whose collect_list is bounded by |V| —
    the sensitive DOMAIN, audit-sized by contract, never the corpus.
    The frequency sort and tail fold run JVM-side on that bounded array
    (``sort_array`` + ``aggregate``); no window, no per-row Python.
    Note the tie-invariance that makes this exact: the tail Σ_{i>=l} is
    a multiset sum, unchanged by how equal frequencies order."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    if c is not None and c <= 0:
        raise ValueError(f"c must be > 0, got {c}")
    if not quasi_cols:
        raise ValueError("l_diversity needs at least one quasi column")
    missing = [c_ for c_ in quasi_cols + [sensitive_col] if c_ not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    cv = (
        df.groupBy(*quasi_cols, F.col(sensitive_col).alias("__v__"))
        .agg(F.count(F.lit(1)).alias("__n_cv__"))
    )
    per_class = cv.groupBy(*quasi_cols).agg(
        F.sum("__n_cv__").alias("class_size"),
        F.count(F.lit(1)).alias("distinct_l"),
        F.sort_array(F.collect_list("__n_cv__"), asc=False).alias("__freqs__"),
    )
    top = F.element_at("__freqs__", 1)
    # Σ of the l-1 largest frequencies; slice caps at the array length,
    # so a class with fewer than l values gets head == class_size and
    # therefore tail_from_l == 0 — exactly the paper's empty-tail case
    if l == 1:
        head = F.lit(0).cast("bigint")
    else:
        head = F.aggregate(
            F.slice(F.col("__freqs__"), 1, l - 1),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
    tail = (F.col("class_size") - head).alias("tail_from_l")
    out = per_class.select(
        *quasi_cols,
        F.col("class_size"),
        F.col("distinct_l"),
        top.alias("top_count"),
        tail,
        (F.col("distinct_l") >= F.lit(l)).alias("diverse"),
    )
    if c is not None:
        from fractions import Fraction

        frac = Fraction(c)  # exact: floats are dyadic rationals
        dec = "decimal(38,0)"
        out = out.withColumn(
            "recursive_ok",
            F.col("top_count").cast(dec) * F.lit(frac.denominator)
            < F.lit(frac.numerator) * F.col("tail_from_l").cast(dec),
        )
    return out


def k_anonymize(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    redaction: str | None = None,
) -> DataFrame:
    """Enforce k-anonymity by suppression: rows in equivalence classes
    smaller than ``k`` get every quasi-identifier column replaced with
    ``redaction`` (default NULL — full suppression; pass e.g. ``"*"``
    for visible masking of string columns). Non-quasi columns and the
    ``class_size``/``suppressed`` audit columns pass through, so the
    caller can count what was lost. Same single-aggregate plan as
    :func:`k_anonymity`.

    A non-NULL ``redaction`` is only valid when every quasi column is a
    string: masking an int column with ``"*"`` would otherwise silently
    coerce the whole column to string through when/otherwise type
    unification, changing the output schema (ADVICE r11 #3) — that case
    raises instead; use the default NULL suppression for non-string
    quasi columns."""
    if redaction is not None:
        from pyspark.sql.types import StringType

        non_string = [
            c for c in quasi_cols
            if c in df.columns
            and not isinstance(df.schema[c].dataType, StringType)
        ]
        if non_string:
            raise ValueError(
                "string redaction would change the dtype of non-string "
                f"quasi column(s) {non_string}; use redaction=None "
                "(NULL suppression) for them"
            )
    ann = k_anonymity(df, quasi_cols, k)
    out_cols = []
    for c in ann.columns:
        if c in quasi_cols:
            masked = (
                F.lit(None).cast(df.schema[c].dataType)
                if redaction is None
                else F.lit(redaction)
            )
            out_cols.append(
                F.when(F.col("suppressed"), masked)
                .otherwise(F.col(c)).alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return ann.select(*out_cols)

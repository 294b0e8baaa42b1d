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

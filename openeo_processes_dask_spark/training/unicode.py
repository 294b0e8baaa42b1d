"""Unicode / encoding hygiene for web-scale text corpora: the cleanup
pass every crawl pipeline runs before tokenization (C0/C1 control chars,
zero-width and BOM characters, CRLF, NFC canonical composition).

No reference counterpart (raster engine); part of the driver-mandated
training-data lane.

Design for scale:
- Everything except NFC is a JVM ``regexp_replace`` chain — whole-stage
  codegen, no Python.
- NFC needs ICU-class normalization, which the JVM SQL surface lacks, so
  it runs as an Arrow-batched pandas UDF (``unicodedata.normalize``) —
  but ONLY on rows containing non-ASCII bytes: NFC is the identity on
  pure ASCII, so the corpus is split with a cheap ``rlike`` predicate and
  the two legs are unioned. At 100 TB of mostly-ASCII web text the
  Python lane sees a few percent of rows; the predicate is pushed into
  both scans and each leg stays a single map stage (no shuffle at all).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# C0 control chars except \t \n, DEL + C1 block, zero-widths + BOM,
# Unicode line/paragraph separators (mapped to \n first)
_CRLF = "\\r\\n|\\r"
_LINE_SEPS = "[\\u2028\\u2029\\u0085]"
_STRIP = ("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f\\u200b-\\u200d\\u2060\\ufeff]")


def _jvm_clean(col):
    c = F.regexp_replace(col, _CRLF, "\n")
    c = F.regexp_replace(c, _LINE_SEPS, "\n")
    return F.regexp_replace(c, _STRIP, "")


def _nfc_udf():
    """Built lazily: decorating at import time would need an active
    SparkContext to parse the return type."""
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    return _nfc


def unicode_clean(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    nfc: bool = True,
) -> DataFrame:
    """Normalize ``text_col``: CRLF and Unicode line separators -> ``\\n``,
    control / zero-width / BOM characters stripped, then NFC composition
    (Python lane, non-ASCII rows only). Column order is preserved."""
    out_col = out_col or text_col
    cleaned = df.withColumn(out_col, _jvm_clean(F.col(text_col)))
    if not nfc:
        return cleaned
    is_ascii = ~F.col(out_col).rlike("[^\\x00-\\x7F]") | F.col(out_col).isNull()
    ascii_leg = cleaned.where(is_ascii)
    other_leg = cleaned.where(~is_ascii).withColumn(
        out_col, _nfc_udf()(F.col(out_col))
    )
    return ascii_leg.unionByName(other_leg)

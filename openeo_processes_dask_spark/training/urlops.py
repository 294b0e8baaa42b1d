"""URL / domain operations for web-crawl corpus curation.

Crawl pipelines group, cap, and blocklist by REGISTERED domain, not by
raw URL (no reference counterpart — LLM-pipeline lane). Pure Column
regex/string expressions — map-only, codegen'd, no UDF; the per-domain
aggregate is one hash shuffle on the (short) domain key, the natural
partitioning for every downstream per-domain policy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: host capture from a URL — scheme optional, stops at / : ? #
_HOST_RE = r"^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?:[^/@]*@)?([^/:?#]+)"


def url_host(url: Column) -> Column:
    """Hostname of ``url`` (lowercased; empty string when unparseable)."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def registered_domain(url: Column) -> Column:
    """Last two labels of the host with any leading ``www.`` dropped —
    the practical crawl-pipeline grouping key (a public-suffix list
    refines multi-label TLDs like ``co.uk``; at that point plug the PSL
    in as a broadcast map-join on the host suffix)."""
    host = F.regexp_replace(url_host(url), r"^www\.", "")
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def per_domain_stats(
    df: DataFrame,
    url_col: str = "url",
    size_col: str | None = None,
) -> DataFrame:
    """(domain, n_docs[, total_size]) — the corpus-composition audit and
    the input to per-domain caps/blocklists. One hash aggregate."""
    out = df.withColumn("domain", registered_domain(F.col(url_col)))
    aggs = [F.count("*").alias("n_docs")]
    if size_col is not None:
        aggs.append(F.sum(size_col).alias("total_size"))
    return out.groupBy("domain").agg(*aggs)


def latest_per_url(
    df: DataFrame,
    url_col: str = "url",
    time_col: str = "crawl_ts",
    tie_col: str | None = None,
) -> DataFrame:
    """Keep only the NEWEST crawl of each URL — the re-crawl dedup every
    web-corpus refresh starts with (a URL re-fetched weekly contributes
    one document, not fifty-two). Ties on the timestamp break by
    ``tie_col`` descending (default: the time column only — pass a
    snapshot/sequence column for total determinism when timestamps can
    collide).

    Plan: one window rank per URL — row_number over (url, time DESC)
    then rank = 1, which Spark executes as a single hash exchange on the
    url plus a WindowGroupLimit (only the winning row crosses the final
    stage); no self-join, no driver state."""
    from pyspark.sql import Window

    order = [F.col(time_col).desc()]
    if tie_col is not None:
        order.append(F.col(tie_col).desc())
    w = Window.partitionBy(url_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )

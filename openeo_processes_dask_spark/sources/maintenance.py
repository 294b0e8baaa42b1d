"""Table maintenance for long-lived 100 TB datasets: column statistics
(the ANALYZE pass feeding size estimation and data-quality dashboards)
and small-file compaction (the classic failure mode of incremental
ingest — a million 2 MB files turn every scan into driver-side listing
pain and per-task overhead).

No reference counterpart (the reference computes on in-memory xarray);
these are the operational companions a Spark deployment needs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def analyze_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Per-column statistics in ONE aggregate pass over the data:
    (column, n_rows, n_nonnull, n_distinct, min_value, max_value) with
    min/max rendered as strings so heterogeneous columns stack into one
    long-format result.

    ``exact=True`` uses countDistinct — Spark plans the multi-distinct
    aggregate with an Expand (one duplicated stream per distinct column),
    acceptable for scheduled ANALYZE jobs. For interactive profiling of a
    100 TB table pass ``exact=False``: approx_count_distinct (HyperLogLog)
    keeps it a single non-expanded pass.

    The stack from the single aggregate row to long format is a literal
    array-of-structs explode — metadata-sized, no second scan.
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        nd = F.countDistinct(F.col(c)) if exact else F.approx_count_distinct(c)
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            nd.alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n_rows").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nonnull"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("s")).select("s.*")


def _fs_file_sizes(spark: SparkSession, path: str) -> list[int]:
    """Sizes of the data files under ``path`` via the Hadoop FileSystem
    API — works for any configured scheme (file://, hdfs://, s3a://...),
    not just the local disk."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    sizes = []
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if not name.startswith(("_", ".")):
            sizes.append(status.getLen())
    return sizes


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 << 20,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite the parquet dataset at ``src`` into ``dst`` with file
    sizes near ``target_file_bytes``. Returns the output file count.

    The partition count comes from the ACTUAL on-disk byte size (Hadoop
    FS listing), not a row-count guess — compression ratio is preserved
    through a rewrite, so bytes-in ≈ bytes-out per row. ``sort_by``
    optionally re-sorts within output files (repartition + sortWithin-
    Partitions) so min/max page statistics stay selective after
    compaction — without it, mixing many small time-ordered files
    destroys the effective row-group zone maps.
    """
    sizes = _fs_file_sizes(spark, src)
    total = sum(sizes)
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src)
    if sort_by:
        out = df.repartition(n).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dst)
    return len(_fs_file_sizes(spark, dst))


def range_partition_bounds(
    df: DataFrame, col: str, n_buckets: int
) -> DataFrame:
    """EXACT equi-depth range-partition boundaries for ``col`` — the
    planning step before a range-partitioned write or a custom range
    shuffle: pick bounds so each of ``n_buckets`` ranges holds (as close
    as value ties allow) the same row count. Spark's own
    ``repartitionByRange`` SAMPLES (reservoir per partition) and is
    neither exact nor deterministic across runs; this operator pays one
    aggregate for bounds that are both.

    Returns ``(bucket, upper, rows_below)`` for bucket = 1..n_buckets-1:
    ``upper`` is the smallest value v such that at least
    ``bucket * n / n_buckets`` rows have value <= v (the classic exact
    phi-quantile: phi = bucket/n_buckets), and ``rows_below`` is the
    exact count of rows <= v. NULLs are excluded (route them to a
    dedicated partition). Ties make perfectly equal buckets impossible;
    the bound always lands ON a data value, so the split is
    reproducible bit-for-bit.

    Plan at 100 TB: ONE hash aggregate by distinct value (map-side
    combine collapses duplicates before the shuffle), then the
    running-count window runs over the DISTINCT-VALUE relation only —
    the same distinct-first shape as the exact-AUC operator; the raw
    table is scanned exactly once and never globally sorted. Caveat
    (shared with percentile_rank and auc): the running window is a
    global order over distinct values, serial if the column is truly
    continuous — quantize such columns first (bounds on rounded values
    are still exact bounds of the rounded distribution).
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    from pyspark.sql import Window

    by_val = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = by_val.withColumn("cum", F.sum("c").over(w).cast("long"))
    # total rows: the max cumulative count — window-derived, no 2nd scan
    total = cum.agg(F.max("cum").alias("n"))
    buckets = total.select(
        F.explode(F.sequence(F.lit(1), F.lit(n_buckets - 1))).alias(
            "bucket"
        ),
        "n",
    ).withColumn(
        # ceil(bucket*n/n_buckets) in pure integer arithmetic
        "target",
        F.expr(f"CAST((bucket * n + {n_buckets} - 1) div {n_buckets} AS BIGINT)"),
    )
    # smallest v whose running count reaches the target
    hit = (
        buckets.join(cum, F.col("cum") >= F.col("target"))
        .groupBy("bucket")
        .agg(
            # cum is strictly increasing over distinct v, so min v and
            # min cum name the same row
            F.min("v").alias("upper"),
            F.min("cum").alias("rows_below"),
        )
    )
    return hit.select("bucket", "upper", F.col("rows_below").cast("long").alias("rows_below"))


def percentile_rank(
    df: DataFrame, col: str, out_col: str = "pct"
) -> DataFrame:
    """Empirical-CDF percentile of every row's ``col`` value — the
    threshold-free normalization for heterogeneous quality scores
    (keep "top 10% per source" without knowing the score scale).

    ``pct = (#rows with value <= v) / n`` over non-NULL rows, rounded to
    6 decimals; NULL values get NULL. Appended as ``out_col``.

    Plan at 100 TB: the same distinct-value shape as
    :func:`range_partition_bounds` — ONE hash aggregate to distinct
    values (map-side combine), the running count window over the
    distinct relation only, then ONE broadcast-or-shuffle equi-join of
    the (value, pct) lookup back onto the rows. The raw table is never
    globally sorted.
    """
    from pyspark.sql import Window

    by_val = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("__v"))
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    cum = by_val.withColumn("__cum", F.sum("__c").over(w).cast("long"))
    n = cum.agg(F.max("__cum").alias("__n"))
    lookup = cum.crossJoin(F.broadcast(n)).select(
        "__v",
        F.round(F.col("__cum") / F.col("__n"), 6).alias(out_col),
    )
    return df.join(
        lookup, df[col] == lookup["__v"], "left"
    ).drop("__v")

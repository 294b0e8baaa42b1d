"""Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
arXiv:2302.03169): score every raw-corpus document by how target-like its
hashed n-gram distribution is, so a 100 TB crawl can be *resampled*
toward a high-quality target domain instead of hard-filtered.

No reference counterpart (the reference is a raster engine); this is part
of the training-data lane the driver mandates.

Design for scale:
- Features are hashed bigrams (``md5 -> bucket``), so the model is a
  fixed ``n_buckets``-row table regardless of corpus size — it broadcasts.
- Per-bucket log-importance weights are snapped to integer micro-units
  (1e-6) so the per-document sum is an INTEGER sum — bit-identical under
  any partitioning or aggregation order, on Spark and on the DuckDB
  oracle alike (same trick as training/classifier.py's logreg).
- Documents are scored in one pass: explode bigram buckets, join the
  broadcast weight table, one hash aggregate keyed by doc id. Text never
  shuffles; only (id, bucket) pairs do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openeo_processes_dask_spark.training.textanalysis import tokens


def _bigram_buckets(df: DataFrame, id_col: str, text_col: str, n_buckets: int):
    """(id, bucket) — one row per bigram INSTANCE (not distinct): DSIR
    scores use raw counts. Bucket = first 15 md5 hex chars mod n_buckets,
    reproducible on any engine with md5 (the oracle uses the same
    construction).

    Keyed spread (r13, guide §2.4): a small-file corpus arrives in fewer
    partitions than cores, pinning the tokenize + bigram-md5 explode to
    one task — and this relation is consumed TWICE (bucket counts +
    scoring join), so the single-task pass ran twice. Hash-partitioning
    by id parallelizes both passes and satisfies dsir_weights' final
    groupBy(id) clustering (one fused aggregate, no second exchange).
    No-op at scale. Interleaved A/B at sf0.1: dsir_weights 1.61 ->
    0.66 s, identical output."""
    from openeo_processes_dask_spark.training.dedup import _spread

    toks = _spread(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t__")),
        key="id",
    ).select("id", tokens(F.lower(F.col("__t__"))).alias("w"))
    n = F.size("w") - 1
    grams = F.when(n <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat_ws(" ", F.slice(F.col("w"), i, 2)),
        )
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("g")), 1, 15), 16, 10).cast("bigint")
        % n_buckets
    )
    return toks.select("id", F.explode(grams).alias("g")).select(
        "id", bucket.alias("bucket")
    )


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document DSIR log-importance weight.

    ``weight(d) = sum over bigram instances b of log p_target(bucket(b))
    - log p_raw(bucket(b))`` with add-``alpha`` smoothed bucket
    probabilities. Returned as (id, n_grams, weight_micro) where
    ``weight_micro`` is the integer micro-unit sum (divide by 1e6 for the
    float weight) — integers keep the result exactly reproducible across
    engines and partitionings.

    A pipeline resamples by keeping documents with Gumbel-perturbed top
    weights; the deterministic weight table is the expensive distributed
    part and is what this function computes.
    """
    raw_b = _bigram_buckets(df, id_col, text_col, n_buckets)
    tgt_b = _bigram_buckets(target, id_col, text_col, n_buckets)

    # bucket-count tables: n_buckets rows each — driver-safe to aggregate,
    # broadcast back joined to the corpus explode
    raw_counts = raw_b.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt_counts = tgt_b.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_tgt"))
    buckets = df.sparkSession.range(n_buckets).select(
        F.col("id").alias("bucket")
    )
    totals = (
        buckets.join(raw_counts, "bucket", "left")
        .join(tgt_counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("c_raw", F.lit(0)).alias("c_raw"),
            F.coalesce("c_tgt", F.lit(0)).alias("c_tgt"),
        )
    )
    from pyspark.sql import Window

    # global window over the n_buckets-row table: a single-partition
    # shuffle of (fixed) n_buckets rows, nowhere near the corpus
    wall = Window.partitionBy(F.lit(1))
    n_raw = F.sum("c_raw").over(wall)
    n_tgt = F.sum("c_tgt").over(wall)
    log_ratio = (
        F.log((F.col("c_tgt") + F.lit(alpha)) / (n_tgt + alpha * n_buckets))
        - F.log((F.col("c_raw") + F.lit(alpha)) / (n_raw + alpha * n_buckets))
    )
    wtab = totals.select(
        "bucket",
        F.round(log_ratio * 1e6).cast("bigint").alias("w_micro"),
    )
    return (
        raw_b.join(F.broadcast(wtab), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("w_micro").alias("weight_micro"),
        )
    )

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline on sf0.001. ``queries()`` maps
one entry per implemented operator family (SURVEY.md §2 + training extras)
to a (spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` holds the
DuckDB-equivalent SQL for the driver's correctness gate.

Oracle conventions (see .claude/skills/verify/SKILL.md):
- float aggregates rounded to 6 decimals on BOTH sides (engine sum-order
  differs in the last ulp);
- DuckDB date_trunc returns DATE -> CAST(... AS TIMESTAMP) in oracles;
- session timezone pinned to UTC inside every query callable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _setup(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _events_cube(spark, sf_dir):
    from openeo_processes_dask_spark.sources.load import events_cube

    return events_cube(spark, sf_dir)


def _table(spark, sf_dir, name):
    from openeo_processes_dask_spark.sources.load import load_table

    return load_table(spark, sf_dir, name)


def _round6(df: DataFrame, *cols: str) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.round(F.col(c), 6))
    return df


def _stopwords_sql() -> str:
    from openeo_processes_dask_spark.training.textanalysis import STOPWORDS

    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


_STOPWORDS_SQL = _stopwords_sql()


def _li_cells(spark, sf_dir):
    """lineitem pre-aggregated to unique (x, pos) cube cells.

    The synthetic (l_orderkey, l_linenumber) is NOT unique (~20% dup keys at
    sf0.01); cube cells must be unique, so join/window demo queries
    aggregate first. Mirrored by the `cells` CTE in the oracles.
    """
    return (
        _table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_orderkey").alias("x"), F.col("l_linenumber").alias("pos")
        )
        .agg(
            F.sum("l_quantity").alias("sq"),
            F.sum("l_extendedprice").alias("sep"),
            F.sum("l_discount").alias("sd"),
            F.max("l_discount").alias("md"),
        )
    )


_CELLS_CTE = """
    cells AS (
      SELECT l_orderkey AS x, l_linenumber AS pos,
             sum(l_quantity) AS sq, sum(l_extendedprice) AS sep,
             sum(l_discount) AS sd, max(l_discount) AS md
      FROM lineitem GROUP BY 1, 2)
"""


# ----------------------------------------------------------------------
# flagship
# ----------------------------------------------------------------------

def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-event-type mean of per-user daily means over January —
    the 'monthly mean NDVI' shape (filter → calendar bucket → reduce) from
    SURVEY.md §7 M0, on the driver's events table."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.aggregate import (
        aggregate_temporal_period,
    )
    from openeo_processes_dask_spark.operators.filters import filter_temporal
    from openeo_processes_dask_spark.operators.reduce import reduce_dimension

    cube = _events_cube(spark, sf_dir)
    cube = filter_temporal(cube, ["2024-01-01", "2024-02-01"])
    cube = aggregate_temporal_period(cube, "day", "mean")
    # Snap the INNER aggregate to integer micro-units on both sides
    # (r01 driver red row; VERDICT.md "What's wrong" #1): unrounded per-user
    # means carry engine-vs-DuckDB last-ulp summation-order noise into the
    # outer mean, and a plain round(…,6) inner makes the outer mean land
    # EXACTLY on round boundaries (grid effect). Integer-valued doubles
    # < 2^53 sum exactly in any order, so the outer mean is bit-identical
    # across engines; the final /1e6 + round then sees identical operands.
    cube = cube.with_df(
        cube.df.withColumn("value", F.round(F.col("value") * 1e6, 0))
    )
    cube = reduce_dimension(cube, "mean", "user_id")
    return cube.df.withColumn("value", F.round(F.col("value") / 1e6, 6))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, "/root/testdata/sf0.001")


# ----------------------------------------------------------------------
# cube operator queries
# ----------------------------------------------------------------------

def q_filter_temporal(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.operators.filters import filter_temporal

    cube = _events_cube(spark, sf_dir)
    return filter_temporal(cube, ["2024-01-10", "2024-01-20"]).df.drop("__t_ns__")


def q_filter_bands(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.operators.filters import filter_bands

    cube = _events_cube(spark, sf_dir)
    return filter_bands(cube, ["click", "purchase"]).df.drop("__t_ns__")


def q_filter_labels_text(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.functions.text import text_begins
    from openeo_processes_dask_spark.operators.filters import filter_labels

    cube = _events_cube(spark, sf_dir)
    return filter_labels(cube, lambda c: text_begins(c, "c"), "band").df.drop("__t_ns__")


def q_filter_bbox(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.filters import filter_bbox

    # dims stay bigint: casting to double before the filter would block
    # predicate pushdown into the parquet scan (verified via .explain)
    df = _table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("x"),
        F.col("l_suppkey").alias("y"),
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("pos"),
        F.col("l_quantity").alias("value"),
    )
    cube = DataCube(df, dims=("x", "y", "okey", "pos"), roles={"okey": "other", "pos": "other"})
    return filter_bbox(
        cube, {"west": 100, "east": 500, "south": 2, "north": 7}
    ).df


def q_reduce_mean_over_time(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.reduce import reduce_dimension

    df = _table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("x"),
        F.col("l_shipdate").alias("t"),
        F.col("l_returnflag").alias("band"),
        F.col("l_quantity").alias("value"),
    )
    cube = DataCube(df, dims=("x", "t", "band"))
    out = reduce_dimension(cube, "mean", "t")
    return _round6(out.df, "value")


def q_reduce_variance(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.reduce import reduce_dimension

    df = _table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("x"),
        F.col("l_shipdate").alias("t"),
        F.col("l_returnflag").alias("band"),
        F.col("l_extendedprice").alias("value"),
    )
    cube = DataCube(df, dims=("x", "t", "band"))
    out = reduce_dimension(cube, "variance", "t")
    return out.df.withColumn("value", F.round(F.col("value"), 2))


def q_reduce_spatial_sum(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.reduce import reduce_spatial

    df = _table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("double").alias("x"),
        F.col("l_suppkey").cast("double").alias("y"),
        F.col("l_returnflag").alias("band"),
        F.col("l_quantity").alias("value"),
    )
    cube = DataCube(df, dims=("x", "y", "band"))
    out = reduce_spatial(cube, "sum")
    return _round6(out.df, "value")


def q_aggregate_temporal_halves(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.aggregate import aggregate_temporal

    df = _table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").alias("t"),
        F.col("o_orderpriority").alias("band"),
        F.col("o_totalprice").alias("value"),
    )
    cube = DataCube(df, dims=("t", "band"))
    out = aggregate_temporal(
        cube,
        intervals=[["1995-01-01", "1998-01-01"], ["1998-01-01", "2002-01-01"]],
        labels=["h1", "h2"],
        reducer="sum",
    )
    return _round6(out.df, "value")


def q_aggregate_dekad(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.operators.aggregate import (
        aggregate_temporal_period,
    )

    cube = _events_cube(spark, sf_dir)
    out = aggregate_temporal_period(cube, "dekad", "sum")
    return _round6(out.df, "value")


def q_aggregate_week_median(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.operators.aggregate import (
        aggregate_temporal_period,
    )
    from openeo_processes_dask_spark.operators.reduce import reduce_dimension

    cube = _events_cube(spark, sf_dir)
    out = aggregate_temporal_period(cube, "week", "median")
    out = reduce_dimension(out, "max", "user_id")
    return _round6(out.df, "value")


def q_merge_multiply(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.merge import merge_cubes

    cells = _li_cells(spark, sf_dir)
    c1 = DataCube(cells.select("x", "pos", F.col("sep").alias("value")), dims=("x", "pos"))
    c2 = DataCube(cells.select("x", "pos", F.col("sd").alias("value")), dims=("x", "pos"))
    # label_relation hint: both cubes project the same cells table, so
    # skip the 4 label-set probing jobs the auto-detection would run
    out = merge_cubes(c1, c2, overlap_resolver="multiply", label_relation="equal")
    return _round6(out.df, "value")


def q_mask_high_discount(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.mask import mask

    cells = _li_cells(spark, sf_dir)
    data = DataCube(cells.select("x", "pos", F.col("sq").alias("value")), dims=("x", "pos"))
    m = DataCube(
        cells.select("x", "pos", (F.col("md") > 0.05).cast("int").alias("value")),
        dims=("x", "pos"),
    )
    return mask(data, m).df


def q_apply_scale_clip(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.functions.math import clip, linear_scale_range
    from openeo_processes_dask_spark.operators.apply import apply as apply_op

    cells = _li_cells(spark, sf_dir)
    cube = DataCube(cells.select("x", "pos", F.col("sq").alias("value")), dims=("x", "pos"))
    out = apply_op(
        cube, lambda c: clip(linear_scale_range(c, 1, 50, 0, 1), 0.1, 0.9)
    )
    return _round6(out.df, "value")


def q_cumsum(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.windows import cumsum

    cells = _li_cells(spark, sf_dir)
    cube = DataCube(cells.select("x", "pos", F.col("sq").alias("value")), dims=("x", "pos"))
    return cumsum(cube, "pos").df


def q_sort_along_dim(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.windows import sort as sort_op

    cells = _li_cells(spark, sf_dir)
    cube = DataCube(cells.select("x", "pos", F.col("sq").alias("value")), dims=("x", "pos"))
    return sort_op(cube, "pos").df


def q_interpolate_gaps(spark, sf_dir):
    """Gap-fill under the oracle gate. The gappy cube is built in one
    projection (mask() itself is gated separately by mask_high_discount;
    composing it here added a join + second aggregate that doubled the
    query's cost for no extra coverage)."""
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.windows import (
        array_interpolate_linear,
    )

    cells = _li_cells(spark, sf_dir)
    gappy = DataCube(
        cells.select(
            "x",
            F.col("pos").cast("double").alias("pos"),
            F.when(F.col("md") > 0.05, F.lit(None).cast("double"))
            .otherwise(F.col("sq"))
            .alias("value"),
        ),
        dims=("x", "pos"),
    )
    out = array_interpolate_linear(gappy, "pos")
    return _round6(out.df, "value")


def q_date_ops(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.functions.dates import (
        date_difference,
        date_shift,
    )

    o = _table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("x"),
        date_shift(F.col("o_orderdate"), 1, "month").alias("t_shifted"),
        date_difference(F.col("o_orderdate"), "2000-01-01", "day").alias(
            "days_to_y2k"
        ),
    )


def q_add_drop_dimension(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.operators.general import (
        add_dimension,
        rename_dimension,
    )
    from openeo_processes_dask_spark.operators.reduce import reduce_dimension

    cube = _events_cube(spark, sf_dir)
    cube = reduce_dimension(cube, "sum", "t")
    cube = add_dimension(cube, "model", "m1", type="other")
    cube = rename_dimension(cube, "band", "channel")
    return _round6(cube.df, "value")


# ----------------------------------------------------------------------
# training-data extras
# ----------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.training.dedup import exact_duplicates

    docs = _table(spark, sf_dir, "documents")
    return exact_duplicates(docs, "doc_id", "text")


def q_training_pipeline(spark, sf_dir):
    """The training-data lane end-to-end in ONE oracle-checked query:
    Gopher quality filter -> exact dedup (canonical min-id per
    fingerprint) -> stratified sample -> train/val split -> shard ->
    contiguous sequence packing. Every stage is shuffle-minimal (filter
    and sample are scans; dedup is one digest aggregate; packing is a
    per-shard window) and every stage reuses an operator that also has
    its own standalone gate."""
    _setup(spark)
    from openeo_processes_dask_spark.training.dedup import exact_duplicates
    from openeo_processes_dask_spark.training.filtering import gopher_filter
    from openeo_processes_dask_spark.training.sampling import (
        assign_shards,
        pack_tokens_contiguous,
        sample_stratified,
        split_assign,
    )

    docs = _table(spark, sf_dir, "documents")
    kept = gopher_filter(docs, min_words=30, min_stopwords=1)
    canon = exact_duplicates(kept, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )
    ded = kept.join(canon, "doc_id", "left_semi")
    samp = sample_stratified(
        ded, {"en": 1.0, "de": 0.5}, "lang", seed=13, default=0.2
    )
    train = split_assign(samp, {"train": 0.9, "val": 0.1}, seed=17).where(
        F.col("split") == "train"
    )
    sharded = assign_shards(train, 4, seed=19)
    return pack_tokens_contiguous(sharded, 2048, "n_chars", shard_col="shard")


def q_dedup_incremental(spark, sf_dir):
    """Incremental dedup (training/dedup.py dedup_against): the "new"
    batch is the odd-id docs plus re-ingested copies of the even-id docs
    (ids shifted +10⁶); against the even-id "seen" corpus, exactly the
    copies must drop — fingerprints-only LEFT ANTI join."""
    _setup(spark)
    from openeo_processes_dask_spark.training.dedup import dedup_against

    docs = _table(spark, sf_dir, "documents")
    seen = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1).unionByName(
        seen.withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    )
    return dedup_against(new, seen).select("doc_id", "lang", "source")


def q_sample_stratified(spark, sf_dir):
    """Deterministic stratified Bernoulli sample (training/sampling.py):
    per-language keep rates as a pure scan filter — md5-hash uniform, so
    the DuckDB oracle reproduces the exact row set."""
    _setup(spark)
    from openeo_processes_dask_spark.training.sampling import sample_stratified

    docs = _table(spark, sf_dir, "documents")
    out = sample_stratified(
        docs, {"en": 0.5, "de": 0.25}, "lang", seed=7, default=0.1
    )
    return out.select("doc_id", "lang", "source")


def q_cap_per_source(spark, sf_dir):
    """Per-(lang, source) quota cap: top-4 by n_chars (ties on doc_id) —
    row_number ≤ k compiles to WindowGroupLimit, so map tasks forward at
    most k rows per group before the exchange (training/sampling.py)."""
    _setup(spark)
    from openeo_processes_dask_spark.training.sampling import cap_per_group

    docs = _table(spark, sf_dir, "documents")
    out = cap_per_group(
        docs, ["lang", "source"], 4, [F.col("n_chars").desc(), F.col("doc_id")]
    )
    return out.select("doc_id", "lang", "source", "n_chars")


def q_pack_contiguous(spark, sf_dir):
    """GPT-style sequence packing: hash-shard documents, concatenate per
    shard in doc_id order, cut every 4096 chars; one (doc, segment) row
    per overlap (training/sampling.py pack_tokens_contiguous). Window
    cumsum partitioned by shard — never a global single-task window."""
    _setup(spark)
    from openeo_processes_dask_spark.training.sampling import (
        assign_shards,
        pack_tokens_contiguous,
    )

    docs = assign_shards(_table(spark, sf_dir, "documents"), 8, seed=3)
    return pack_tokens_contiguous(docs, 4096, "n_chars", shard_col="shard")


def q_split_assign(spark, sf_dir):
    """Deterministic train/val/test split (training/sampling.py): pure
    hash-range projection, exactly replicable in the oracle's md5 math."""
    _setup(spark)
    from openeo_processes_dask_spark.training.sampling import split_assign

    docs = _table(spark, sf_dir, "documents")
    out = split_assign(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=11
    )
    return out.select("doc_id", "lang", "split")


def q_repetition_stats(spark, sf_dir):
    """Gopher-style 2-gram repetition counters (training/filtering.py):
    one no-shuffle fold over sorted gram arrays; integer counts so the
    unnest+GROUP BY DuckDB twin matches exactly."""
    _setup(spark)
    from openeo_processes_dask_spark.training.filtering import ngram_repetition

    docs = _table(spark, sf_dir, "documents")
    out = ngram_repetition(docs.select("doc_id", "text"), 2)
    return out.select(
        "doc_id",
        *[
            F.col(f"g2_{f}").cast("long").alias(f)
            for f in ("top_run", "top_chars", "dup_occ", "dup_chars", "tot_chars", "n_grams")
        ],
    )


def q_gopher_filter(spark, sf_dir):
    """Gopher rule flags (word band, mean-word-length band, alpha ratio,
    stopwords, 2-gram dominance, duplicated 5-grams) + combined keep —
    entirely map-side (test_no_shuffle_in_plan asserts no Exchange)."""
    _setup(spark)
    from openeo_processes_dask_spark.training.filtering import gopher_flags

    docs = _table(spark, sf_dir, "documents")
    out = gopher_flags(docs.select("doc_id", "text"), min_words=30, min_stopwords=1)
    return out.select(
        "doc_id", "ok_words", "ok_word_len", "ok_alpha", "ok_stopwords",
        "ok_top2gram", "ok_dup5gram", "keep",
    )


def q_token_count(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.training.textanalysis import token_count

    docs = _table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )


def q_text_quality(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.training.textanalysis import (
        doc_fingerprint,
        quality_score,
    )

    docs = _table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(quality_score(F.col("text")), 6).alias("quality"),
        doc_fingerprint(F.col("text")).alias("fingerprint"),
    )


def q_language_id(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.training.textanalysis import language_id

    docs = _table(spark, sf_dir, "documents")
    return docs.select("doc_id", language_id(F.col("text")).alias("lang_pred"))


def q_ngram_jaccard(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.training.dedup import ngram_jaccard_pairs

    docs = _table(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)
    return _round6(out, "jaccard")


def q_minhash_near_dups(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.training.dedup import minhash_near_duplicates

    docs = _table(spark, sf_dir, "documents")
    out = minhash_near_duplicates(
        docs, "doc_id", "text", n=3, num_hashes=64, bands=16, threshold=0.2
    )
    return _round6(out, "est_jaccard")


def q_dedup_clusters(spark, sf_dir):
    """Connected components over the MinHash pair graph + per-cluster
    canonical-id summary (training/dedup.py connected_components /
    dedup_clusters): the step that turns pairwise matches into keep-lists.
    Oracle: recursive-CTE transitive closure over the SAME pair SQL."""
    _setup(spark)
    from openeo_processes_dask_spark.training.dedup import (
        connected_components,
        minhash_near_duplicates,
    )

    docs = _table(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(
        docs, "doc_id", "text", n=3, num_hashes=64, bands=16, threshold=0.2
    )
    return connected_components(pairs).orderBy("id")


def q_simhash_near_dups(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.training.dedup import simhash_near_duplicates

    docs = _table(spark, sf_dir, "documents")
    return simhash_near_duplicates(docs, "doc_id", "text", max_hamming=6)


def q_cosine_topk(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.training.similarity import cosine_topk

    emb = _table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    return cosine_topk(emb, [float(v) for v in query], k=10)


def q_kmeans_clusters(spark, sf_dir):
    """Distributed k-means (training/clustering.py): micro-unit snapping
    makes every per-cluster sum exact in any order, so the unrolled-CTE
    DuckDB twin matches the engine bit-for-bit — no tolerance at all."""
    _setup(spark)
    from openeo_processes_dask_spark.training.clustering import (
        kmeans_assign,
        kmeans_fit,
    )

    emb = _table(spark, sf_dir, "embeddings")
    cents = kmeans_fit(emb, k=8, iterations=2)
    return kmeans_assign(emb, cents)


def q_pq_topk(spark, sf_dir):
    """PQ/ADC approximate top-k (training/similarity.py): 4×16-dim
    subspaces, 8 seed-sampled centroids each; encode = one projection,
    score = element_at LUT lookups summed in fixed order, TakeOrdered.
    Oracle replicates codebooks/encode/LUT with the same fold-left
    arithmetic."""
    _setup(spark)
    from openeo_processes_dask_spark.training.similarity import pq_topk

    emb = _table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    return pq_topk(emb, [float(v) for v in query], k=12, m=4, ks=8)


def q_lsh_topk(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.training.similarity import lsh_topk

    emb = _table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    # 6 planes -> ~2^6 buckets: candidate sets stay non-trivial at sf0.01
    return lsh_topk(emb, [float(v) for v in query], k=10, n_planes=6)


def q_embedding_near_dups(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.training.similarity import (
        pairwise_cosine_above,
    )

    emb = _table(spark, sf_dir, "embeddings")
    # test-scale banding: 2 bands x 4 bits (the 100 TB default is 8 x 16,
    # see training/similarity.py bucket math)
    return pairwise_cosine_above(
        emb, threshold=0.2, n_planes=4, n_bands=2
    )


def q_ivf_topk(spark, sf_dir):
    """IVF coarse-quantized ANN: seeded centroid sample, max-cosine
    assignment, nprobe-cell probe, exact re-rank (training/similarity.py).
    Every step is engine-portable (md5 sampling, fold-left dots), so the
    oracle reproduces the whole index, not just the final ranking."""
    _setup(spark)
    from openeo_processes_dask_spark.training.similarity import ivf_topk

    emb = _table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    return ivf_topk(
        emb, [float(v) for v in query], k=10, n_centroids=16, nprobe=4
    )




# ----------------------------------------------------------------------
# second-wave operator queries
# ----------------------------------------------------------------------

def q_resample_asof(spark, sf_dir):
    """resample_cube_temporal: as-of align order dates to year starts."""
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.resample import (
        resample_cube_temporal,
    )

    o = _table(spark, sf_dir, "orders")
    data = DataCube(
        o.select(
            F.col("o_orderdate").alias("t"),
            F.col("o_orderpriority").alias("band"),
            F.col("o_totalprice").alias("value"),
        ),
        dims=("t", "band"),
    )
    target = DataCube(
        o.select(
            F.date_trunc("year", "o_orderdate").alias("t"),
            F.col("o_orderpriority").alias("band"),
            F.col("o_totalprice").alias("value"),
        ),
        dims=("t", "band"),
    )
    return resample_cube_temporal(data, target).df


def q_ndvi_events(spark, sf_dir):
    """ndvi band-math on the events cube: (click - view)/(click + view)."""
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.aggregate import (
        aggregate_temporal_period,
    )
    from openeo_processes_dask_spark.operators.indices import ndvi

    ev = _table(spark, sf_dir, "events")
    cube = DataCube(
        ev.select(
            F.col("ts").alias("t"),
            F.col("event_type").alias("band"),
            "value",
        ),
        dims=("t", "band"),
    )
    daily = aggregate_temporal_period(cube, "day", "mean")
    out = ndvi(daily, nir="click", red="view")
    return _round6(out.df, "value")


def q_apply_kernel_grid(spark, sf_dir):
    """apply_kernel: plus-shaped convolution over a dense (x, y) grid."""
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.kernel import apply_kernel

    li = _table(spark, sf_dir, "lineitem")
    grid = li.groupBy(
        F.pmod("l_partkey", F.lit(30)).cast("int").alias("x"),
        F.pmod("l_suppkey", F.lit(10)).cast("int").alias("y"),
    ).agg(F.sum("l_quantity").alias("value"))
    cube = DataCube(grid, dims=("x", "y"))
    out = apply_kernel(
        cube, [[0, 1, 0], [1, 1, 1], [0, 1, 0]], border="0"
    )
    return out.df


def q_apply_dimension_center(spark, sf_dir):
    """apply_dimension with a length-preserving pandas callback."""
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.apply import apply_dimension

    cells = _li_cells(spark, sf_dir)
    cube = DataCube(
        cells.select("x", "pos", F.col("sq").alias("value")), dims=("x", "pos")
    )
    out = apply_dimension(cube, lambda s: s - s.mean(), "pos")
    return _round6(out.df, "value")


def q_reduce_product(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.reduce import reduce_dimension

    cells = _li_cells(spark, sf_dir)
    cube = DataCube(
        cells.select("x", "pos", (F.col("sd") + 1.0).alias("value")),
        dims=("x", "pos"),
    )
    out = reduce_dimension(cube, "product", "pos")
    # Compare ln(product): products of exact-decimal inputs land exactly on
    # round() boundaries, where the distributed exp∘sum∘ln and DuckDB's
    # exact product() round apart; ln() moves values off the decimal grid.
    return out.df.withColumn("value", F.round(F.log(F.col("value")), 6))


def q_reduce_first(spark, sf_dir):
    """first() reducer: value at the lowest pos per x (unique order col)."""
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.reduce import reduce_dimension

    cells = _li_cells(spark, sf_dir)
    cube = DataCube(
        cells.select("x", "pos", F.col("sq").alias("value")), dims=("x", "pos")
    )
    out = reduce_dimension(cube, "first", "pos")
    return out.df


def q_aggregate_spatial_zonal(spark, sf_dir):
    """aggregate_spatial: zonal mean over a box polygon + a disjoint one."""
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.aggregate_spatial import (
        aggregate_spatial,
    )

    li = _table(spark, sf_dir, "lineitem")
    grid = li.groupBy(
        F.pmod("l_partkey", F.lit(30)).cast("double").alias("x"),
        F.pmod("l_suppkey", F.lit(10)).cast("double").alias("y"),
        F.col("l_returnflag").alias("band"),
    ).agg(F.sum("l_quantity").alias("value"))
    cube = DataCube(grid, dims=("x", "y", "band"))
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "id": "box",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[
                        [1.5, 1.5], [10.5, 1.5], [10.5, 8.5], [1.5, 8.5],
                        [1.5, 1.5],
                    ]],
                },
                "properties": {},
            },
            {
                "type": "Feature",
                "id": "far",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[
                        [100, 100], [101, 100], [101, 101], [100, 101],
                        [100, 100],
                    ]],
                },
                "properties": {},
            },
        ],
    }
    out = aggregate_spatial(cube, fc, "mean")
    return _round6(out, "value")


def q_run_udf_plus1(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.udf import run_udf

    cells = _li_cells(spark, sf_dir)
    cube = DataCube(
        cells.select("x", "pos", F.col("sq").alias("value")), dims=("x", "pos")
    )
    udf = "def apply_datacube(cube, context):\n    return cube + 1\n"
    return run_udf(cube, udf, chunk_dimension="pos").df


def q_fit_curve_linear(spark, sf_dir):
    """fit_curve with a linear model — Gauss-Newton on a linear model is
    OLS, so DuckDB's regr_slope/regr_intercept is an exact oracle."""
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.ml.curve_fitting import fit_curve

    cells = _li_cells(spark, sf_dir).where(F.col("x") % 10 == 0)
    counts = cells.groupBy("x").count().where(F.col("count") >= 3).select("x")
    cells = cells.join(counts, "x")
    cube = DataCube(
        cells.select(
            "x", F.col("pos").cast("double").alias("pos"),
            F.col("sq").alias("value"),
        ),
        dims=("x", "pos"),
        roles={"pos": "other"},
    )
    out = fit_curve(cube, [0.0, 0.0], lambda p, t: p[0] * t + p[1], "pos")
    return out.df.withColumn("value", F.round(F.col("value"), 4))


def q_random_forest(spark, sf_dir):
    """Forest train+predict under a REAL oracle: training is deterministic
    (seeded bootstrap over an o_orderkey-SORTED matrix), so the oracle
    generator re-trains the identical forest in pure NumPy and exports the
    decision rules as SQL CASE chains for DuckDB to evaluate on the same
    test rows (VERDICT r01 #5 — random_forest leaves no_oracle)."""
    _setup(spark)
    from openeo_processes_dask_spark.ml.random_forest import (
        fit_regr_random_forest,
        predict_random_forest,
    )

    o = _table(spark, sf_dir, "orders").select(
        F.pmod("o_custkey", F.lit(50)).cast("double").alias("f1"),
        F.dayofmonth("o_orderdate").cast("double").alias("f2"),
        F.col("o_totalprice").alias("target"),
        "o_orderkey",
    )
    # sort: the bootstrap draws row INDICES, so the matrix row order is part
    # of the model definition — pin it to o_orderkey (unique) on both sides
    train = (
        o.where(F.col("o_orderkey") <= 5000)
        .orderBy("o_orderkey")
        .select("f1", "f2", "target")
    )
    model = fit_regr_random_forest(train, "target", num_trees=8, max_depth=5)
    test = o.where(F.col("o_orderkey") <= 500).select("f1", "f2", "target")
    return predict_random_forest(test, model).select(
        "f1", "f2", F.round("prediction", 4).alias("prediction")
    )


def q_vector_buffer(spark, sf_dir):
    """vector_buffer over points derived from nation keys — rows-only."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.vector import (
        load_geojson,
        vector_buffer,
    )

    n = _table(spark, sf_dir, "nation").collect()
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "id": str(r["n_nationkey"]),
                "geometry": {
                    "type": "Point",
                    "coordinates": [float(r["n_nationkey"]), float(r["n_regionkey"])],
                },
                "properties": {"name": r["n_name"]},
            }
            for r in n
        ],
    }
    vc = load_geojson(spark, fc)
    buffered = vector_buffer(vc, 0.5)
    # verify the RING GEOMETRY, not just row plumbing: parse the buffered
    # polygon back and reduce to bounds + shoelace area (JVM-side array
    # expressions); the oracle rebuilds the same 32-gon with DuckDB trig
    # (libm last-ulp differences vanish under round6)
    ring = F.from_json(
        F.col("geometry"),
        "struct<type:string, coordinates:array<array<array<double>>>>",
    )["coordinates"][0]
    xs = F.transform(ring, lambda p: p[0])
    ys = F.transform(ring, lambda p: p[1])
    cross = F.zip_with(
        F.slice(ring, 1, 32),
        F.slice(ring, 2, 32),
        lambda a, b: a[0] * b[1] - b[0] * a[1],
    )
    area = F.aggregate(cross, F.lit(0.0), lambda acc, v: acc + v) / 2
    return buffered.select(
        "feature_id",
        "name",
        F.round(F.array_min(xs), 6).alias("minx"),
        F.round(F.array_max(xs), 6).alias("maxx"),
        F.round(F.array_min(ys), 6).alias("miny"),
        F.round(F.array_max(ys), 6).alias("maxy"),
        F.round(area, 6).alias("area"),
    )


def q_multimodal_features(spark, sf_dir):
    """Binary-column decode/feature plumbing (deterministic fake decode) —
    rows-only."""
    _setup(spark)
    from openeo_processes_dask_spark.training.multimodal import (
        image_features,
        synthetic_image_table,
    )

    tbl = synthetic_image_table(spark, n=64, width=16, height=12)
    out = image_features(tbl)
    return out.select(
        "doc_id", "width", "height", "channels",
        F.round("mean_intensity", 6).alias("mean_intensity"),
    )


# ----------------------------------------------------------------------
# generated LSH oracles (same seeded constants as the Spark pipelines)
# ----------------------------------------------------------------------

_MD5LONG = "CAST('0x' || substr(md5({v}), 1, 15) AS BIGINT)"


def _minhash_oracle_sql(
    n: int = 3, num_hashes: int = 64, bands: int = 16, threshold: float = 0.2,
    seed: int = 42,
) -> str:
    import random

    from openeo_processes_dask_spark.training.dedup import _P

    rnd = random.Random(seed)
    coeffs = [
        (rnd.randrange(1, _P), rnd.randrange(0, _P)) for _ in range(num_hashes)
    ]
    rows_per_band = num_hashes // bands
    mins = ",\n                ".join(
        f"min(({a} * x + {b}) % {_P}) AS h{i}" for i, (a, b) in enumerate(coeffs)
    )
    band_selects = "\n            UNION ALL ".join(
        "SELECT doc_id, {bi} AS band, md5(concat_ws(',', {cols})) AS bucket FROM sigs".format(
            bi=bi,
            cols=", ".join(
                f"CAST(h{bi * rows_per_band + j} AS VARCHAR)"
                for j in range(rows_per_band)
            ),
        )
        for bi in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN s1.h{i} = s2.h{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes)
    )
    xl = _MD5LONG.format(v="s")
    return f"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
          FROM documents),
        sh AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(generate_series(1, len(w) - {n - 1}),
                        i -> array_to_string(w[i:i+{n - 1}], ' '))) AS s
          FROM toks WHERE len(w) >= {n}),
        xs AS (SELECT doc_id, {xl} % {_P} AS x FROM sh),
        sigs AS (SELECT doc_id, {mins} FROM xs GROUP BY doc_id),
        banded AS ({band_selects}),
        cands AS (
          SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
        SELECT id1, id2,
               round(({agree}) / {float(num_hashes)}, 6) AS est_jaccard
        FROM cands
        JOIN sigs s1 ON s1.doc_id = id1
        JOIN sigs s2 ON s2.doc_id = id2
        WHERE ({agree}) / {float(num_hashes)} >= {threshold}
    """


def _simhash_oracle_sql(max_hamming: int = 6, bands: int = 4) -> str:
    bits = 60
    band_bits = 64 // bands
    mask = (1 << band_bits) - 1
    h = _MD5LONG.format(v="w")
    votes = ",\n                ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END)"
        for b in range(bits)
    )
    band_selects = "\n            UNION ALL ".join(
        f"SELECT doc_id, simhash, {bi} AS band, "
        f"(simhash >> {bi * band_bits}) & {mask} AS chunk FROM sigs"
        for bi in range(bands)
    )
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
          FROM documents WHERE trim(text) <> ''),
        hashes AS (SELECT doc_id, {h} AS h FROM tok),
        votes AS (SELECT doc_id, {votes} FROM hashes GROUP BY doc_id),
        sigs AS (SELECT doc_id, {sig} AS simhash FROM votes),
        banded AS ({band_selects}),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
                 bit_count(xor(a.simhash, b.simhash)) AS hamming
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
        SELECT id1, id2, hamming FROM pairs WHERE hamming <= {max_hamming}
    """




def _plane_sql_literal(plane) -> str:
    return "[" + ", ".join(repr(float(v)) for v in plane) + "]::DOUBLE[]"


def _lsh_bucket_sql(vec: str, planes) -> str:
    """Sign-LSH bucket id as SQL — same fold-left dot order as the engine."""
    terms = []
    for i, plane in enumerate(planes):
        dot = (
            f"list_sum([CAST({vec}[i] AS DOUBLE) * ({_plane_sql_literal(plane)})[i] "
            f"for i in generate_series(1, len({vec}))])"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


_COS_SQL = """round(
      list_sum([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)
                for i in generate_series(1, len({a}))])
      / (sqrt(list_sum([CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)
                for i in generate_series(1, len({a}))]))
         * sqrt(list_sum([CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)
                for i in generate_series(1, len({b}))]))), 6)"""


_COS_RAW_SQL = """(
      list_sum([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)
                for i in generate_series(1, len({a}))])
      / (sqrt(list_sum([CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)
                for i in generate_series(1, len({a}))]))
         * sqrt(list_sum([CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)
                for i in generate_series(1, len({b}))]))))"""


def _ivf_topk_oracle_sql(
    n_centroids: int = 16, nprobe: int = 4, k: int = 10, seed: int = 42
) -> str:
    """Twin of training.similarity.ivf_topk: same seeded md5 centroid
    sample, same max-cosine assignment (fold-left dots are bit-identical
    across engines), same probe set, same exact re-rank."""
    probe_cos = _COS_RAW_SQL.format(a="cvec", b="qv")
    assign_cos = _COS_RAW_SQL.format(a="e.embedding", b="c.cvec")
    final_cos = _COS_SQL.format(a="embedding", b="qv")
    return f"""
        WITH cents AS (
          SELECT vec_id AS cid, embedding AS cvec
          FROM embeddings
          ORDER BY md5('{seed}-' || CAST(vec_id AS VARCHAR))
          LIMIT {n_centroids}),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        probe AS (
          SELECT cid FROM cents, q
          ORDER BY {probe_cos} DESC, cid LIMIT {nprobe}),
        ranked AS (
          SELECT e.vec_id, e.embedding, c.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY {assign_cos} DESC, c.cid) AS rn
          FROM embeddings e CROSS JOIN cents c),
        cands AS (
          SELECT r.vec_id, r.embedding
          FROM ranked r JOIN probe p USING (cid) WHERE r.rn = 1)
        SELECT vec_id, {final_cos} AS cosine
        FROM cands, q
        ORDER BY cosine DESC, vec_id LIMIT {k}
    """


def _kmeans_oracle_sql(
    k: int = 8, iterations: int = 2, seed: int = 42, dim: int = 64
) -> str:
    """Twin of training.clustering kmeans_fit+assign: same md5-ordered
    init, same micro-unit snapping (integer sums are order-independent,
    centroid means bit-identical), Lloyd iterations unrolled as CTE
    pairs (assign_i, cent_{i+1}); empty clusters coalesce to the previous
    centroid exactly like the engine."""
    sqdist = (
        f"list_sum([(v[i] - cent[i]) * (v[i] - cent[i]) "
        f"for i in generate_series(1, {dim})])"
    )
    ctes = [
        f"""sv AS (
          SELECT vec_id,
                 list_transform(embedding,
                                x -> round(CAST(x AS DOUBLE) * 1000000.0)) AS v
          FROM embeddings)""",
        f"""cent0 AS (
          SELECT row_number() OVER (
                   ORDER BY md5('{seed}-' || CAST(vec_id AS VARCHAR))) - 1 AS c,
                 list_transform(embedding,
                                x -> round(CAST(x AS DOUBLE) * 1000000.0)) AS cent
          FROM embeddings
          ORDER BY md5('{seed}-' || CAST(vec_id AS VARCHAR))
          LIMIT {k})""",
        f"js AS (SELECT unnest(generate_series(1, {dim})) AS j)",
    ]
    for it in range(iterations):
        ctes.append(
            f"""assign{it} AS (
          SELECT vec_id, c FROM (
            SELECT sv.vec_id, c0.c,
                   row_number() OVER (PARTITION BY sv.vec_id
                     ORDER BY {sqdist}, c0.c) AS rn
            FROM sv, cent{it} c0)
          WHERE rn = 1)"""
        )
        ctes.append(
            f"""mean{it} AS (
          SELECT a.c, j, sum(v[j]) / count(*) AS m
          FROM assign{it} a JOIN sv USING (vec_id), js
          GROUP BY a.c, j)"""
        )
        ctes.append(
            f"""cent{it + 1} AS (
          SELECT p.c,
                 coalesce(n.cent, p.cent) AS cent
          FROM cent{it} p LEFT JOIN
               (SELECT c, list(m ORDER BY j) AS cent FROM mean{it} GROUP BY c) n
               USING (c))"""
        )
    body = ",\n        ".join(ctes)
    return f"""
        WITH {body}
        SELECT vec_id, c AS cluster FROM (
          SELECT sv.vec_id, c0.c,
                 row_number() OVER (PARTITION BY sv.vec_id
                   ORDER BY {sqdist}, c0.c) AS rn
          FROM sv, cent{iterations} c0)
        WHERE rn = 1
    """


def _pq_topk_oracle_sql(
    m: int = 4, ks: int = 8, k: int = 12, seed: int = 42, dim: int = 64
) -> str:
    """Twin of training.similarity.pq_topk: same md5-ordered codebook
    sample, same per-subspace argmin encode (ties on lower code), same
    query LUT distances, same fixed-order ADC sum — every distance a
    left-to-right fold, so rankings match bit-for-bit."""
    sub = dim // m
    js = ", ".join(str(j) for j in range(m))
    d_terms = " + ".join(f"d{j}" for j in range(m))
    # fixed-order sum ((d0 + d1) + d2) + d3 — mirrors the engine's Column
    # `+` chain exactly
    adc = "d0"
    for j in range(1, m):
        adc = f"({adc} + d{j})"
    pivots = ",\n                 ".join(
        f"max(CASE WHEN e.j = {j} THEN l.d END) AS d{j}" for j in range(m)
    )
    sqdist = (
        f"list_sum([(v[i] - c[i]) * (v[i] - c[i]) "
        f"for i in generate_series(1, {sub})])"
    )
    qdist = (
        f"list_sum([(qv[i] - c[i]) * (qv[i] - c[i]) "
        f"for i in generate_series(1, {sub})])"
    )
    return f"""
        WITH cb AS (
          SELECT row_number() OVER (
                   ORDER BY md5('{seed}-' || CAST(vec_id AS VARCHAR))) - 1 AS cidx,
                 embedding AS cvec
          FROM embeddings
          ORDER BY md5('{seed}-' || CAST(vec_id AS VARCHAR))
          LIMIT {ks}),
        js AS (SELECT unnest([{js}]) AS j),
        subc AS (
          SELECT cidx, j,
                 list_transform(list_slice(cvec, j * {sub} + 1, j * {sub} + {sub}),
                                x -> CAST(x AS DOUBLE)) AS c
          FROM cb, js),
        vs AS (
          SELECT vec_id, j,
                 list_transform(list_slice(embedding, j * {sub} + 1, j * {sub} + {sub}),
                                x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings, js),
        enc AS (
          SELECT vec_id, j, cidx AS code FROM (
            SELECT vs.vec_id, vs.j, s.cidx,
                   row_number() OVER (PARTITION BY vs.vec_id, vs.j
                     ORDER BY {sqdist}, s.cidx) AS rn
            FROM vs JOIN subc s USING (j))
          WHERE rn = 1),
        q AS (SELECT j, list_transform(list_slice(embedding, j * {sub} + 1,
                                                  j * {sub} + {sub}),
                                       x -> CAST(x AS DOUBLE)) AS qv
              FROM embeddings, js WHERE vec_id = 0),
        lut AS (
          SELECT s.j, s.cidx, {qdist} AS d
          FROM subc s JOIN q USING (j)),
        sc AS (
          SELECT e.vec_id,
                 {pivots}
          FROM enc e JOIN lut l ON e.j = l.j AND e.code = l.cidx
          GROUP BY e.vec_id)
        SELECT vec_id, round({adc}, 6) AS adc
        FROM sc ORDER BY {adc}, vec_id LIMIT {k}
    """


def _lsh_topk_oracle_sql(n_planes: int = 12, k: int = 10, seed: int = 42) -> str:
    from openeo_processes_dask_spark.training.similarity import (
        random_hyperplanes,
    )

    planes = random_hyperplanes(64, n_planes, seed)
    bucket_e = _lsh_bucket_sql("e.embedding", planes)
    bucket_q = _lsh_bucket_sql("q.embedding", planes)
    cos = _COS_SQL.format(a="e.embedding", b="q.embedding")
    return f"""
        WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, {cos} AS cosine
        FROM embeddings e, q
        WHERE {bucket_e} = {bucket_q}
        ORDER BY cosine DESC, e.vec_id LIMIT {k}
    """


class _SqlExpr:
    """SQL-text expression node: lets the shared Krüger-series formula
    (functions/crs.py `_tm_forward`, generic over an ops namespace) emit
    its DuckDB oracle directly — one formula, three lanes (Column, scalar,
    SQL)."""

    def __init__(self, s: str):
        self.s = s

    def _b(self, op, o):
        o = o.s if isinstance(o, _SqlExpr) else repr(float(o))
        return _SqlExpr(f"({self.s} {op} {o})")

    __add__ = lambda self, o: self._b("+", o)  # noqa: E731
    __sub__ = lambda self, o: self._b("-", o)  # noqa: E731
    __mul__ = lambda self, o: self._b("*", o)  # noqa: E731
    __truediv__ = lambda self, o: self._b("/", o)  # noqa: E731


def _sql_fn(name):
    def call(x):
        return _SqlExpr(f"{name}({x.s})")

    return staticmethod(call)


class _SqlOps:
    sin = _sql_fn("sin")
    cos = _sql_fn("cos")
    atan = _sql_fn("atan")
    asin = _sql_fn("asin")
    sqrt = _sql_fn("sqrt")
    log = _sql_fn("ln")

    # DuckDB has no sinh/cosh builtins — exponential identities; the JVM
    # builtins differ only in the last ulp, absorbed by the gate's round(2)
    @staticmethod
    def sinh(x):
        return _SqlExpr(f"((exp({x.s}) - exp(-({x.s}))) / 2.0)")

    @staticmethod
    def cosh(x):
        return _SqlExpr(f"((exp({x.s}) + exp(-({x.s}))) / 2.0)")

    @staticmethod
    def atan2(a, b):
        return _SqlExpr(f"atan2({a.s}, {b.s})")

    @staticmethod
    def lit(v):
        return _SqlExpr(repr(float(v)))

    @staticmethod
    def atanh(x):
        return _SqlExpr(f"(0.5 * ln((1.0 + {x.s}) / (1.0 - {x.s})))")


_KERNEL_SQL = {
    # weight CASE bodies over the inlined distance expression {d}; op order
    # mirrors the engine's Column polynomials exactly (bit-identical for
    # the polynomial kernels; lanczos differs only in libm sin() ulps,
    # absorbed by the gate's round(6))
    "cubic": (
        "(-1), (0), (1), (2)",
        "CASE WHEN {d} <= 1.0"
        " THEN ((1.5 * {d} - 2.5) * {d} * {d} + 1.0)"
        " WHEN {d} < 2.0"
        " THEN (((-0.5 * {d} + 2.5) * {d} - 4.0) * {d} + 2.0)"
        " ELSE 0.0 END",
    ),
    "cubicspline": (
        "(-1), (0), (1), (2)",
        "CASE WHEN {d} <= 1.0"
        " THEN (2.0 / 3.0 - {d} * {d} + {d} * {d} * {d} * 0.5)"
        " WHEN {d} < 2.0"
        " THEN ((2.0 - {d}) * (2.0 - {d}) * (2.0 - {d}) / 6.0)"
        " ELSE 0.0 END",
    ),
    "lanczos": (
        "(-2), (-1), (0), (1), (2), (3)",
        "CASE WHEN {d} = 0.0 THEN 1.0"
        " WHEN {d} < 3.0"
        " THEN ((3.0 * sin(3.141592653589793 * {d})"
        " * sin(3.141592653589793 * {d} / 3.0))"
        " / (9.869604401089358 * {d} * {d}))"
        " ELSE 0.0 END",
    ),
    "gauss": (
        "(-2), (-1), (0), (1), (2), (3)",
        "CASE WHEN {d} < 3.0 THEN exp(-({d} * {d}) / 2.0) ELSE 0.0 END",
    ),
}


def _resample_kernel_oracle_sql(kernel: str, res: float = 2.5) -> str:
    """Twin of the convolution resample gates: same geometry probe as the
    bilinear oracle, kernel taps per axis with edge-clamped indices; the
    kernel polynomial is written with the engine's exact op order so
    weights are bit-identical (lanczos: last-ulp libm, under round(6))."""
    tap_vals, weight_tpl = _KERNEL_SQL[kernel]

    def axis(ax, tcol, wcol, gx):
        d = f"abs(o.d - t.{wcol})"
        weight = weight_tpl.format(d=d)
        return f"""
            map{ax} AS (
              SELECT t.t{ax},
                     {gx}.o + greatest(0, least(t.i0 + o.d, {gx}.n - 1))
                       * {gx}.s AS s{ax},
                     {weight} AS w{ax}v
              FROM (SELECT t{ax},
                           least(floor((t{ax} - {gx}.o) / {gx}.s),
                                 {gx}.n - 2) AS i0,
                           (t{ax} - {gx}.o) / {gx}.s
                             - least(floor((t{ax} - {gx}.o) / {gx}.s),
                                     {gx}.n - 2) AS {wcol}
                    FROM (SELECT {gx}.o + k.generate_series * {res} AS t{ax}
                          FROM generate_series(0, 100000) k, {gx}
                          WHERE k.generate_series
                                <= floor(({gx}.m - {gx}.o) / {res} + 1e-9)),
                         {gx}) t,
                   {gx}, (VALUES {tap_vals}) o(d)
              WHERE {weight} != 0)"""

    return f"""
        WITH {_GRID_CTE},
        gx AS (SELECT min(v) AS o, max(v) AS m,
                      min(CASE WHEN d > 0 THEN d END) AS s, count(*) AS n
               FROM (SELECT v, v - lag(v) OVER (ORDER BY v) AS d
                     FROM (SELECT DISTINCT x AS v FROM grid))),
        gy AS (SELECT min(v) AS o, max(v) AS m,
                      min(CASE WHEN d > 0 THEN d END) AS s, count(*) AS n
               FROM (SELECT v, v - lag(v) OVER (ORDER BY v) AS d
                     FROM (SELECT DISTINCT y AS v FROM grid))),
        {axis('x', 'tx', 'wx', 'gx')},
        {axis('y', 'ty', 'wy', 'gy')},
        mapping AS (
          SELECT tx, ty, sx, sy, wxv * wyv AS w
          FROM mapx CROSS JOIN mapy)
        SELECT m.tx AS x, m.ty AS y, g.band,
               round(sum(m.w * g.value) / sum(m.w), 6) AS value
        FROM grid g JOIN mapping m ON g.x = m.sx AND g.y = m.sy
        GROUP BY 1, 2, 3
    """


def _dedup_clusters_oracle_sql() -> str:
    """Twin of q_dedup_clusters: the minhash pair SQL becomes a nested CTE,
    then a recursive transitive closure takes the per-node minimum
    reachable id — exact connected components."""
    mh = _minhash_oracle_sql()
    return f"""
        WITH RECURSIVE mh AS ({mh}),
        edges AS (
          SELECT id1 AS u, id2 AS v FROM mh
          UNION SELECT id2, id1 FROM mh),
        reach(a, b) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u),
        comp AS (
          SELECT a AS id, least(a, min(b)) AS comp FROM reach GROUP BY a)
        SELECT id, comp FROM comp ORDER BY id
    """


def _crs_utm_oracle_sql() -> str:
    from openeo_processes_dask_spark.functions.crs import _tm_forward

    lon = _SqlExpr("((x / 10.0) + 7.5)")
    lat = _SqlExpr("((y / 10.0) + 45.0)")
    e, n = _tm_forward(_SqlOps, lat, lon, 9.0, True)
    return f"""
        WITH {_GRID_CTE}
        SELECT x, y, band, round({e.s}, 2) AS easting,
               round({n.s}, 2) AS northing
        FROM grid
    """


def _multimodal_features_oracle_sql(n: int = 64, w: int = 16, h: int = 12) -> str:
    """Expected image features computed independently in NumPy from the
    shared deterministic fake decode (PCG64 is not SQL-expressible, so the
    oracle bakes the expected values rather than re-deriving them in SQL —
    same move as the exported forest rules)."""
    import hashlib as _hl

    from openeo_processes_dask_spark.training.multimodal import _fake_decode

    rows = []
    for i in range(n):
        payload = _hl.sha256(f"img-{i}".encode()).digest() * 4
        img = _fake_decode(payload, w, h)
        mean = float(img.astype("float64").mean())
        rows.append(f"({i}, {w}, {h}, 3, {round(mean, 6)!r})")
    vals = ", ".join(rows)
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(width AS INT) AS width,
               CAST(height AS INT) AS height, CAST(channels AS INT) AS channels,
               CAST(mean_intensity AS DOUBLE) AS mean_intensity
        FROM (VALUES {vals}) AS t(doc_id, width, height, channels, mean_intensity)
    """


def _multimodal_resize_oracle_sql(
    n: int = 32, w: int = 16, h: int = 12, tw: int = 8, th: int = 8
) -> str:
    """Byte-exact resize digests: same integer-index nearest-neighbor math
    as training.multimodal.resize_images, md5'd independently."""
    import hashlib as _hl

    import numpy as np

    from openeo_processes_dask_spark.training.multimodal import _fake_decode

    rows = []
    yi = (np.arange(th) * h) // th
    xi = (np.arange(tw) * w) // tw
    for i in range(n):
        payload = _hl.sha256(f"img-{i}".encode()).digest() * 4
        img = _fake_decode(payload, w, h)
        digest = _hl.md5(img[yi][:, xi].tobytes()).hexdigest()
        rows.append(f"({i}, {tw}, {th}, '{digest}')")
    vals = ", ".join(rows)
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(width AS INT) AS width,
               CAST(height AS INT) AS height, digest
        FROM (VALUES {vals}) AS t(doc_id, width, height, digest)
    """


def _multimodal_av_oracle_sql(
    n: int = 8, n_frames: int = 30, vw: int = 8, vh: int = 6,
    every_n: int = 10, sample_rate: int = 8000, n_samples: int = 4000,
) -> str:
    """Expected frame means + FFT spectral centroids, recomputed
    independently from the deterministic fake decodes."""
    import hashlib as _hl

    import numpy as np

    from openeo_processes_dask_spark.training.multimodal import (
        _fake_decode_audio,
        _fake_decode_video,
    )

    rows = []
    for i in range(n):
        payload = _hl.sha256(f"vid-{i}".encode()).digest() * 2
        vid = _fake_decode_video(payload, n_frames, vw, vh)
        for idx in range(0, n_frames, every_n):
            v = float(vid[idx].astype("float64").mean())
            rows.append(f"({i}, {idx}, {round(v, 6)!r})")
    for i in range(n):
        payload = _hl.sha256(f"aud-{i}".encode()).digest() * 2
        y = _fake_decode_audio(payload, n_samples).astype("float64")
        spec = np.abs(np.fft.rfft(y))
        freqs = np.fft.rfftfreq(len(y), d=1.0 / sample_rate)
        centroid = float((freqs * spec).sum() / spec.sum())
        rows.append(f"({i}, -1, {round(centroid, 6)!r})")
    vals = ", ".join(rows)
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(idx AS INT) AS idx,
               CAST(v AS DOUBLE) AS v
        FROM (VALUES {vals}) AS t(doc_id, idx, v)
    """


def _random_forest_oracle_sql(
    num_trees: int = 8, max_depth: int = 5, min_leaf: int = 2, seed: int = 42
) -> str:
    """Twin of q_random_forest: re-train the identical seeded CART forest in
    pure NumPy (training is engine-independent given the sorted matrix —
    same _build_tree, same per-tree rng) from the same parquet, then export
    every tree as a SQL CASE chain. DuckDB evaluates the ensemble
    (left-to-right tree sum, matching ForestModel.predict) on the same test
    rows — a full decision-rules oracle, not a row count."""
    import os

    import duckdb
    import numpy as np

    from openeo_processes_dask_spark.ml.random_forest import _build_tree

    sf = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    pdf = con.sql(
        f"""
        SELECT CAST(o_custkey % 50 AS DOUBLE) AS f1,
               CAST(extract(day FROM o_orderdate) AS DOUBLE) AS f2,
               o_totalprice AS target
        FROM '{sf}/orders.parquet'
        WHERE o_orderkey <= 5000 ORDER BY o_orderkey
        """
    ).df()
    X = pdf[["f1", "f2"]].to_numpy(dtype="float64")
    y = pdf["target"].to_numpy(dtype="float64")
    n_feat = max(1, int(np.sqrt(X.shape[1])))
    trees = []
    for t in range(num_trees):
        rng = np.random.default_rng(seed + t)
        boot = rng.integers(0, len(y), size=len(y))
        trees.append(
            _build_tree(X[boot], y[boot], rng, max_depth, min_leaf, n_feat)
        )

    feats = ["f1", "f2"]

    def tsql(node):
        if "leaf" in node:
            return repr(node["leaf"])
        return (
            f"(CASE WHEN {feats[node['f']]} <= {node['thr']!r} "
            f"THEN {tsql(node['l'])} ELSE {tsql(node['r'])} END)"
        )

    acc = tsql(trees[0])
    for t in trees[1:]:
        acc = f"({acc} + {tsql(t)})"
    return f"""
        SELECT CAST(o_custkey % 50 AS DOUBLE) AS f1,
               CAST(extract(day FROM o_orderdate) AS DOUBLE) AS f2,
               round({acc} / {num_trees}, 4) AS prediction
        FROM orders WHERE o_orderkey <= 500
    """


def _embedding_near_dups_oracle_sql(
    threshold: float = 0.2,
    n_planes: int = 4,
    n_bands: int = 2,
    seed: int = 42,
) -> str:
    """Banded sign-LSH twin: per-band bucket columns, candidates = pairs
    colliding in >=1 band, exact cosine verify."""
    from openeo_processes_dask_spark.training.similarity import (
        random_hyperplanes,
    )

    planes = random_hyperplanes(64, n_planes * n_bands, seed)
    band_cols = ", ".join(
        f"{_lsh_bucket_sql('embedding', planes[b * n_planes:(b + 1) * n_planes])} AS b{b}"
        for b in range(n_bands)
    )
    any_band = " OR ".join(f"a.b{b} = b.b{b}" for b in range(n_bands))
    cos = _COS_SQL.format(a="a.v", b="b.v")
    return f"""
        WITH tagged AS (
          SELECT vec_id AS id, embedding AS v, {band_cols}
          FROM embeddings)
        SELECT a.id AS id1, b.id AS id2, {cos} AS cosine
        FROM tagged a JOIN tagged b
          ON ({any_band}) AND a.id < b.id
        WHERE {cos} >= {threshold}
    """




def q_streaming_daily_sum(spark, sf_dir):
    """Structured Streaming twin of the daily aggregation: drain the events
    table through readStream (Trigger.AvailableNow) and return the final
    windowed state — oracle-checked against the equivalent batch SQL."""
    _setup(spark)
    import os
    import tempfile

    from openeo_processes_dask_spark.streaming.events import (
        run_stream_to_memory,
        stream_aggregate_temporal_period,
        stream_events,
    )

    stream_dir = os.path.join(
        tempfile.gettempdir(), f"events_stream_{os.path.basename(sf_dir)}"
    )
    if not os.path.isdir(stream_dir):
        # one-time: re-write the fixture as a streaming source dir (also
        # normalizes the nanosecond timestamps the stream reader can't take)
        _table(spark, sf_dir, "events").coalesce(4).write.mode(
            "overwrite"
        ).parquet(stream_dir)
    stream = stream_events(spark, stream_dir, max_files_per_trigger=2)
    out = stream_aggregate_temporal_period(stream, "1 day", "1 hour", "sum")
    name = f"q_stream_{abs(hash(sf_dir)) % 10_000}"
    q = run_stream_to_memory(out, name)
    q.awaitTermination(300)
    return spark.table(name).select(
        "t", "band", F.round("value", 6).alias("value")
    )




def q_streaming_sliding_sum(spark, sf_dir):
    """Sliding-window streaming aggregate (3-day window, 1-day slide):
    every event lands in 3 windows; the final drained state must equal the
    batch expansion (each event duplicated to window starts d-2, d-1, d)."""
    _setup(spark)
    import os
    import tempfile

    from openeo_processes_dask_spark.streaming.events import (
        run_stream_to_memory,
        stream_aggregate_sliding,
        stream_events,
    )

    stream_dir = os.path.join(
        tempfile.gettempdir(), f"events_stream_{os.path.basename(sf_dir)}"
    )
    if not os.path.isdir(stream_dir):
        _table(spark, sf_dir, "events").coalesce(4).write.mode(
            "overwrite"
        ).parquet(stream_dir)
    stream = stream_events(spark, stream_dir, max_files_per_trigger=2)
    out = stream_aggregate_sliding(stream, "3 days", "1 day", "1 hour", "sum")
    name = f"q_slide_{abs(hash(sf_dir)) % 10_000}"
    q = run_stream_to_memory(out, name)
    q.awaitTermination(300)
    return spark.table(name).select(
        "t", "band", F.round("value", 6).alias("value")
    )


def q_streaming_dedup(spark, sf_dir):
    """Streaming exact dedup (dropDuplicatesWithinWatermark): drain the
    events table as ONE micro-batch (single file, AvailableNow) so every
    distinct (user, band, day) key is emitted exactly once — the emitted
    KEY SET is deterministic even though which duplicate row wins the
    state race is not, so the query returns keys only and the oracle is
    SELECT DISTINCT."""
    _setup(spark)
    import os
    import tempfile

    from openeo_processes_dask_spark.streaming.events import (
        run_stream_to_memory,
        stream_dedup_exact,
        stream_events,
    )

    stream_dir = os.path.join(
        tempfile.gettempdir(), f"events_stream1_{os.path.basename(sf_dir)}"
    )
    if not os.path.isdir(stream_dir):
        # single sorted file: one micro-batch == sorted replay (oracle
        # convention for stateful streaming)
        _table(spark, sf_dir, "events").orderBy("ts").coalesce(1).write.mode(
            "overwrite"
        ).parquet(stream_dir)
    stream = stream_events(spark, stream_dir, max_files_per_trigger=None)
    keyed = stream.withColumn("day", F.date_trunc("day", F.col("t")))
    out = stream_dedup_exact(keyed, ["user_id", "band", "day"], "1 hour")
    name = f"q_sdedup_{abs(hash(sf_dir)) % 10_000}"
    q = run_stream_to_memory(out.select("user_id", "band", "day"), name,
                             output_mode="append")
    q.awaitTermination(300)
    return spark.table(name).select("user_id", "band", "day")


def q_save_load_roundtrip(spark, sf_dir):
    """save_result (band-partitioned parquet sink) -> load_parquet_cube:
    the write/read cycle must be lossless (reference has no in-repo sink —
    SURVEY.md §2.1; partitioning by band makes per-band reads prune)."""
    _setup(spark)
    import os
    import tempfile

    from openeo_processes_dask_spark.sources.load import (
        load_parquet_cube,
        save_result,
    )

    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"save_gate_{os.path.basename(sf_dir)}",
    )
    save_result(_grid_cube(spark, sf_dir), out_dir)
    back = load_parquet_cube(spark, out_dir, dims=("x", "y", "band"))
    return _round6(back.df.select("x", "y", "band", "value"), "value")


def q_load_url_geojson(spark, sf_dir):
    """load_url over a file:// GeoJSON written from nation rows
    (reference: cubes/load.py:325-401): URL scheme handling + GeoJSON
    parsing verified by parsing coordinates back out of the loaded rows."""
    _setup(spark)
    import json
    import os
    import tempfile

    from openeo_processes_dask_spark.operators.vector import load_url

    n = _table(spark, sf_dir, "nation").collect()
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {
                    "type": "Point",
                    "coordinates": [
                        float(r["n_nationkey"]),
                        float(r["n_regionkey"]),
                    ],
                },
                "properties": {"name": r["n_name"]},
            }
            for r in n
        ],
    }
    path = os.path.join(tempfile.gettempdir(), "load_url_gate.geojson")
    with open(path, "w") as fh:
        json.dump(fc, fh)
    vc = load_url(f"file://{path}", format="GeoJSON")
    pt = F.from_json(
        F.col("geometry"), "struct<type:string, coordinates:array<double>>"
    )["coordinates"]
    return vc.select(
        "feature_id",
        "name",
        F.round(pt[0], 6).alias("px"),
        F.round(pt[1], 6).alias("py"),
    )


def q_reduce_any(spark, sf_dir):
    """any/all Kleene reducers over a boolean cube."""
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.reduce import reduce_dimension

    ev = _table(spark, sf_dir, "events")
    cube = DataCube(
        ev.select(
            F.col("user_id"),
            F.col("ts").alias("t"),
            F.col("event_type").alias("band"),
            (F.col("value") > 100).alias("value"),
        ),
        dims=("user_id", "t", "band"),
    )
    return reduce_dimension(cube, "any", "t").df


def q_reduce_count_condition(spark, sf_dir):
    """count reducer with a condition callback (reference: arrays.py:587)."""
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.reduce import reduce_dimension

    cells = _li_cells(spark, sf_dir)
    cube = DataCube(
        cells.select("x", "pos", F.col("sq").alias("value")), dims=("x", "pos")
    )
    return reduce_dimension(
        cube, "count", "pos", condition=F.col("value") > 30
    ).df


def q_process_graph(spark, sf_dir):
    """The flagship pipeline expressed as OpenEO process-graph JSON and run
    through plans/graph.py — the executor itself under the oracle gate."""
    _setup(spark)
    from openeo_processes_dask_spark.plans import execute_process_graph

    pg = {
        "process_graph": {
            "ft": {
                "process_id": "filter_temporal",
                "arguments": {
                    "data": {"from_parameter": "data"},
                    "extent": ["2024-01-01", "2024-02-01"],
                },
            },
            "agg": {
                "process_id": "aggregate_temporal_period",
                "arguments": {
                    "data": {"from_node": "ft"},
                    "period": "day",
                    "reducer": "mean",
                },
            },
            # Snap the inner aggregate to integer micro-units (see _flagship
            # — exact outer sum) — expressed IN the graph as an apply
            # callback chaining multiply→round, so the gate also exercises
            # the callback→Column compiler with nested nodes and a literal
            # extra argument. Engine round == bround (half-even) ⇔ oracle
            # round_even().
            "rnd": {
                "process_id": "apply",
                "arguments": {
                    "data": {"from_node": "agg"},
                    "process": {
                        "process_graph": {
                            "m": {
                                "process_id": "multiply",
                                "arguments": {
                                    "x": {"from_parameter": "x"},
                                    "y": 1000000.0,
                                },
                            },
                            "r": {
                                "process_id": "round",
                                "arguments": {
                                    "x": {"from_node": "m"},
                                    "p": 0,
                                },
                                "result": True,
                            },
                        }
                    },
                },
            },
            "red": {
                "process_id": "reduce_dimension",
                "arguments": {
                    "data": {"from_node": "rnd"},
                    "reducer": "mean",
                    "dimension": "user_id",
                },
                "result": True,
            },
        }
    }
    out = execute_process_graph(pg, {"data": _events_cube(spark, sf_dir)})
    return out.df.withColumn("value", F.round(F.col("value") / 1e6, 6))


# ----------------------------------------------------------------------
# coverage widening: spatial filter/mask, resampling, windows, arrays,
# dimension management, curve prediction, text scalars
# ----------------------------------------------------------------------

# Rectangle with half-integer bounds: no grid point ever sits on an edge,
# so ray-casting (engine) and strict range predicates (oracle) agree.
_RECT = {
    "type": "Polygon",
    "coordinates": [
        [[2.5, 1.5], [10.5, 1.5], [10.5, 8.5], [2.5, 8.5], [2.5, 1.5]]
    ],
}

_RECT_SQL = "x > 2.5 AND x < 10.5 AND y > 1.5 AND y < 8.5"

_GRID_CTE = """
    grid AS (
      SELECT CAST(l_partkey % 30 AS DOUBLE) AS x,
             CAST(l_suppkey % 10 AS DOUBLE) AS y,
             l_returnflag AS band, sum(l_quantity) AS value
      FROM lineitem GROUP BY 1, 2, 3)
"""

_IDX_CTE = """
    idx AS (
      SELECT x, sq, row_number() OVER (PARTITION BY x ORDER BY pos) - 1 AS i
      FROM cells)
"""


def _grid_cube(spark, sf_dir):
    """Dense (x, y, band) raster-like cube folded from lineitem."""
    from openeo_processes_dask_spark.cube import DataCube

    df = (
        _table(spark, sf_dir, "lineitem")
        .groupBy(
            (F.col("l_partkey") % 30).cast("double").alias("x"),
            (F.col("l_suppkey") % 10).cast("double").alias("y"),
            F.col("l_returnflag").alias("band"),
        )
        .agg(F.sum("l_quantity").alias("value"))
    )
    return DataCube(df, dims=("x", "y", "band"))


def _cells_cube(spark, sf_dir):
    from openeo_processes_dask_spark.cube import DataCube

    cells = _li_cells(spark, sf_dir)
    return DataCube(
        cells.select("x", "pos", F.col("sq").alias("value")), dims=("x", "pos")
    )


def q_filter_spatial(spark, sf_dir):
    """filter_spatial: bbox crop + point-in-polygon drop
    (reference: cubes/_filter.py:152-168)."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.filters import filter_spatial

    return filter_spatial(_grid_cube(spark, sf_dir), _RECT).df


def q_mask_polygon(spark, sf_dir):
    """mask_polygon with a replacement value
    (reference: cubes/mask_polygon.py:27-163)."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.mask import mask_polygon

    return mask_polygon(_grid_cube(spark, sf_dir), _RECT, replacement=-1.0).df


def q_apply_polygon(spark, sf_dir):
    """apply_polygon: mask -> apply(sqrt) -> re-mask
    (reference: cubes/apply.py:185-219)."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.mask import apply_polygon

    out = apply_polygon(_grid_cube(spark, sf_dir), _RECT, "sqrt")
    return _round6(out.df, "value")


def q_trim_cube(spark, sf_dir):
    """trim_cube: drop labels that are all-NULL along each non-spatial dim
    (reference: cubes/general.py:42-56); here band 'view' is nulled out."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.general import trim_cube

    cube = _events_cube(spark, sf_dir)
    nulled = cube.with_df(
        cube.df.withColumn(
            "value",
            F.when(F.col("band") == "view", F.lit(None).cast("double")).otherwise(
                F.col("value")
            ),
        )
    )
    return trim_cube(nulled).df.drop("__t_ns__")


def q_order_argsort(spark, sf_dir):
    """order(): stable argsort along a dim (reference: arrays.py:498-535)."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.windows import order as order_op

    return order_op(_cells_cube(spark, sf_dir), "pos").df


def q_rearrange(spark, sf_dir):
    """rearrange: take-by-permutation [2, 0, 1] along the pos dim
    (reference: arrays.py:538-555)."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.windows import rearrange

    return rearrange(_cells_cube(spark, sf_dir), [2, 0, 1], "pos").df


def q_resample_spatial_grid(spark, sf_dir):
    """resample_spatial: snap to a 100-unit grid, mean per cell
    (reference: cubes/resample.py:39-113)."""
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.resample import resample_spatial

    df = _table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("double").alias("x"),
        F.col("l_suppkey").cast("double").alias("y"),
        F.col("l_returnflag").alias("band"),
        F.col("l_quantity").alias("value"),
    )
    out = resample_spatial(
        DataCube(df, dims=("x", "y", "band")), resolution=100.0, method="mean"
    )
    return _round6(out.df, "value")


def q_resample_cube_spatial_coarse(spark, sf_dir):
    """resample_cube_spatial: regrid onto a target cube whose labels are
    floored multiples of 3 (reference: cubes/resample.py:116-180). No source
    label is ever equidistant to two targets, so the nearest map is
    deterministic on both sides."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.resample import (
        resample_cube_spatial,
    )

    data = _grid_cube(spark, sf_dir)
    target = data.with_df(
        data.df.select(
            (F.col("x") - F.col("x") % 3).alias("x"),
            (F.col("y") - F.col("y") % 3).alias("y"),
            "band",
            "value",
        )
    )
    out = resample_cube_spatial(data, target, method="mean")
    return _round6(out.df, "value")


def q_resample_cube_spatial_near(spark, sf_dir):
    """resample_cube_spatial method='near': target labels at grid+0.25 so
    every target has a UNIQUE nearest source (no tie-break dependence);
    each target label is fed by exactly one deterministic source
    (reference: cubes/resample.py:116-180, nearest reindex)."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.resample import (
        resample_cube_spatial,
    )

    data = _grid_cube(spark, sf_dir)
    target = data.with_df(
        data.df.select(
            (F.floor(F.col("x") / 4) * 4 + 0.25).alias("x"),
            (F.floor(F.col("y") / 4) * 4 + 0.25).alias("y"),
            "band",
            "value",
        )
    )
    out = resample_cube_spatial(data, target, method="near")
    return _round6(out.df, "value")


def q_rename_labels_enumerated(spark, sf_dir):
    """rename_labels with source omitted (reference: cubes/general.py:
    197-211): x labels are enumerated 0..29, a 3-element target renames the
    first three positionally (sorted label order), rest unchanged."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.general import rename_labels

    out = rename_labels(
        _grid_cube(spark, sf_dir), "x", target=[-1.0, -2.0, -3.0]
    )
    return _round6(out.df, "value")


def q_reduce_quantiles(spark, sf_dir):
    """quantiles reducer (probabilities form): exact interpolated
    percentiles per (x, band), exploded to one row per probability
    (reference: math.py:341-387; Spark percentile == np.quantile linear ==
    DuckDB quantile_cont)."""
    _setup(spark)
    from openeo_processes_dask_spark.functions.reducers import quantiles

    df = _table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("x"),
        F.col("l_returnflag").alias("band"),
        F.col("l_quantity").alias("value"),
    )
    agg = df.groupBy("x", "band").agg(
        quantiles(F.col("value"), probabilities=[0.25, 0.75]).alias("qs")
    )
    return agg.select(
        "x", "band", F.posexplode("qs").alias("pos", "value")
    ).withColumn("value", F.round("value", 6))


def q_resample_cubic(spark, sf_dir):
    """resample_spatial method='cubic': bicubic Catmull-Rom warp via the
    separable tap-map join (operators/resample.py _resample_convolved).
    Oracle replays the same geometry probe + kernel polynomial in SQL."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.resample import resample_spatial

    out = resample_spatial(_grid_cube(spark, sf_dir), resolution=2.5,
                           method="cubic")
    return _round6(out.df, "value")


def q_apply_neighborhood_2d(spark, sf_dir):
    """apply_neighborhood with the reference's multi-dim size dict —
    reference-faithful STRIDED semantics (apply_neighborhood_intertwin.py:
    40-43): size 3×3 ⇒ window 3×3 at every 3rd position (non-overlapping
    tiling), median per tile. Median is deliberately non-convolutional —
    apply_kernel can't express it. Oracle joins each strided center to
    its |Δ|≤1 rectangle."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.kernel import apply_neighborhood

    out = apply_neighborhood(
        _grid_cube(spark, sf_dir), "median", size={"x": 3, "y": 3}
    )
    return _round6(out.df, "value")


def q_apply_neighborhood_2d_mean(spark, sf_dir):
    """apply_neighborhood dense 3×3 rolling mean — the reference's
    size≤0 + overlap spelling (stride clamps to 1) — routes to the
    SEPARABLE plan (operators/kernel.py _apply_neighborhood_separable):
    one integer-range window pass per dim, zero fan-out. Oracle is the
    direct rectangle self-join, so this gate proves the two-pass
    decomposition equals the true 2-D neighborhood mean."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.kernel import apply_neighborhood

    out = apply_neighborhood(
        _grid_cube(spark, sf_dir), "mean",
        size={"x": -1, "y": -1}, overlap={"x": 2, "y": 2},
    )
    return _round6(out.df, "value")


def q_resample_cubicspline(spark, sf_dir):
    """resample_spatial method='cubicspline' (B-spline smoothing kernel,
    odc resampling list)."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.resample import resample_spatial

    out = resample_spatial(_grid_cube(spark, sf_dir), resolution=2.5,
                           method="cubicspline")
    return _round6(out.df, "value")


def q_resample_lanczos(spark, sf_dir):
    """resample_spatial method='lanczos' (a=3 windowed sinc, 6 taps/axis)."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.resample import resample_spatial

    out = resample_spatial(_grid_cube(spark, sf_dir), resolution=2.5,
                           method="lanczos")
    return _round6(out.df, "value")


def q_resample_gauss(spark, sf_dir):
    """resample_spatial method='gauss' (σ=1 truncated Gaussian — completes
    the odc/GDAL resampling method list)."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.resample import resample_spatial

    out = resample_spatial(_grid_cube(spark, sf_dir), resolution=2.5,
                           method="gauss")
    return _round6(out.df, "value")


def q_resample_mode(spark, sf_dir):
    """resample_spatial method='mode': most frequent value per target cell,
    deterministic smallest-value tie-break."""
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.resample import resample_spatial

    df = _table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("double").alias("x"),
        F.col("l_suppkey").cast("double").alias("y"),
        F.col("l_returnflag").alias("band"),
        F.col("l_quantity").alias("value"),
    )
    out = resample_spatial(
        DataCube(df, dims=("x", "y", "band")), resolution=100.0, method="mode"
    )
    return _round6(out.df, "value")


def q_resample_rms(spark, sf_dir):
    """resample_spatial method='rms' (odc resampling list,
    reference cubes/resample.py:23-36)."""
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.resample import resample_spatial

    df = _table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("double").alias("x"),
        F.col("l_suppkey").cast("double").alias("y"),
        F.col("l_returnflag").alias("band"),
        F.col("l_quantity").alias("value"),
    )
    out = resample_spatial(
        DataCube(df, dims=("x", "y", "band")), resolution=100.0, method="rms"
    )
    return _round6(out.df, "value")


def q_apply_neighborhood_mean(spark, sf_dir):
    """apply_neighborhood: centered size-3 rolling mean along pos
    (reference: apply_neighborhood_intertwin.py:8-37)."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.kernel import apply_neighborhood

    out = apply_neighborhood(_cells_cube(spark, sf_dir), "mean", "pos", size=3)
    return _round6(out.df, "value")


def q_cummax(spark, sf_dir):
    """cummax along pos (reference: math.py:125-174)."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.windows import cummax

    return cummax(_cells_cube(spark, sf_dir), "pos").df


def q_cummin(spark, sf_dir):
    """cummin along pos (reference: math.py:125-174)."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.windows import cummin

    return cummin(_cells_cube(spark, sf_dir), "pos").df


def q_cumproduct(spark, sf_dir):
    """cumproduct along pos (windowed exp∘sum∘ln; reference math.py:125-174).
    Compared in log space like reduce_product: exact running products land
    exactly on round boundaries, ln() moves them off the decimal grid."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.windows import cumproduct

    out = cumproduct(_cells_cube(spark, sf_dir), "pos")
    return out.df.withColumn("value", F.round(F.log(F.col("value")), 6))


def q_merge_concat(spark, sf_dir):
    """merge_cubes case 1 (same dims, same labels, no resolver): concat
    along a new 'cubes' dimension (reference: merge.py:91-104). Wrapped in
    inspect() so the debug pass-through is driver-exercised too."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.general import inspect
    from openeo_processes_dask_spark.operators.merge import merge_cubes

    g = _grid_cube(spark, sf_dir)
    doubled = g.with_df(g.df.withColumn("value", F.col("value") * 2))
    out = merge_cubes(g, doubled, label_relation="equal")
    out = inspect(out, message="merge_concat gate")
    return _round6(out.df.select("x", "y", "band", "cubes", "value"), "value")


def q_merge_disjoint_bands(spark, sf_dir):
    """merge_cubes case 3 with NO overlap (labels differ in the band dim):
    pure coordinate union (reference: merge.py:121-243)."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.filters import filter_labels
    from openeo_processes_dask_spark.operators.merge import merge_cubes

    g = _grid_cube(spark, sf_dir)
    c1 = filter_labels(g, lambda c: c != "R", dimension="band")
    c2 = filter_labels(g, lambda c: c == "R", dimension="band")
    c2 = c2.with_df(c2.df.withColumn("value", F.col("value") * 2))
    out = merge_cubes(c1, c2)
    return _round6(out.df, "value")


def q_merge_case4_subcube(spark, sf_dir):
    """merge_cubes case 4 (differing dims): subtract the band-reduced mean
    cube from the full cube — the xarray broadcast case
    (reference: merge.py:245-291), now AQE-joined without a forced
    broadcast hint."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.merge import merge_cubes
    from openeo_processes_dask_spark.operators.reduce import reduce_dimension

    g = _grid_cube(spark, sf_dir)
    bmean = reduce_dimension(g, "mean", "band")
    out = merge_cubes(g, bmean, overlap_resolver="subtract")
    return _round6(out.df, "value")


def q_array_ops2(spark, sf_dir):
    """Second array-family gate: array_filter, array_apply, array_modify,
    array_find(max), array_labels (reference: arrays.py:144-402)."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.arrays import (
        array_apply,
        array_filter,
        array_find,
        array_labels,
        array_modify,
    )

    cells = _li_cells(spark, sf_dir)
    arrs = (
        cells.groupBy("x")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("sq")))
            ).alias("ps")
        )
        .select("x", F.transform(F.col("ps"), lambda s: s["sq"]).alias("arr"))
    )
    arr = F.col("arr")
    return arrs.select(
        "x",
        F.size(array_filter(arr, lambda v: v > 30)).alias("n_gt30"),
        F.round(
            F.element_at(array_apply(arr, lambda v: v * 2 + 1), 1), 6
        ).alias("app0"),
        F.size(array_modify(arr, [0.0, 0.0], index=1, length=1)).alias(
            "n_mod"
        ),
        array_find(arr, F.array_max(arr)).alias("find_max"),
        F.size(array_labels(arr)).alias("n_labels"),
    )


def q_rename_labels_dim(spark, sf_dir):
    """rename_dimension + rename_labels (reference: cubes/general.py:103-222)."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.general import (
        rename_dimension,
        rename_labels,
    )

    cube = _events_cube(spark, sf_dir)
    cube = rename_dimension(cube, "user_id", "uid")
    cube = rename_labels(
        cube, "band", target=["c", "v", "p"], source=["click", "view", "purchase"]
    )
    return cube.df.drop("__t_ns__")


def q_dimension_labels(spark, sf_dir):
    """dimension_labels: distinct sorted labels of the band dim
    (reference: cubes/general.py:59-69)."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.general import dimension_labels

    return dimension_labels(_events_cube(spark, sf_dir), "band")


def q_predict_curve_linear(spark, sf_dir):
    """fit_curve -> predict_curve with a linear model at labels [0, 10]
    (reference: ml/curve_fitting.py:100-162); OLS oracle via regr_*."""
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.ml.curve_fitting import (
        fit_curve,
        predict_curve,
    )

    cells = _li_cells(spark, sf_dir).where(F.col("x") % 10 == 0)
    counts = cells.groupBy("x").count().where(F.col("count") >= 3).select("x")
    cells = cells.join(counts, "x")
    cube = DataCube(
        cells.select(
            "x", F.col("pos").cast("double").alias("pos"), F.col("sq").alias("value")
        ),
        dims=("x", "pos"),
        roles={"pos": "other"},
    )

    def model(p, t):
        return p[0] * t + p[1]

    params = fit_curve(cube, [0.0, 0.0], model, "pos")
    out = predict_curve(params, model, "pos", [0.0, 10.0])
    return out.df.withColumn("value", F.round(F.col("value"), 4))


def q_array_ops(spark, sf_dir):
    """Array-process family over per-x value arrays: array_element,
    array_concat + array_append + array_create, first/last element, and a
    fold-left sum (reference: arrays.py:66-265,461-495)."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.arrays import (
        array_append,
        array_concat,
        array_create,
        array_element,
        first_element,
        last_element,
    )

    cells = _li_cells(spark, sf_dir)
    arrs = (
        cells.groupBy("x")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("sq")))
            ).alias("ps")
        )
        # materialize the values array ONCE — HOF lambdas re-evaluate
        # captured subexpressions per element (see shingles_from_tokens)
        .select("x", F.transform(F.col("ps"), lambda s: s["sq"]).alias("arr"))
    )
    arr = F.col("arr")
    return arrs.select(
        "x",
        array_element(arr, index=2).alias("elem2"),
        F.size(
            array_append(array_concat(arr, array_create([1.0, 2.0])), 3.0)
        ).alias("n_concat"),
        first_element(arr).alias("first_v"),
        last_element(arr).alias("last_v"),
        F.round(F.aggregate(arr, F.lit(0.0), lambda a, v: a + v), 6).alias(
            "total"
        ),
    )


def q_ddmc(spark, sf_dir):
    """ddmc cloud composite over a 5-band cube built from lineitem positions
    (reference: experimental/ddmc.py:8-84)."""
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.experimental import ddmc

    cells = _li_cells(spark, sf_dir).where(F.col("pos") <= 5)
    band = (
        F.when(F.col("pos") == 1, "nir08")
        .when(F.col("pos") == 2, "nir09")
        .when(F.col("pos") == 3, "cirrus")
        .when(F.col("pos") == 4, "swir16")
        .when(F.col("pos") == 5, "swir22")
    )
    df = cells.select("x", band.alias("band"), F.col("sq").alias("value"))
    out = ddmc(DataCube(df, dims=("x", "band")))
    return _round6(out.df, "value")


def q_resample_mercator(spark, sf_dir):
    """resample_spatial with a native EPSG:4326->3857 warp: the Mercator
    transform is composed as JVM expressions in front of the grid snap
    (functions/crs.py), so warp + regrid is one codegen'd stage + one
    shuffle. Rounding to 1000 km cells absorbs libm last-ulp differences
    between the JVM and DuckDB."""
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.resample import resample_spatial

    df = _table(spark, sf_dir, "lineitem").select(
        ((F.col("l_partkey") % 360).cast("double") - 179.5).alias("x"),
        ((F.col("l_suppkey") % 170).cast("double") - 84.5).alias("y"),
        F.col("l_returnflag").alias("band"),
        F.col("l_quantity").alias("value"),
    )
    cube = DataCube(df, dims=("x", "y", "band"), crs="EPSG:4326")
    out = resample_spatial(
        cube, resolution=1_000_000.0, projection="EPSG:3857", method="mean"
    )
    return _round6(out.df, "value")


def q_vector_reproject(spark, sf_dir):
    """vector_reproject of nation-key points to EPSG:3857; coordinates are
    read back via geometry bounds and rounded (reference:
    cubes/geometries.py:149-170)."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.vector import (
        geometry_bounds_df,
        load_geojson,
        vector_reproject,
    )

    n = _table(spark, sf_dir, "nation").collect()
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "id": str(r["n_nationkey"]),
                "geometry": {
                    "type": "Point",
                    "coordinates": [
                        float(r["n_nationkey"]) * 3.0 - 30.0,
                        float(r["n_regionkey"]) * 10.0 - 20.0,
                    ],
                },
                "properties": {"name": r["n_name"]},
            }
            for r in n
        ],
    }
    vc = vector_reproject(load_geojson(spark, fc), "EPSG:3857")
    b = geometry_bounds_df(vc)
    return b.select(
        "feature_id",
        F.round(F.col("bounds.west"), 4).alias("mx"),
        F.round(F.col("bounds.south"), 4).alias("my"),
    )


def q_apply_dimension_dropnull(spark, sf_dir):
    """apply_dimension's SHAPE-CHANGING path (reference: cubes/apply.py:
    96-120): the callback drops nodata, so output length != input length
    and labels become the arange fallback (preserves_labels=False)."""
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.apply import apply_dimension

    cells = _li_cells(spark, sf_dir)
    gappy = DataCube(
        cells.select(
            "x",
            F.col("pos").cast("double").alias("pos"),
            F.when(F.col("md") > 0.05, F.lit(None).cast("double"))
            .otherwise(F.col("sq"))
            .alias("value"),
        ),
        dims=("x", "pos"),
    )
    out = apply_dimension(
        gappy, lambda s: s.dropna(), "pos", preserves_labels=False
    )
    return out.df


def q_mask_triangle(spark, sf_dir):
    """mask_polygon with a NON-rectangular (triangle) polygon: exercises
    the actual ray-casting geometry. For a convex CCW polygon the oracle
    is the exact half-plane test (all edge cross-products positive); the
    half-integer vertices guarantee no grid point is ever collinear with
    an edge, so even-odd and half-plane semantics agree everywhere."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.mask import mask_polygon

    tri = {
        "type": "Polygon",
        "coordinates": [
            [[0.5, 0.5], [20.5, 2.5], [8.5, 9.5], [0.5, 0.5]]
        ],
    }
    return mask_polygon(_grid_cube(spark, sf_dir), tri, replacement=0.0).df


def q_resample_bilinear(spark, sf_dir):
    """Bilinear warp in long format (SURVEY hard-part #3 without halo
    exchange): metadata-sized (target -> 4 sources + weights) mapping
    table, broadcast join, weighted mean per target cell. The oracle
    replays the identical axis-geometry probe and weight arithmetic."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.resample import resample_spatial

    out = resample_spatial(
        _grid_cube(spark, sf_dir), resolution=2.5, method="bilinear"
    )
    return _round6(out.df, "value")


def q_salted_reduce(spark, sf_dir):
    """Two-stage salted reduce (session.salted_reduce): identical result
    to the plain hash aggregate, with the hot-group state spread across
    n_salts partial reducers — the manual skew lever behind AQE."""
    _setup(spark)
    from openeo_processes_dask_spark.session import salted_reduce

    cube = _events_cube(spark, sf_dir)
    out = salted_reduce(cube, "mean", "t", n_salts=8)
    return _round6(out.df, "value")


def q_load_stac_catalog(spark, sf_dir):
    """load_stac over a two-item local catalog (VERDICT r01 #9): parquet
    assets derived from lineitem's grid, bbox SEARCH prunes item 1 before
    any read, row-level bbox re-filter per reference load.py:306-310. The
    oracle replays the derivation + predicate directly on lineitem."""
    _setup(spark)
    import json
    import os
    import tempfile

    from openeo_processes_dask_spark.sources.load import load_stac

    base = os.path.join(
        tempfile.gettempdir(), "spark_graft_stac_gate"
    )
    os.makedirs(base, exist_ok=True)
    grid = _grid_cube(spark, sf_dir)
    flat = (
        grid.df.groupBy("x", "y")
        .agg(F.sum("value").alias("value"))
        .withColumn("t", F.lit("2024-01-15 00:00:00").cast("timestamp"))
    )
    paths = {}
    for name, pred, bbox in (
        ("left", "x < 15", [0, 0, 14, 9]),
        ("right", "x >= 15", [15, 0, 29, 9]),
    ):
        p = os.path.join(base, f"{name}.parquet")
        flat.where(pred).coalesce(1).write.mode("overwrite").parquet(p)
        item = {
            "type": "Feature",
            "stac_version": "1.0.0",
            "id": name,
            "bbox": bbox,
            "properties": {"datetime": "2024-01-15T00:00:00Z"},
            "assets": {"data": {"href": p, "type": "parquet"}},
        }
        ip = os.path.join(base, f"{name}.json")
        with open(ip, "w") as fh:
            json.dump(item, fh)
        paths[name] = ip
    catalog = {
        "type": "Catalog",
        "stac_version": "1.0.0",
        "id": "gate",
        "links": [
            {"rel": "item", "href": paths["left"]},
            {"rel": "item", "href": paths["right"]},
        ],
    }
    cat = os.path.join(base, "catalog.json")
    with open(cat, "w") as fh:
        json.dump(catalog, fh)
    cube = load_stac(
        cat,
        spatial_extent={
            "west": -0.5, "east": 14.5, "south": -0.5, "north": 9.5,
        },
        spark=spark,
    )
    return _round6(
        cube.df.select("x", "y", "band", "t", "value"), "value"
    )


def q_crs_utm(spark, sf_dir):
    """EPSG:4326 -> EPSG:32632 (UTM zone 32N) warp as pure JVM expressions
    (functions/crs.py Krüger series). The oracle is the SAME generic
    formula emitted as DuckDB SQL by the _SqlOps shim — one series, three
    lanes; libm last-ulp differences vanish under round(2) (cm)."""
    _setup(spark)
    from openeo_processes_dask_spark.functions.crs import transform_xy_cols

    grid = _grid_cube(spark, sf_dir)
    lon = F.col("x") / F.lit(10.0) + F.lit(7.5)
    lat = F.col("y") / F.lit(10.0) + F.lit(45.0)
    e, n = transform_xy_cols(lon, lat, "EPSG:4326", "EPSG:32632")
    return grid.df.select(
        "x",
        "y",
        "band",
        F.round(e, 2).alias("easting"),
        F.round(n, 2).alias("northing"),
    )


def q_multimodal_resize(spark, sf_dir):
    """resize_images: REAL nearest-neighbor resize over binary columns,
    verified byte-exactly — the gate md5-hashes every resized RGB payload
    and the oracle bakes independently-computed digests (deterministic
    fake decode) into a VALUES table."""
    _setup(spark)
    from openeo_processes_dask_spark.training.multimodal import (
        resize_images,
        synthetic_image_table,
    )

    tbl = synthetic_image_table(spark, n=32, width=16, height=12)
    out = resize_images(tbl, target_width=8, target_height=8)
    return out.select(
        "doc_id", "width", "height", F.md5("payload").alias("digest")
    )


def q_multimodal_av(spark, sf_dir):
    """Video frame-sampling + audio feature plumbing (mapInPandas 1->N row
    expansion, FFT features over fake-decoded waveforms). Oracle-checked:
    the generators are deterministic, so the oracle recomputes every frame
    mean and spectral centroid independently in NumPy (VERDICT r01 #8)."""
    _setup(spark)
    from openeo_processes_dask_spark.training.multimodal import (
        audio_features,
        sample_video_frames,
        synthetic_audio_table,
        synthetic_video_table,
    )

    frames = sample_video_frames(
        synthetic_video_table(spark, n=8, n_frames=30), every_n=10
    ).select("doc_id", F.col("frame_idx").alias("idx"), F.round("mean_intensity", 6).alias("v"))
    audio = audio_features(synthetic_audio_table(spark, n=8)).select(
        "doc_id", F.lit(-1).alias("idx"), F.round("spectral_centroid", 6).alias("v")
    )
    return frames.unionByName(audio)


def q_streaming_sessions(spark, sf_dir):
    """Stateful streaming sessionization (applyInPandasWithState,
    streaming/sessions.py) under a full value oracle. The source is ONE
    time-sorted file, so the state machine's arrival order equals the
    globally-sorted batch replay the SQL oracle computes. Only sessions
    closed by a later event are compared: per-user LAST sessions are
    emitted (or not) depending on ms-resolution watermark timing, so both
    sides exclude sessions whose end reaches past max(user time) - gap."""
    _setup(spark)
    import os
    import tempfile

    from openeo_processes_dask_spark.streaming.events import (
        run_stream_to_memory,
        stream_events,
    )
    from openeo_processes_dask_spark.streaming.sessions import sessionize

    gap = 86_400  # 1 day
    stream_dir = os.path.join(
        tempfile.gettempdir(), f"events_sessions_{os.path.basename(sf_dir)}"
    )
    if not os.path.isdir(stream_dir):
        (
            _table(spark, sf_dir, "events")
            .select("event_id", "ts", "user_id", "event_type", "value", "props")
            .repartition(1)
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(stream_dir)
        )
    stream = stream_events(spark, stream_dir, max_files_per_trigger=None)
    sessions = sessionize(stream, gap_seconds=gap, watermark="1 hour")
    name = f"q_sessions_{abs(hash(sf_dir)) % 10_000}"
    q = run_stream_to_memory(sessions, name, output_mode="append")
    q.awaitTermination(300)
    mx = (
        _table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max("ts").alias("__mt__"))
    )
    return (
        spark.table(name)
        .join(F.broadcast(mx), "user_id")
        .where(
            F.unix_micros(F.col("session_end"))
            < F.unix_micros(F.col("__mt__")) - gap * 1_000_000
        )
        .select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            F.round("value_sum", 6).alias("value_sum"),
        )
    )


def q_rqa_trend(spark, sf_dir):
    """rqa_deforestation over per-user daily series (reference:
    experimental/rqadeforestation.py:9-16). The RQA TREND statistic is the
    OLS slope of recurrence rate vs diagonal distance, so DuckDB's
    regr_slope over an indexed self-join is an exact oracle. Groups shorter
    than 3 samples yield NaN in the engine and are excluded on both sides."""
    _setup(spark)
    from openeo_processes_dask_spark.operators.aggregate import (
        aggregate_temporal_period,
    )
    from openeo_processes_dask_spark.operators.experimental import (
        rqa_deforestation,
    )

    cube = _events_cube(spark, sf_dir)
    daily = aggregate_temporal_period(cube, "day", "mean")
    out = rqa_deforestation(daily, threshold=10.0)
    # short groups produce NaN driver-side; Arrow maps pandas NaN to NULL,
    # and Spark's isnan(NULL) is false — filter both representations
    return _round6(
        out.df.where(F.col("value").isNotNull() & ~F.isnan("value")), "value"
    )


def q_text_ops(spark, sf_dir):
    """text_begins/contains/ends/concat scalar processes
    (reference: text.py:11-55)."""
    _setup(spark)
    from openeo_processes_dask_spark.functions.text import (
        text_begins,
        text_concat,
        text_contains,
        text_ends,
    )

    doc = _table(spark, sf_dir, "documents")
    return doc.select(
        "doc_id",
        text_begins(F.col("text"), "the", case_sensitive=False).alias("b"),
        text_contains(F.col("text"), "and").alias("c"),
        text_ends(F.col("text"), ".").alias("e"),
        text_concat([F.col("lang"), F.col("source")], separator="-").alias("cc"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "flagship_daily_mean": _flagship,
        "filter_temporal": q_filter_temporal,
        "filter_bands": q_filter_bands,
        "filter_labels_text": q_filter_labels_text,
        "filter_bbox": q_filter_bbox,
        "reduce_mean_over_time": q_reduce_mean_over_time,
        "reduce_variance": q_reduce_variance,
        "reduce_spatial_sum": q_reduce_spatial_sum,
        "aggregate_temporal_halves": q_aggregate_temporal_halves,
        "aggregate_dekad": q_aggregate_dekad,
        "aggregate_week_median": q_aggregate_week_median,
        "merge_multiply": q_merge_multiply,
        "mask_high_discount": q_mask_high_discount,
        "apply_scale_clip": q_apply_scale_clip,
        "cumsum": q_cumsum,
        "sort_along_dim": q_sort_along_dim,
        "interpolate_gaps": q_interpolate_gaps,
        "date_ops": q_date_ops,
        "add_drop_dimension": q_add_drop_dimension,
        "dedup_exact": q_dedup_exact,
        "training_pipeline": q_training_pipeline,
        "dedup_incremental": q_dedup_incremental,
        "sample_stratified": q_sample_stratified,
        "cap_per_source": q_cap_per_source,
        "pack_contiguous": q_pack_contiguous,
        "split_assign": q_split_assign,
        "repetition_stats": q_repetition_stats,
        "gopher_filter": q_gopher_filter,
        "token_count": q_token_count,
        "text_quality": q_text_quality,
        "language_id": q_language_id,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_near_dups": q_minhash_near_dups,
        "simhash_near_dups": q_simhash_near_dups,
        "cosine_topk": q_cosine_topk,
        "lsh_topk": q_lsh_topk,
        "pq_topk": q_pq_topk,
        "kmeans_clusters": q_kmeans_clusters,
        "embedding_near_dups": q_embedding_near_dups,
        "resample_asof": q_resample_asof,
        "ndvi_events": q_ndvi_events,
        "apply_kernel_grid": q_apply_kernel_grid,
        "apply_dimension_center": q_apply_dimension_center,
        "reduce_product": q_reduce_product,
        "reduce_first": q_reduce_first,
        "aggregate_spatial_zonal": q_aggregate_spatial_zonal,
        "run_udf_plus1": q_run_udf_plus1,
        "fit_curve_linear": q_fit_curve_linear,
        "random_forest": q_random_forest,
        "vector_buffer": q_vector_buffer,
        "multimodal_features": q_multimodal_features,
        "streaming_daily_sum": q_streaming_daily_sum,
        "streaming_dedup": q_streaming_dedup,
        "streaming_sliding_sum": q_streaming_sliding_sum,
        "save_load_roundtrip": q_save_load_roundtrip,
        "resample_cubic": q_resample_cubic,
        "reduce_quantiles": q_reduce_quantiles,
        "resample_cubicspline": q_resample_cubicspline,
        "resample_gauss": q_resample_gauss,
        "apply_neighborhood_2d": q_apply_neighborhood_2d,
        "apply_neighborhood_2d_mean": q_apply_neighborhood_2d_mean,
        "resample_lanczos": q_resample_lanczos,
        "resample_mode": q_resample_mode,
        "resample_rms": q_resample_rms,
        "load_url_geojson": q_load_url_geojson,
        "reduce_any": q_reduce_any,
        "reduce_count_condition": q_reduce_count_condition,
        "process_graph": q_process_graph,
        "filter_spatial": q_filter_spatial,
        "mask_polygon": q_mask_polygon,
        "apply_polygon": q_apply_polygon,
        "trim_cube": q_trim_cube,
        "order_argsort": q_order_argsort,
        "rearrange": q_rearrange,
        "resample_spatial_grid": q_resample_spatial_grid,
        "resample_cube_spatial_coarse": q_resample_cube_spatial_coarse,
        "resample_cube_spatial_near": q_resample_cube_spatial_near,
        "rename_labels_enumerated": q_rename_labels_enumerated,
        "apply_neighborhood_mean": q_apply_neighborhood_mean,
        "cummax": q_cummax,
        "rename_labels_dim": q_rename_labels_dim,
        "dimension_labels": q_dimension_labels,
        "predict_curve_linear": q_predict_curve_linear,
        "array_ops": q_array_ops,
        "ddmc": q_ddmc,
        "text_ops": q_text_ops,
        "rqa_trend": q_rqa_trend,
        "streaming_sessions": q_streaming_sessions,
        "resample_mercator": q_resample_mercator,
        "multimodal_av": q_multimodal_av,
        "multimodal_resize": q_multimodal_resize,
        "load_stac_catalog": q_load_stac_catalog,
        "crs_utm": q_crs_utm,
        "cummin": q_cummin,
        "cumproduct": q_cumproduct,
        "merge_concat": q_merge_concat,
        "merge_disjoint_bands": q_merge_disjoint_bands,
        "merge_case4_subcube": q_merge_case4_subcube,
        "array_ops2": q_array_ops2,
        "dedup_clusters": q_dedup_clusters,
        "salted_reduce": q_salted_reduce,
        "resample_bilinear": q_resample_bilinear,
        "mask_triangle": q_mask_triangle,
        "apply_dimension_dropnull": q_apply_dimension_dropnull,
        "vector_reproject": q_vector_reproject,
        "ivf_topk": q_ivf_topk,
    }


# ----------------------------------------------------------------------
# DuckDB oracles
# ----------------------------------------------------------------------

_TOKS = r"string_split_regex(trim(lower(text)), '\s+')"


def oracle_sql() -> dict[str, str]:
    return {
        "flagship_daily_mean": """
            SELECT t, band, round(avg(value_u) / 1e6, 6) AS value FROM (
              SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS t,
                     event_type AS band, round(avg(value) * 1e6, 0) AS value_u
              FROM events
              WHERE ts >= '2024-01-01' AND ts < '2024-02-01'
              GROUP BY ALL) GROUP BY ALL
        """,
        "filter_temporal": """
            SELECT user_id, ts AS t, event_type AS band, value
            FROM events
            WHERE ts >= '2024-01-10' AND ts < '2024-01-20' AND ts IS NOT NULL
        """,
        "filter_bands": """
            SELECT user_id, ts AS t, event_type AS band, value
            FROM events WHERE event_type IN ('click', 'purchase')
        """,
        "filter_labels_text": """
            SELECT user_id, ts AS t, event_type AS band, value
            FROM events WHERE event_type LIKE 'c%'
        """,
        "filter_bbox": """
            SELECT l_partkey AS x, l_suppkey AS y,
                   l_orderkey AS okey, l_linenumber AS pos, l_quantity AS value
            FROM lineitem
            WHERE l_partkey BETWEEN 100 AND 500 AND l_suppkey BETWEEN 2 AND 7
        """,
        "reduce_mean_over_time": """
            SELECT l_suppkey AS x, l_returnflag AS band,
                   round(avg(l_quantity), 6) AS value
            FROM lineitem GROUP BY ALL
        """,
        "reduce_variance": """
            SELECT l_suppkey AS x, l_returnflag AS band,
                   round(var_samp(l_extendedprice), 2) AS value
            FROM lineitem GROUP BY ALL
        """,
        "reduce_spatial_sum": """
            SELECT l_returnflag AS band, round(sum(l_quantity), 6) AS value
            FROM lineitem GROUP BY ALL
        """,
        "aggregate_temporal_halves": """
            WITH labels(t) AS (VALUES ('h1'), ('h2')),
            binned AS (
              SELECT CASE WHEN o_orderdate >= '1995-01-01' AND o_orderdate < '1998-01-01' THEN 'h1'
                          WHEN o_orderdate >= '1998-01-01' AND o_orderdate < '2002-01-01' THEN 'h2' END AS t,
                     o_orderpriority AS band, round(sum(o_totalprice), 6) AS value
              FROM orders WHERE o_orderdate IS NOT NULL GROUP BY ALL)
            SELECT l.t, g.band, b.value
            FROM labels l
            CROSS JOIN (SELECT DISTINCT o_orderpriority AS band FROM orders) g
            LEFT JOIN binned b ON b.t = l.t AND b.band = g.band
        """,
        "aggregate_dekad": """
            SELECT user_id,
                   make_timestamp(year(ts), month(ts),
                     CASE WHEN day(ts) <= 10 THEN 1 WHEN day(ts) <= 20 THEN 11 ELSE 21 END,
                     0, 0, 0.0) AS t,
                   event_type AS band, round(sum(value), 6) AS value
            FROM events GROUP BY ALL
        """,
        "aggregate_week_median": """
            SELECT t, band, round(max(value), 6) AS value FROM (
              SELECT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS t,
                     event_type AS band, median(value) AS value
              FROM events GROUP BY ALL) GROUP BY ALL
        """,
        "merge_multiply": f"""
            WITH {_CELLS_CTE}
            SELECT x, pos, round(sep * sd, 6) AS value FROM cells
        """,
        "mask_high_discount": f"""
            WITH {_CELLS_CTE}
            SELECT x, pos, CASE WHEN md > 0.05 THEN NULL ELSE sq END AS value
            FROM cells
        """,
        "apply_scale_clip": f"""
            WITH {_CELLS_CTE}
            SELECT x, pos,
                   round(greatest(least((sq - 1) / 49.0, 0.9), 0.1), 6) AS value
            FROM cells
        """,
        "cumsum": f"""
            WITH {_CELLS_CTE}
            SELECT x, pos,
                   sum(sq) OVER (PARTITION BY x ORDER BY pos) AS value
            FROM cells
        """,
        "sort_along_dim": f"""
            WITH {_CELLS_CTE}
            SELECT x,
                   row_number() OVER (PARTITION BY x ORDER BY sq, pos) - 1 AS pos,
                   sq AS value
            FROM cells
        """,
        "interpolate_gaps": f"""
            WITH {_CELLS_CTE},
            gappy AS (
              SELECT x, CAST(pos AS DOUBLE) AS pos,
                     CASE WHEN md > 0.05 THEN NULL ELSE sq END AS value
              FROM cells),
            ctx AS (
              SELECT x, pos, value,
                last_value(value IGNORE NULLS) OVER w_before AS prev_v,
                last_value(CASE WHEN value IS NOT NULL THEN pos END IGNORE NULLS) OVER w_before AS prev_p,
                first_value(value IGNORE NULLS) OVER w_after AS next_v,
                first_value(CASE WHEN value IS NOT NULL THEN pos END IGNORE NULLS) OVER w_after AS next_p
              FROM gappy
              WINDOW
                w_before AS (PARTITION BY x ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                w_after AS (PARTITION BY x ORDER BY pos ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
            SELECT x, pos,
                   round(CASE WHEN value IS NOT NULL THEN value
                         WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                         THEN prev_v + (pos - prev_p) / (next_p - prev_p) * (next_v - prev_v)
                         END, 6) AS value
            FROM ctx
        """,
        "date_ops": """
            SELECT o_orderkey AS x,
                   o_orderdate + INTERVAL 1 MONTH AS t_shifted,
                   CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS DOUBLE)
                     AS days_to_y2k
            FROM orders
        """,
        "add_drop_dimension": """
            SELECT user_id, event_type AS channel, 'm1' AS model,
                   round(sum(value), 6) AS value
            FROM events GROUP BY ALL
        """,
        "dedup_exact": """
            SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
                   min(doc_id) AS keep_id, count(*) AS n_copies
            FROM documents GROUP BY ALL
        """,
        "training_pipeline": f"""
            WITH toks AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN []
                          ELSE string_split_regex(lower(trim(text)), '\\s+')
                     END AS t
              FROM documents),
            words AS (
              SELECT doc_id, len(t) AS n_words,
                     len(list_filter(t, w -> regexp_matches(w, '[a-z]'))) AS n_alpha,
                     len(list_filter(t, w -> list_contains(
                         {_STOPWORDS_SQL}, w))) AS n_stop,
                     CAST(coalesce(list_sum(list_transform(t, w -> length(w))), 0)
                          AS BIGINT) AS wc
              FROM toks),
            g AS (
              SELECT doc_id, n, unnest(list_transform(
                       generate_series(1, len(t) - n + 1),
                       i -> array_to_string(list_slice(t, i, i + n - 1), ' '))) AS gr
              FROM toks, (SELECT unnest([2, 5]) AS n) ns
              WHERE len(t) >= n),
            cnt AS (SELECT doc_id, n, gr, count(*) AS k, length(gr) AS lg
                    FROM g GROUP BY doc_id, n, gr),
            rep AS (
              SELECT doc_id,
                     max(CASE WHEN n = 2 THEN k * lg END) AS top2,
                     sum(CASE WHEN n = 2 THEN k * lg END) AS tot2,
                     sum(CASE WHEN n = 5 AND k > 1 THEN k * lg ELSE 0 END) AS dup5,
                     sum(CASE WHEN n = 5 THEN k * lg END) AS tot5
              FROM cnt GROUP BY doc_id),
            flt AS (
              SELECT d.doc_id, d.lang, d.text, d.n_chars
              FROM documents d JOIN words w USING (doc_id)
                   LEFT JOIN rep USING (doc_id)
              WHERE w.n_words BETWEEN 30 AND 100000
                AND (w.wc::DOUBLE / nullif(w.n_words, 0) >= 3.0 AND
                     w.wc::DOUBLE / nullif(w.n_words, 0) <= 10.0)
                AND w.n_alpha::DOUBLE / nullif(w.n_words, 0) >= 0.8
                AND w.n_stop >= 1
                AND coalesce(top2::DOUBLE / nullif(tot2, 0) <= 0.20, TRUE)
                AND coalesce(dup5::DOUBLE / nullif(tot5, 0) <= 0.15, TRUE)),
            fp AS (SELECT doc_id, lang, n_chars,
                          md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
                   FROM flt),
            canon AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
            ded AS (SELECT fp.* FROM fp JOIN canon USING (doc_id)),
            samp AS (
              SELECT * FROM ded
              WHERE CAST('0x' || substr(md5('13-' || CAST(doc_id AS VARCHAR)), 1, 15)
                         AS BIGINT) / 1152921504606846976.0
                    < CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 0.5 ELSE 0.2 END),
            train AS (
              SELECT * FROM samp
              WHERE CAST('0x' || substr(md5('17-' || CAST(doc_id AS VARCHAR)), 1, 15)
                         AS BIGINT) / 1152921504606846976.0 < 0.9),
            sharded AS (
              SELECT doc_id, n_chars,
                     CAST(CAST('0x' || substr(md5('19-' || CAST(doc_id AS VARCHAR)),
                               1, 15) AS BIGINT) % 4 AS INT) AS shard
              FROM train WHERE n_chars > 0),
            spans AS (
              SELECT doc_id, shard, n_chars,
                     CAST(sum(n_chars) OVER (PARTITION BY shard ORDER BY doc_id)
                          AS BIGINT) AS e
              FROM sharded),
            segs AS (
              SELECT doc_id, shard, e - n_chars AS s, e,
                     unnest(generate_series((e - n_chars) // 2048,
                                            (e - 1) // 2048)) AS segment
              FROM spans)
            SELECT doc_id, shard, segment,
                   least(e, (segment + 1) * 2048)
                   - greatest(s, segment * 2048) AS seg_tokens
            FROM segs
        """,
        "dedup_incremental": """
            WITH new AS (
              SELECT doc_id, lang, source, text FROM documents WHERE doc_id % 2 = 1
              UNION ALL
              SELECT doc_id + 1000000, lang, source, text FROM documents
              WHERE doc_id % 2 = 0)
            SELECT doc_id, lang, source FROM new n
            WHERE NOT EXISTS (
              SELECT 1 FROM documents s
              WHERE s.doc_id % 2 = 0
                AND md5(regexp_replace(lower(trim(s.text)), '\\s+', ' ', 'g'))
                  = md5(regexp_replace(lower(trim(n.text)), '\\s+', ' ', 'g')))
        """,
        "sample_stratified": """
            SELECT doc_id, lang, source FROM documents
            WHERE CAST('0x' || substr(md5('7-' || CAST(doc_id AS VARCHAR)), 1, 15)
                       AS BIGINT) / 1152921504606846976.0
                  < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25 ELSE 0.1 END
        """,
        "cap_per_source": """
            SELECT doc_id, lang, source, n_chars
            FROM (SELECT *, row_number() OVER (
                    PARTITION BY lang, source
                    ORDER BY n_chars DESC, doc_id) AS rn
                  FROM documents)
            WHERE rn <= 4
        """,
        "pack_contiguous": """
            WITH sharded AS (
              SELECT doc_id, n_chars,
                     CAST(CAST('0x' || substr(md5('3-' || CAST(doc_id AS VARCHAR)),
                               1, 15) AS BIGINT) % 8 AS INT) AS shard
              FROM documents WHERE n_chars > 0),
            spans AS (
              SELECT doc_id, shard, n_chars,
                     CAST(sum(n_chars) OVER (PARTITION BY shard ORDER BY doc_id)
                          AS BIGINT) AS e
              FROM sharded),
            segs AS (
              SELECT doc_id, shard, e - n_chars AS s, e,
                     unnest(generate_series((e - n_chars) // 4096,
                                            (e - 1) // 4096)) AS segment
              FROM spans)
            SELECT doc_id, shard, segment,
                   least(e, (segment + 1) * 4096)
                   - greatest(s, segment * 4096) AS seg_tokens
            FROM segs
        """,
        "split_assign": """
            SELECT doc_id, lang,
                   CASE WHEN u < 0.8 THEN 'train'
                        WHEN u < 0.9 THEN 'val'
                        WHEN u < 1.0 THEN 'test' END AS split
            FROM (SELECT doc_id, lang,
                         CAST('0x' || substr(md5('11-' || CAST(doc_id AS VARCHAR)),
                              1, 15) AS BIGINT) / 1152921504606846976.0 AS u
                  FROM documents)
        """,
        "repetition_stats": """
            WITH toks AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN []
                          ELSE string_split_regex(lower(trim(text)), '\\s+')
                     END AS t
              FROM documents),
            grams AS (
              SELECT doc_id,
                     unnest(list_transform(generate_series(1, len(t) - 1),
                            i -> array_to_string(list_slice(t, i, i + 1), ' '))) AS g
              FROM toks WHERE len(t) >= 2),
            cnt AS (SELECT doc_id, g, count(*) AS k, length(g) AS lg
                    FROM grams GROUP BY doc_id, g)
            SELECT t.doc_id,
                   CAST(coalesce(max(k), 0) AS BIGINT) AS top_run,
                   CAST(coalesce(max(k * lg), 0) AS BIGINT) AS top_chars,
                   CAST(coalesce(sum(k) FILTER (k > 1), 0) AS BIGINT) AS dup_occ,
                   CAST(coalesce(sum(k * lg) FILTER (k > 1), 0) AS BIGINT) AS dup_chars,
                   CAST(coalesce(sum(k * lg), 0) AS BIGINT) AS tot_chars,
                   CAST(coalesce(sum(k), 0) AS BIGINT) AS n_grams
            FROM toks t LEFT JOIN cnt USING (doc_id)
            GROUP BY t.doc_id
        """,
        "gopher_filter": f"""
            WITH toks AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN []
                          ELSE string_split_regex(lower(trim(text)), '\\s+')
                     END AS t
              FROM documents),
            words AS (
              SELECT doc_id, len(t) AS n_words,
                     len(list_filter(t, w -> regexp_matches(w, '[a-z]'))) AS n_alpha,
                     len(list_filter(t, w -> list_contains(
                         {_STOPWORDS_SQL}, w))) AS n_stop,
                     CAST(coalesce(list_sum(list_transform(t, w -> length(w))), 0)
                          AS BIGINT) AS word_chars
              FROM toks),
            g AS (
              SELECT doc_id, n, unnest(list_transform(
                       generate_series(1, len(t) - n + 1),
                       i -> array_to_string(list_slice(t, i, i + n - 1), ' '))) AS gr
              FROM toks, (SELECT unnest([2, 5]) AS n) ns
              WHERE len(t) >= n),
            cnt AS (SELECT doc_id, n, gr, count(*) AS k, length(gr) AS lg
                    FROM g GROUP BY doc_id, n, gr),
            rep AS (
              SELECT doc_id,
                     max(CASE WHEN n = 2 THEN k * lg END) AS top2_chars,
                     sum(CASE WHEN n = 2 THEN k * lg END) AS tot2_chars,
                     sum(CASE WHEN n = 5 AND k > 1 THEN k * lg ELSE 0 END) AS dup5_chars,
                     sum(CASE WHEN n = 5 THEN k * lg END) AS tot5_chars
              FROM cnt GROUP BY doc_id)
            SELECT w.doc_id,
                   n_words BETWEEN 30 AND 100000 AS ok_words,
                   (word_chars::DOUBLE / nullif(n_words, 0) >= 3.0 AND
                    word_chars::DOUBLE / nullif(n_words, 0) <= 10.0) AS ok_word_len,
                   n_alpha::DOUBLE / nullif(n_words, 0) >= 0.8 AS ok_alpha,
                   n_stop >= 1 AS ok_stopwords,
                   coalesce(top2_chars::DOUBLE / nullif(tot2_chars, 0) <= 0.20,
                            TRUE) AS ok_top2gram,
                   coalesce(dup5_chars::DOUBLE / nullif(tot5_chars, 0) <= 0.15,
                            TRUE) AS ok_dup5gram,
                   (n_words BETWEEN 30 AND 100000)
                   AND (word_chars::DOUBLE / nullif(n_words, 0) >= 3.0 AND
                        word_chars::DOUBLE / nullif(n_words, 0) <= 10.0)
                   AND n_alpha::DOUBLE / nullif(n_words, 0) >= 0.8
                   AND n_stop >= 1
                   AND coalesce(top2_chars::DOUBLE / nullif(tot2_chars, 0) <= 0.20, TRUE)
                   AND coalesce(dup5_chars::DOUBLE / nullif(tot5_chars, 0) <= 0.15, TRUE)
                   AS keep
            FROM words w LEFT JOIN rep USING (doc_id)
        """,
        "token_count": f"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
            FROM documents
        """,
        "text_quality": f"""
            WITH feats AS (
              SELECT doc_id, text,
                CAST(len({_TOKS}) AS DOUBLE) AS n_tok,
                (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                  / greatest(length(text), 1) AS punct,
                len(list_filter({_TOKS}, w -> w IN ('and','das','de','der','des','die','el','est','et','is','la','le','les','los','nicht','of','que','shi','the','to','und','wo','y','bu','le')))
                  / greatest(CAST(len({_TOKS}) AS DOUBLE), 1) AS stop_ratio,
                list_sum(list_transform({_TOKS}, w -> length(w)))
                  / greatest(CAST(len({_TOKS}) AS DOUBLE), 1) AS mwl
              FROM documents)
            SELECT doc_id,
                   round(((CASE WHEN n_tok >= 5 AND n_tok <= 100000 THEN 1.0 ELSE 0.0 END)
                    + (CASE WHEN mwl >= 2 AND mwl <= 12 THEN 1.0 ELSE 0.0 END)
                    + (CASE WHEN punct <= 0.2 THEN 1.0 ELSE 0.0 END)
                    + (CASE WHEN stop_ratio >= 0.01 THEN 1.0 ELSE 0.0 END)) / 4.0, 6)
                     AS quality,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
            FROM feats
        """,
        "language_id": f"""
            WITH counts AS (
              SELECT doc_id,
                len(list_filter({_TOKS}, w -> w IN ('der','die','und','nicht','das'))) AS c_de,
                len(list_filter({_TOKS}, w -> w IN ('the','and','of','to','is'))) AS c_en,
                len(list_filter({_TOKS}, w -> w IN ('el','la','los','que','y'))) AS c_es,
                len(list_filter({_TOKS}, w -> w IN ('le','les','des','et','est'))) AS c_fr,
                len(list_filter({_TOKS}, w -> w IN ('de','shi','le','bu','wo'))) AS c_zh
              FROM documents)
            SELECT doc_id,
              CASE WHEN c_de >= greatest(c_en, c_es, c_fr, c_zh) THEN 'de'
                   WHEN c_en >= greatest(c_es, c_fr, c_zh) THEN 'en'
                   WHEN c_es >= greatest(c_fr, c_zh) THEN 'es'
                   WHEN c_fr >= c_zh THEN 'fr'
                   ELSE 'zh' END AS lang_pred
            FROM counts
        """,
        "ngram_jaccard": """
            WITH toks AS (
              SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id,
                     unnest(list_transform(generate_series(1, len(w) - 2),
                            i -> array_to_string(w[i:i+2], ' '))) AS s
              FROM toks WHERE len(w) >= 3),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id1, id2,
                   round(CAST(i AS DOUBLE) / (s1.sz + s2.sz - i), 6) AS jaccard
            FROM inter
            JOIN sizes s1 ON s1.doc_id = id1
            JOIN sizes s2 ON s2.doc_id = id2
            WHERE CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.2
        """,
        "cosine_topk": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(
                     list_sum([CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)
                               for i in generate_series(1, len(embedding))])
                     / (sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
                               for i in generate_series(1, len(embedding))]))
                        * sqrt(list_sum([CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)
                               for i in generate_series(1, len(qe))]))), 6) AS cosine
            FROM embeddings, q
            ORDER BY cosine DESC, vec_id LIMIT 10
        """,
        "minhash_near_dups": _minhash_oracle_sql(),
        "simhash_near_dups": _simhash_oracle_sql(),
        "resample_asof": """
            WITH src AS (SELECT DISTINCT o_orderdate AS s FROM orders),
            tgt AS (SELECT DISTINCT CAST(date_trunc('year', o_orderdate) AS TIMESTAMP) AS t
                    FROM orders),
            pairs AS (
              SELECT s, t, abs(epoch_us(s) - epoch_us(t)) AS d,
                     row_number() OVER (PARTITION BY t ORDER BY abs(epoch_us(s) - epoch_us(t)), s) AS rn
              FROM src, tgt),
            best AS (SELECT t, s FROM pairs WHERE rn = 1)
            SELECT b.t AS t, o.o_orderpriority AS band, o.o_totalprice AS value
            FROM best b JOIN orders o ON o.o_orderdate = b.s
        """,
        "ndvi_events": """
            WITH daily AS (
              SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS t,
                     event_type AS band, avg(value) AS v
              FROM events WHERE event_type IN ('click', 'view') GROUP BY ALL),
            piv AS (
              SELECT t, max(CASE WHEN band = 'click' THEN v END) AS c,
                     max(CASE WHEN band = 'view' THEN v END) AS vv
              FROM daily GROUP BY 1)
            SELECT t, round((c - vv) / (c + vv), 6) AS value FROM piv
        """,
        "apply_kernel_grid": """
            WITH grid AS (
              SELECT CAST(l_partkey % 30 AS INTEGER) AS x,
                     CAST(l_suppkey % 10 AS INTEGER) AS y,
                     sum(l_quantity) AS value
              FROM lineitem GROUP BY 1, 2),
            offsets(dx, dy) AS (VALUES (0, 0), (0, 1), (0, -1), (1, 0), (-1, 0))
            SELECT g.x, g.y, sum(coalesce(n.value, 0)) AS value
            FROM grid g
            CROSS JOIN offsets o
            LEFT JOIN grid n ON n.x = g.x + o.dx AND n.y = g.y + o.dy
            GROUP BY g.x, g.y
        """,
        "apply_dimension_center": f"""
            WITH {_CELLS_CTE}
            SELECT x, pos,
                   round(sq - avg(sq) OVER (PARTITION BY x), 6) AS value
            FROM cells
        """,
        "reduce_product": f"""
            WITH {_CELLS_CTE}
            SELECT x, round(ln(product(sd + 1.0)), 6) AS value
            FROM cells GROUP BY x
        """,
        "reduce_first": f"""
            WITH {_CELLS_CTE}
            SELECT x, arg_min(sq, pos) AS value FROM cells GROUP BY x
        """,
        "aggregate_spatial_zonal": """
            WITH grid AS (
              SELECT CAST(l_partkey % 30 AS DOUBLE) AS x,
                     CAST(l_suppkey % 10 AS DOUBLE) AS y,
                     l_returnflag AS band, sum(l_quantity) AS value
              FROM lineitem GROUP BY 1, 2, 3),
            agg AS (
              SELECT 'box' AS feature_id, band, round(avg(value), 6) AS value
              FROM grid
              WHERE x > 1.5 AND x < 10.5 AND y > 1.5 AND y < 8.5
              GROUP BY band)
            SELECT f.feature_id, g.band, a.value
            FROM (VALUES ('box'), ('far')) f(feature_id)
            CROSS JOIN (SELECT DISTINCT band FROM grid) g
            LEFT JOIN agg a ON a.feature_id = f.feature_id AND a.band = g.band
        """,
        "run_udf_plus1": f"""
            WITH {_CELLS_CTE}
            SELECT x, pos, sq + 1 AS value FROM cells
        """,
        "fit_curve_linear": f"""
            WITH {_CELLS_CTE},
            sel AS (
              SELECT x, CAST(pos AS DOUBLE) AS pos, sq FROM cells
              WHERE x % 10 = 0),
            ok AS (SELECT x FROM sel GROUP BY x HAVING count(*) >= 3)
            SELECT s.x, p.param,
                   round(CASE WHEN p.param = 0 THEN regr_slope(s.sq, s.pos)
                              ELSE regr_intercept(s.sq, s.pos) END, 4) AS value
            FROM sel s JOIN ok USING (x)
            CROSS JOIN (VALUES (0), (1)) p(param)
            GROUP BY s.x, p.param
        """,
        "lsh_topk": _lsh_topk_oracle_sql(n_planes=6),
        "pq_topk": _pq_topk_oracle_sql(),
        "kmeans_clusters": _kmeans_oracle_sql(),
        "ivf_topk": _ivf_topk_oracle_sql(),
        "reduce_any": """
            SELECT user_id, event_type AS band, bool_or(value > 100) AS value
            FROM events GROUP BY ALL
        """,
        "reduce_count_condition": f"""
            WITH {_CELLS_CTE}
            SELECT x, count(CASE WHEN sq > 30 THEN 1 END) AS value
            FROM cells GROUP BY x
        """,
        "process_graph": """
            SELECT t, band, round(avg(value_u) / 1e6, 6) AS value FROM (
              SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS t,
                     event_type AS band,
                     round_even(avg(value) * 1e6, 0) AS value_u
              FROM events
              WHERE ts >= '2024-01-01' AND ts < '2024-02-01'
              GROUP BY ALL) GROUP BY ALL
        """,
        "streaming_dedup": """
            SELECT DISTINCT user_id, event_type AS band,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
            FROM events
        """,
        "streaming_daily_sum": """
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS t,
                   event_type AS band, round(sum(value), 6) AS value
            FROM events GROUP BY ALL
        """,
        "streaming_sliding_sum": """
            WITH ev AS (
              SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
                     event_type AS band, value
              FROM events)
            SELECT d - to_days(o) AS t, band, round(sum(value), 6) AS value
            FROM ev, (VALUES (0), (1), (2)) AS offs(o)
            GROUP BY ALL
        """,
        "embedding_near_dups": _embedding_near_dups_oracle_sql(),
        "random_forest": _random_forest_oracle_sql(),
        "multimodal_features": _multimodal_features_oracle_sql(),
        "load_stac_catalog": f"""
            WITH {_GRID_CTE}
            SELECT x, y, 'data' AS band,
                   TIMESTAMP '2024-01-15 00:00:00' AS t,
                   round(sum(value), 6) AS value
            FROM grid WHERE x < 15 GROUP BY x, y
        """,
        "crs_utm": _crs_utm_oracle_sql(),
        "dedup_clusters": _dedup_clusters_oracle_sql(),
        "save_load_roundtrip": f"""
            WITH {_GRID_CTE}
            SELECT x, y, band, round(value, 6) AS value FROM grid
        """,
        "resample_cubic": _resample_kernel_oracle_sql("cubic"),
        "resample_cubicspline": _resample_kernel_oracle_sql("cubicspline"),
        "resample_gauss": _resample_kernel_oracle_sql("gauss"),
        "resample_lanczos": _resample_kernel_oracle_sql("lanczos"),
        "apply_neighborhood_2d": f"""
            WITH {_GRID_CTE}
            SELECT t.x, t.y, t.band, round(median(s.value), 6) AS value
            FROM (SELECT * FROM grid
                  WHERE CAST(x AS INT) % 3 = 0 AND CAST(y AS INT) % 3 = 0) t
            JOIN grid s ON s.band = t.band
              AND abs(s.x - t.x) <= 1 AND abs(s.y - t.y) <= 1
            GROUP BY 1, 2, 3
        """,
        "apply_neighborhood_2d_mean": f"""
            WITH {_GRID_CTE}
            SELECT t.x, t.y, t.band, round(avg(s.value), 6) AS value
            FROM grid t JOIN grid s ON s.band = t.band
              AND abs(s.x - t.x) <= 1 AND abs(s.y - t.y) <= 1
            GROUP BY 1, 2, 3
        """,
        "reduce_quantiles": """
            SELECT x, band, p.i - 1 AS pos, round(qs[p.i], 6) AS value
            FROM (SELECT l_suppkey AS x, l_returnflag AS band,
                         quantile_cont(l_quantity, [0.25, 0.75]) AS qs
                  FROM lineitem GROUP BY 1, 2),
                 (VALUES (1), (2)) p(i)
        """,
        "resample_mode": """
            WITH snapped AS (
              SELECT round(CAST(l_partkey AS DOUBLE) / 100) * 100 AS x,
                     round(CAST(l_suppkey AS DOUBLE) / 100) * 100 AS y,
                     l_returnflag AS band, l_quantity AS value
              FROM lineitem),
            counts AS (
              SELECT x, y, band, value, count(*) AS n
              FROM snapped GROUP BY ALL),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY x, y, band ORDER BY n DESC, value ASC) AS rn
              FROM counts)
            SELECT x, y, band, round(value, 6) AS value
            FROM ranked WHERE rn = 1
        """,
        "resample_rms": """
            SELECT round(CAST(l_partkey AS DOUBLE) / 100) * 100 AS x,
                   round(CAST(l_suppkey AS DOUBLE) / 100) * 100 AS y,
                   l_returnflag AS band,
                   round(sqrt(avg(value * value)), 6) AS value
            FROM (SELECT l_partkey, l_suppkey, l_returnflag,
                         l_quantity AS value FROM lineitem)
            GROUP BY 1, 2, 3
        """,
        "load_url_geojson": """
            SELECT CAST(n_nationkey AS VARCHAR) AS feature_id,
                   n_name AS name,
                   round(CAST(n_nationkey AS DOUBLE), 6) AS px,
                   round(CAST(n_regionkey AS DOUBLE), 6) AS py
            FROM nation
        """,
        "cummin": f"""
            WITH {_CELLS_CTE}
            SELECT x, pos, min(sq) OVER (PARTITION BY x ORDER BY pos) AS value
            FROM cells
        """,
        "cumproduct": f"""
            WITH {_CELLS_CTE}
            SELECT x, pos,
                   round(ln(product(sq) OVER (PARTITION BY x ORDER BY pos)),
                         6) AS value
            FROM cells
        """,
        "merge_concat": f"""
            WITH {_GRID_CTE}
            SELECT x, y, band, 'cube1' AS cubes, round(value, 6) AS value
            FROM grid
            UNION ALL
            SELECT x, y, band, 'cube2' AS cubes, round(value * 2, 6) AS value
            FROM grid
        """,
        "merge_disjoint_bands": f"""
            WITH {_GRID_CTE}
            SELECT x, y, band,
                   round(CASE band WHEN 'R' THEN value * 2 ELSE value END,
                         6) AS value
            FROM grid
        """,
        "merge_case4_subcube": f"""
            WITH {_GRID_CTE}
            SELECT x, y, band,
                   round(value - avg(value) OVER (PARTITION BY x, y), 6)
                     AS value
            FROM grid
        """,
        "array_ops2": f"""
            WITH {_CELLS_CTE},
            arrs AS (SELECT x, list(sq ORDER BY pos) AS l FROM cells GROUP BY x)
            SELECT x,
                   len(list_filter(l, z -> z > 30)) AS n_gt30,
                   round(l[1] * 2 + 1, 6) AS app0,
                   len(l) + CASE WHEN len(l) >= 2 THEN 1 ELSE 2 END AS n_mod,
                   list_position(l, list_max(l)) - 1 AS find_max,
                   len(l) AS n_labels
            FROM arrs
        """,
        "multimodal_resize": _multimodal_resize_oracle_sql(),
        "multimodal_av": _multimodal_av_oracle_sql(),
        "vector_buffer": """
            WITH pts AS (
              SELECT CAST(n_nationkey AS VARCHAR) AS feature_id,
                     n_name AS name,
                     CAST(n_nationkey AS DOUBLE) AS x,
                     CAST(n_regionkey AS DOUBLE) AS y
              FROM nation),
            rings AS (
              SELECT feature_id, name,
                     [x + 0.5 * cos(2 * pi() * i / 32)
                      for i in generate_series(0, 32)] AS xs,
                     [y + 0.5 * sin(2 * pi() * i / 32)
                      for i in generate_series(0, 32)] AS ys
              FROM pts)
            SELECT feature_id, name,
                   round(list_min(xs), 6) AS minx,
                   round(list_max(xs), 6) AS maxx,
                   round(list_min(ys), 6) AS miny,
                   round(list_max(ys), 6) AS maxy,
                   round(list_sum([xs[i] * ys[i + 1] - xs[i + 1] * ys[i]
                                   for i in generate_series(1, 32)]) / 2,
                         6) AS area
            FROM rings
        """,
        "filter_spatial": f"""
            WITH {_GRID_CTE}
            SELECT x, y, band, value FROM grid WHERE {_RECT_SQL}
        """,
        "mask_polygon": f"""
            WITH {_GRID_CTE}
            SELECT x, y, band,
                   CASE WHEN {_RECT_SQL} THEN value ELSE -1.0 END AS value
            FROM grid
        """,
        "apply_polygon": f"""
            WITH {_GRID_CTE}
            SELECT x, y, band,
                   CASE WHEN {_RECT_SQL} THEN round(sqrt(value), 6) END AS value
            FROM grid
        """,
        "trim_cube": """
            WITH c AS (
              SELECT user_id, ts AS t, event_type AS band,
                     CASE WHEN event_type = 'view' THEN NULL ELSE value END AS value
              FROM events),
            k1 AS (SELECT user_id FROM c GROUP BY 1 HAVING count(value) > 0),
            k2 AS (SELECT t FROM c GROUP BY 1 HAVING count(value) > 0),
            k3 AS (SELECT band FROM c GROUP BY 1 HAVING count(value) > 0)
            SELECT c.user_id, c.t, c.band, c.value
            FROM c JOIN k1 USING (user_id) JOIN k2 USING (t) JOIN k3 USING (band)
        """,
        "order_argsort": f"""
            WITH {_CELLS_CTE}, {_IDX_CTE}
            SELECT x,
                   row_number() OVER (PARTITION BY x ORDER BY sq, i) - 1 AS pos,
                   CAST(i AS DOUBLE) AS value
            FROM idx
        """,
        "rearrange": f"""
            WITH {_CELLS_CTE}, {_IDX_CTE}
            SELECT x,
                   CAST(CASE i WHEN 2 THEN 0 WHEN 0 THEN 1 ELSE 2 END AS BIGINT)
                     AS pos,
                   sq AS value
            FROM idx WHERE i <= 2
        """,
        "resample_spatial_grid": """
            SELECT round(CAST(l_partkey AS DOUBLE) / 100) * 100 AS x,
                   round(CAST(l_suppkey AS DOUBLE) / 100) * 100 AS y,
                   l_returnflag AS band, round(avg(l_quantity), 6) AS value
            FROM lineitem GROUP BY 1, 2, 3
        """,
        "resample_cube_spatial_coarse": f"""
            WITH {_GRID_CTE},
            tx AS (SELECT DISTINCT x - x % 3 AS t FROM grid),
            ty AS (SELECT DISTINCT y - y % 3 AS t FROM grid),
            sx AS (SELECT DISTINCT x AS s FROM grid),
            sy AS (SELECT DISTINCT y AS s FROM grid),
            mx AS (SELECT s, arg_min(t, abs(s - t)) AS t
                   FROM sx CROSS JOIN tx GROUP BY s),
            my AS (SELECT s, arg_min(t, abs(s - t)) AS t
                   FROM sy CROSS JOIN ty GROUP BY s)
            SELECT mx.t AS x, my.t AS y, g.band, round(avg(g.value), 6) AS value
            FROM grid g JOIN mx ON g.x = mx.s JOIN my ON g.y = my.s
            GROUP BY 1, 2, 3
        """,
        "rename_labels_enumerated": f"""
            WITH {_GRID_CTE}
            SELECT CASE x WHEN 0 THEN -1.0 WHEN 1 THEN -2.0
                          WHEN 2 THEN -3.0 ELSE x END AS x,
                   y, band, round(value, 6) AS value
            FROM grid
        """,
        "resample_cube_spatial_near": f"""
            WITH {_GRID_CTE},
            tx AS (SELECT DISTINCT floor(x / 4) * 4 + 0.25 AS t FROM grid),
            ty AS (SELECT DISTINCT floor(y / 4) * 4 + 0.25 AS t FROM grid),
            sx AS (SELECT DISTINCT x AS s FROM grid),
            sy AS (SELECT DISTINCT y AS s FROM grid),
            mx AS (SELECT t, arg_min(s, abs(t - s)) AS s
                   FROM tx CROSS JOIN sx GROUP BY t),
            my AS (SELECT t, arg_min(s, abs(t - s)) AS s
                   FROM ty CROSS JOIN sy GROUP BY t)
            SELECT mx.t AS x, my.t AS y, g.band, round(g.value, 6) AS value
            FROM grid g JOIN mx ON g.x = mx.s JOIN my ON g.y = my.s
        """,
        "apply_neighborhood_mean": f"""
            WITH {_CELLS_CTE}
            SELECT x, pos,
                   round(avg(sq) OVER (PARTITION BY x ORDER BY pos
                         ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 6) AS value
            FROM cells
        """,
        "cummax": f"""
            WITH {_CELLS_CTE}
            SELECT x, pos, max(sq) OVER (PARTITION BY x ORDER BY pos) AS value
            FROM cells
        """,
        "rename_labels_dim": """
            SELECT user_id AS uid, ts AS t,
                   CASE event_type WHEN 'click' THEN 'c' WHEN 'view' THEN 'v'
                        WHEN 'purchase' THEN 'p' ELSE event_type END AS band,
                   value
            FROM events
        """,
        "dimension_labels": """
            SELECT DISTINCT event_type AS band FROM events
        """,
        "predict_curve_linear": f"""
            WITH {_CELLS_CTE},
            sel AS (SELECT x, CAST(pos AS DOUBLE) AS pos, sq FROM cells
                    WHERE x % 10 = 0),
            ok AS (SELECT x FROM sel GROUP BY x HAVING count(*) >= 3),
            fits AS (
              SELECT s.x, regr_slope(s.sq, s.pos) AS m,
                     regr_intercept(s.sq, s.pos) AS b
              FROM sel s JOIN ok USING (x) GROUP BY s.x)
            SELECT x, t.pos, round(m * t.pos + b, 4) AS value
            FROM fits CROSS JOIN (VALUES (0.0), (10.0)) t(pos)
        """,
        "array_ops": f"""
            WITH {_CELLS_CTE},
            arrs AS (SELECT x, list(sq ORDER BY pos) AS l FROM cells GROUP BY x)
            SELECT x,
                   CASE WHEN len(l) > 2 THEN l[3] END AS elem2,
                   len(l) + 3 AS n_concat,
                   l[1] AS first_v, l[-1] AS last_v,
                   round(list_sum(l), 6) AS total
            FROM arrs
        """,
        "ddmc": f"""
            WITH {_CELLS_CTE},
            piv AS (
              SELECT x,
                     max(CASE WHEN pos = 1 THEN sq END) AS nir08,
                     max(CASE WHEN pos = 2 THEN sq END) AS nir09,
                     max(CASE WHEN pos = 3 THEN sq END) AS cirrus,
                     max(CASE WHEN pos = 4 THEN sq END) AS swir16,
                     max(CASE WHEN pos = 5 THEN sq END) AS swir22
              FROM cells WHERE pos <= 5 GROUP BY x)
            SELECT x, b.band,
                   round(CASE b.band WHEN 'midcl' THEN (nir08 - nir09) * 2.5
                                     WHEN 'dc' THEN (cirrus - swir22) * 2.5
                                     ELSE (swir16 - cirrus) * 2.5 END, 6) AS value
            FROM piv CROSS JOIN (VALUES ('midcl'), ('dc'), ('lowcl')) b(band)
        """,
        "mask_triangle": f"""
            WITH {_GRID_CTE}
            SELECT x, y, band,
                   CASE WHEN
                          (20.0 * (y - 0.5) - 2.0 * (x - 0.5)) > 0
                      AND (-12.0 * (y - 2.5) + 7.0 * (20.5 - x)) > 0
                      AND (-8.0 * (y - 9.5) + 9.0 * (x - 8.5)) > 0
                   THEN value ELSE 0.0 END AS value
            FROM grid
        """,
        "resample_bilinear": f"""
            WITH {_GRID_CTE},
            gx AS (SELECT min(v) AS o, max(v) AS m,
                          min(CASE WHEN d > 0 THEN d END) AS s, count(*) AS n
                   FROM (SELECT v, v - lag(v) OVER (ORDER BY v) AS d
                         FROM (SELECT DISTINCT x AS v FROM grid))),
            gy AS (SELECT min(v) AS o, max(v) AS m,
                          min(CASE WHEN d > 0 THEN d END) AS s, count(*) AS n
                   FROM (SELECT v, v - lag(v) OVER (ORDER BY v) AS d
                         FROM (SELECT DISTINCT y AS v FROM grid))),
            mapx AS (
              SELECT t.tx,
                     gx.o + (t.i0 + o.di) * gx.s AS sx,
                     CASE WHEN o.di = 0 THEN 1 - t.wx ELSE t.wx END AS wxv
              FROM (SELECT tx,
                           least(floor((tx - gx.o) / gx.s), gx.n - 2) AS i0,
                           (tx - gx.o) / gx.s
                             - least(floor((tx - gx.o) / gx.s), gx.n - 2) AS wx
                    FROM (SELECT gx.o + k.generate_series * 2.5 AS tx
                          FROM generate_series(0, 100000) k, gx
                          WHERE k.generate_series
                                <= floor((gx.m - gx.o) / 2.5 + 1e-9)),
                         gx) t,
                   gx, (VALUES (0), (1)) o(di)),
            mapy AS (
              SELECT t.ty,
                     gy.o + (t.j0 + o.dj) * gy.s AS sy,
                     CASE WHEN o.dj = 0 THEN 1 - t.wy ELSE t.wy END AS wyv
              FROM (SELECT ty,
                           least(floor((ty - gy.o) / gy.s), gy.n - 2) AS j0,
                           (ty - gy.o) / gy.s
                             - least(floor((ty - gy.o) / gy.s), gy.n - 2) AS wy
                    FROM (SELECT gy.o + k.generate_series * 2.5 AS ty
                          FROM generate_series(0, 100000) k, gy
                          WHERE k.generate_series
                                <= floor((gy.m - gy.o) / 2.5 + 1e-9)),
                         gy) t,
                   gy, (VALUES (0), (1)) o(dj)),
            mapping AS (
              SELECT tx, ty, sx, sy, wxv * wyv AS w
              FROM mapx CROSS JOIN mapy
              WHERE wxv * wyv > 0)
            SELECT m.tx AS x, m.ty AS y, g.band,
                   round(sum(m.w * g.value) / sum(m.w), 6) AS value
            FROM grid g JOIN mapping m ON g.x = m.sx AND g.y = m.sy
            GROUP BY 1, 2, 3
        """,
        "salted_reduce": """
            SELECT user_id, event_type AS band, round(avg(value), 6) AS value
            FROM events GROUP BY ALL
        """,
        "apply_dimension_dropnull": f"""
            WITH {_CELLS_CTE},
            gappy AS (
              SELECT x, pos,
                     CASE WHEN md > 0.05 THEN NULL ELSE sq END AS v
              FROM cells)
            SELECT x,
                   row_number() OVER (PARTITION BY x ORDER BY pos) - 1 AS pos,
                   v AS value
            FROM gappy WHERE v IS NOT NULL
        """,
        "resample_mercator": """
            SELECT round((radians(x) * 6378137.0) / 1000000) * 1000000 AS x,
                   round((6378137.0 * ln(tan(pi()/4 + radians(y)/2)))
                         / 1000000) * 1000000 AS y,
                   band, round(avg(value), 6) AS value
            FROM (SELECT CAST(l_partkey % 360 AS DOUBLE) - 179.5 AS x,
                         CAST(l_suppkey % 170 AS DOUBLE) - 84.5 AS y,
                         l_returnflag AS band, l_quantity AS value
                  FROM lineitem)
            GROUP BY 1, 2, 3
        """,
        "vector_reproject": """
            SELECT CAST(n_nationkey AS VARCHAR) AS feature_id,
                   round(radians(CAST(n_nationkey AS DOUBLE) * 3.0 - 30.0)
                         * 6378137.0, 4) AS mx,
                   round(6378137.0 * ln(tan(pi()/4 +
                         radians(CAST(n_regionkey AS DOUBLE) * 10.0 - 20.0)/2)),
                         4) AS my
            FROM nation
        """,
        "streaming_sessions": """
            WITH ev AS (
              SELECT user_id, make_timestamp(epoch_us(ts)) AS t,
                     coalesce(value, 0) AS v
              FROM events),
            mx AS (SELECT user_id, max(t) AS mt FROM ev GROUP BY 1),
            lagd AS (
              SELECT user_id, t, v,
                     CASE WHEN lag(t) OVER w IS NULL
                               OR epoch_us(t) - epoch_us(lag(t) OVER w)
                                  > 86400000000
                          THEN 1 ELSE 0 END AS brk
              FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t)),
            sess AS (
              SELECT user_id, t, v,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY t) AS sid
              FROM lagd),
            agg AS (
              SELECT user_id, min(t) AS session_start, max(t) AS session_end,
                     count(*) AS n_events, round(sum(v), 6) AS value_sum
              FROM sess GROUP BY user_id, sid)
            SELECT a.user_id, a.session_start, a.session_end, a.n_events,
                   a.value_sum
            FROM agg a JOIN mx USING (user_id)
            WHERE epoch_us(a.session_end) < epoch_us(mx.mt) - 86400000000
        """,
        "rqa_trend": """
            WITH daily AS (
              SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS t,
                     event_type AS band, avg(value) AS v
              FROM events GROUP BY ALL),
            idx AS (
              SELECT user_id, band, v,
                     row_number() OVER (PARTITION BY user_id, band ORDER BY t) AS i,
                     count(*) OVER (PARTITION BY user_id, band) AS n
              FROM daily),
            pairs AS (
              SELECT a.user_id, a.band, b.i - a.i AS tau,
                     CAST(abs(a.v - b.v) < 10.0 AS DOUBLE) AS r
              FROM idx a JOIN idx b
                ON a.user_id = b.user_id AND a.band = b.band AND b.i > a.i
              WHERE a.n >= 3),
            rr AS (SELECT user_id, band, tau, avg(r) AS rr
                   FROM pairs GROUP BY ALL)
            SELECT user_id, band, round(regr_slope(rr, tau), 6) AS value
            FROM rr GROUP BY user_id, band
        """,
        "text_ops": """
            SELECT doc_id,
                   starts_with(lower(text), 'the') AS b,
                   contains(text, 'and') AS c,
                   ends_with(text, '.') AS e,
                   concat_ws('-', coalesce(lang, 'null'),
                             coalesce(source, 'null')) AS cc
            FROM documents
        """,
        # random_forest / vector_buffer / multimodal_features: model /
        # geometry-string / binary-payload outputs — rows-only by design.
    }

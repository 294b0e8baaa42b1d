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
    cube = reduce_dimension(cube, "mean", "user_id")
    return _round6(cube.df, "value")


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
    return filter_temporal(cube, ["2024-01-10", "2024-01-20"]).df


def q_filter_bands(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.operators.filters import filter_bands

    cube = _events_cube(spark, sf_dir)
    return filter_bands(cube, ["click", "purchase"]).df


def q_filter_labels_text(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.functions.text import text_begins
    from openeo_processes_dask_spark.operators.filters import filter_labels

    cube = _events_cube(spark, sf_dir)
    return filter_labels(cube, lambda c: text_begins(c, "c"), "band").df


def q_filter_bbox(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.filters import filter_bbox

    df = _table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("double").alias("x"),
        F.col("l_suppkey").cast("double").alias("y"),
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
    out = merge_cubes(c1, c2, overlap_resolver="multiply")
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
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.mask import mask
    from openeo_processes_dask_spark.operators.windows import (
        array_interpolate_linear,
    )

    cells = _li_cells(spark, sf_dir)
    data = DataCube(
        cells.select("x", F.col("pos").cast("double").alias("pos"),
                     F.col("sq").alias("value")),
        dims=("x", "pos"),
    )
    m = DataCube(
        cells.select("x", F.col("pos").cast("double").alias("pos"),
                     (F.col("md") > 0.05).cast("int").alias("value")),
        dims=("x", "pos"),
    )
    gappy = mask(data, m)
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


def q_lsh_topk(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.training.similarity import lsh_topk

    emb = _table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    return lsh_topk(emb, [float(v) for v in query], k=10)


def q_embedding_near_dups(spark, sf_dir):
    _setup(spark)
    from openeo_processes_dask_spark.training.similarity import (
        pairwise_cosine_above,
    )

    emb = _table(spark, sf_dir, "embeddings")
    return pairwise_cosine_above(emb, threshold=0.2, n_planes=6)


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
        "token_count": q_token_count,
        "text_quality": q_text_quality,
        "language_id": q_language_id,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_near_dups": q_minhash_near_dups,
        "simhash_near_dups": q_simhash_near_dups,
        "cosine_topk": q_cosine_topk,
        "lsh_topk": q_lsh_topk,
        "embedding_near_dups": q_embedding_near_dups,
    }


# ----------------------------------------------------------------------
# DuckDB oracles
# ----------------------------------------------------------------------

_TOKS = r"string_split_regex(trim(lower(text)), '\s+')"


def oracle_sql() -> dict[str, str]:
    return {
        "flagship_daily_mean": """
            SELECT t, band, round(avg(value), 6) AS value FROM (
              SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS t,
                     event_type AS band, avg(value) AS value
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
            SELECT CAST(l_partkey AS DOUBLE) AS x, CAST(l_suppkey AS DOUBLE) AS y,
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
        # minhash_near_dups / simhash_near_dups / lsh_topk /
        # embedding_near_dups: algorithm-specific candidate generation
        # (seeded hash families / hyperplanes) — rows-only check by design.
    }

"""Inverted-index ranked retrieval — the MANY-queries scale path.

:func:`...textanalysis.bm25_topk` inlines one query's terms as literals
and scans the corpus per query: right for ad-hoc exploration, wrong for a
curation pipeline scoring thousands of topic probes. This module builds
the classic inverted index ONCE (postings + document stats — one corpus
scan each) and answers a whole query TABLE with joins: cost is then
driven by postings actually touched, not corpus size × query count.

No reference counterpart (LLM-pipeline lane). Scoring uses the same
Lucene-form BM25 as bm25_topk; per-term contributions are snapped to
integer micro-units before the per-(query, doc) sum, so the aggregate is
order-independent — bit-identical under any partitioning and exactly
replayable by the DuckDB oracle (the engine's established idiom: k-means
centroids, logreg gradients, DSIR weights).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_inverted_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(postings, doc_stats): postings = (term, id, tf) — one explode +
    one hash aggregate keyed by (term, id); doc_stats = (id, dl). At
    100 TB both are write-once tables partitioned/bucketed by term
    (postings) and id (doc_stats) — the layout every retrieval join
    reuses; here they stay DataFrames."""
    from openeo_processes_dask_spark.training.dedup import _spread
    from openeo_processes_dask_spark.training.textanalysis import tokens

    # keyed spread (r13, guide §2.4): a small-file corpus arrives in
    # fewer partitions than cores, pinning the tokenize+explode to one
    # task. Hash-partitioning by id BEFORE tokenizing parallelizes it
    # AND satisfies the (term, id) aggregate's clustering (id is a
    # subset of the group keys), so the aggregate fuses partial+final
    # over this one exchange — the minhash_signatures shape. No-op at
    # scale. A/B at sf0.1: index build 0.82 -> 0.59 s, identical tables.
    toks = _spread(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t__")),
        key="id",
    ).select("id", tokens(F.lower(F.col("__t__"))).alias("w"))
    postings = (
        toks.select("id", F.explode("w").alias("term"))
        .groupBy("term", "id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doc_stats = toks.select("id", F.size("w").alias("dl"))
    return postings, doc_stats


def bm25_search(
    postings: DataFrame,
    doc_stats: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    query_id_col: str = "query_id",
    terms_col: str = "terms",
) -> DataFrame:
    """Top-``k`` BM25 answers for EVERY query in ``queries``
    (query_id, terms array<string>). Returns (query_id, rank, id, score).

    Plan: query terms explode (query-table sized), join the per-term df
    stats (term-vocabulary sized — broadcastable), join postings on term
    (the only corpus-driven join, keyed by term so a term-partitioned
    postings table prunes), one hash aggregate on (query_id, id) summing
    integer micro-unit contributions, then row_number <= k per query —
    compiles to WindowGroupLimit, so only k rows per query cross the
    final exchange. N and avgdl are two driver scalars (metadata)."""
    stats = doc_stats.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).first()
    n_docs, avgdl = stats["n"], float(stats["avgdl"] or 1.0)
    if not n_docs:
        return queries.select(
            F.col(query_id_col).alias("query_id"),
            F.lit(1).alias("rank"),
            F.lit(None).cast("long").alias("id"),
            F.lit(0.0).alias("score"),
        ).where(F.lit(False))
    term_df = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.col(terms_col)).alias("term"),
    ).distinct()
    # idf from the joined df counts — same Lucene always-positive form
    # and the same association order as bm25_topk's driver-side literals
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    matched = (
        qt.join(term_df, "term")
        .join(postings, "term")
        .join(doc_stats, "id")
    )
    dl = F.col("dl").cast("double")
    tf = F.col("tf").cast("double")
    norm = F.lit(k1) * (F.lit(1 - b) + F.lit(b) * dl / F.lit(avgdl))
    contrib = idf * (tf * (k1 + 1)) / (tf + norm)
    scored = (
        matched.select(
            "query_id",
            "id",
            F.round(contrib * 1e6).cast("long").alias("c_micro"),
        )
        .groupBy("query_id", "id")
        .agg(F.sum("c_micro").alias("s_micro"))
        .where(F.col("s_micro") > 0)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("s_micro").desc(), F.col("id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "id",
            (F.col("s_micro") / 1e6).alias("score"),
        )
    )


#: integer micro-units for per-position DCG gain terms: each
#: (2^rel - 1) / log2(rank + 1) term is snapped to micro-units BEFORE
#: the per-query sum, so DCG/IDCG are integer sums — order-independent
#: under any partitioning and exactly replayable by the DuckDB oracle
GAIN_SCALE = 1_000_000


def _round_half_up_double(x: float) -> int:
    """Replay JVM ``F.round`` on a double EXACTLY (ADVICE r12 #2):
    Spark's Round goes through ``BigDecimal.valueOf(x)`` — the SHORTEST
    decimal string that round-trips (``Double.toString``) — then
    HALF_UP at scale 0. Python's ``repr(float)`` produces the same
    shortest round-trip decimal, so ``Decimal(repr(x))`` is the same
    decimal value. ``floor(x + 0.5)`` is NOT equivalent: the binary sum
    ``x + 0.5`` can cross an integer boundary through floating-point
    error (e.g. 0.49999999999999994 + 0.5 == 1.0 in doubles, so
    floor(x+0.5) says 1 while HALF_UP on the decimal value says 0)."""
    import decimal

    return int(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
        )
    )


def ranking_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Graded ranking evaluation — NDCG@k, MRR, precision@k, recall@k —
    for every query in ``results``, against a relevance table ``qrels``.

    The missing third leg of the retrieval lane: ``bm25_search`` answers
    query tables, ``rrf_fuse`` combines retrievers, and this scores any
    ranked run against judgments — the eval loop a curation pipeline
    runs when tuning its retrieval/dedup thresholds. Standard
    definitions (Järvelin & Kekäläinen 2002 for DCG; TREC conventions):

    - ``dcg_micro``  = sum over retrieved ranks <= k with rel > 0 of
      round((2^rel - 1) / log2(rank + 1) * GAIN_SCALE)
    - ``idcg_micro`` = the same sum over the ideal ordering (rel DESC,
      id ASC for determinism) of that query's judged-relevant docs,
      truncated at k
    - ``ndcg_at_k``  = dcg_micro / idcg_micro (0.0 when no relevant
      docs exist), ``mrr`` = 1 / first relevant rank via integer div
      (10^9 div rank / 1e9 — floor-exact in both engines),
      ``precision_at_k`` = hits / k, ``recall_at_k`` = hits / n_rel
    - ``ap_micro``   = sum over retrieved hits at rank r of
      round(cum_hits(r) / r * GAIN_SCALE) — per-position precision in
      micro-units; ``map_at_k`` = ap_micro / min(n_rel, k) / GAIN_SCALE
      (the standard AP denominator, so a run that retrieves every
      reachable relevant doc in order scores 1.0)

    Contracts: ``results`` has one row per (query, id) with a 1-based
    ``rank`` unique within the query; ``qrels`` has at most one row per
    (query, id) with integer grade ``rel`` (rows with rel <= 0 are
    non-relevant and ignored). Output: one row per distinct query in
    ``results`` — queries judged but never run are NOT scored.

    Plan at scale: run tables are top-k lists (queries x k rows — tiny
    relative to any corpus); everything shuffles once on the query key
    (the ideal-ordering window compiles to WindowGroupLimit, so only k
    judged rows per query cross its exchange), and the three per-query
    aggregates join back on that same key.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    r = results.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("id"),
        F.col(rank_col).cast("long").alias("rank"),
    ).where(F.col("rank") <= k)
    q = qrels.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("id"),
        F.col(rel_col).cast("long").alias("rel"),
    ).where(F.col("rel") > 0)

    def gain_micro(rel: Column, pos: Column) -> Column:
        g = F.pow(F.lit(2.0), rel.cast("double")) - F.lit(1.0)
        return F.round(
            g / F.log2(pos.cast("double") + F.lit(1.0)) * GAIN_SCALE
        ).cast("long")

    from pyspark.sql import Window

    hit = F.col("rel").isNotNull()
    # cumulative hit count along the ranking — the per-position
    # precision AP needs; the window shares the query-key partitioning
    # the aggregate below shuffles on, and holds <= k rows per query.
    # id tiebreak: ranks are unique per query by contract, but a
    # violating input must still aggregate deterministically
    wr = Window.partitionBy("query_id").orderBy(
        "rank", "id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per_q = (
        r.join(q, ["query_id", "id"], "left")
        .withColumn(
            "cum_hits",
            F.sum(F.when(hit, 1).otherwise(0)).over(wr).cast("long"),
        )
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(hit, gain_micro(F.col("rel"), F.col("rank")))
                .otherwise(F.lit(0))
            ).alias("dcg_micro"),
            F.min(F.when(hit, F.col("rank"))).alias("first_rel_rank"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("hits"),
            F.sum(
                F.when(
                    hit,
                    F.round(
                        F.col("cum_hits") / F.col("rank") * GAIN_SCALE
                    ).cast("long"),
                ).otherwise(F.lit(0))
            ).alias("ap_micro"),
        )
    )

    ideal, totals = _ranking_ideal_totals(q, k)
    return _ranking_finalize(per_q, ideal, totals, k)


def _ranking_ideal_totals(
    q: DataFrame, k: int
) -> tuple[DataFrame, DataFrame]:
    """(ideal idcg table, per-query judged totals) from a normalized
    qrels relation (query_id, id, rel>0) — shared by the batch lane and
    the streaming twin (both join these STATIC per-query constants onto
    their per-query run stats)."""
    from pyspark.sql import Window

    def gain_micro(rel: Column, pos: Column) -> Column:
        g = F.pow(F.lit(2.0), rel.cast("double")) - F.lit(1.0)
        return F.round(
            g / F.log2(pos.cast("double") + F.lit(1.0)) * GAIN_SCALE
        ).cast("long")

    wq = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("id")
    )
    ideal = (
        q.withColumn("pos", F.row_number().over(wq))
        .where(F.col("pos") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(gain_micro(F.col("rel"), F.col("pos")))
            .alias("idcg_micro")
        )
    )
    totals = q.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    return ideal, totals


def _ranking_finalize(
    per_q: DataFrame, ideal: DataFrame, totals: DataFrame, k: int,
    extra_cols: tuple = (),
    broadcast_static: bool = False,
) -> DataFrame:
    """Join per-query run stats (dcg_micro, first_rel_rank, hits,
    ap_micro) with the ideal/totals tables and project the metric row —
    the shared tail of :func:`ranking_metrics` and
    :func:`stream_ranking_metrics` (``extra_cols`` carries the
    streaming lane's progress column through). ``broadcast_static``
    forces broadcast of the ideal/totals sides: required on the
    streaming path, where a post-state SHUFFLE join crashes (Spark
    hands the state operator's columnar output to the row-based
    shuffle writer — ColumnarBatchRow/UnsafeRow ClassCastException)
    and the per-query constant tables are judgment-set-sized anyway."""
    if broadcast_static:
        ideal, totals = F.broadcast(ideal), F.broadcast(totals)
    rr = F.expr("CAST(1000000000 AS BIGINT) div first_rel_rank") / F.lit(
        1_000_000_000.0
    )
    return (
        per_q.join(ideal, "query_id", "left")
        .join(totals, "query_id", "left")
        .select(
            "query_id",
            *extra_cols,
            F.coalesce(F.col("n_rel"), F.lit(0)).cast("long")
            .alias("n_rel"),
            "hits",
            "dcg_micro",
            F.coalesce(F.col("idcg_micro"), F.lit(0)).cast("long")
            .alias("idcg_micro"),
            F.when(
                F.col("idcg_micro") > 0,
                F.round(F.col("dcg_micro") / F.col("idcg_micro"), 6),
            ).otherwise(F.lit(0.0)).alias("ndcg_at_k"),
            F.when(F.col("first_rel_rank").isNotNull(), rr)
            .otherwise(F.lit(0.0)).alias("mrr"),
            F.round(F.col("hits") / F.lit(float(k)), 6)
            .alias("precision_at_k"),
            F.when(
                F.col("n_rel") > 0,
                F.round(F.col("hits") / F.col("n_rel"), 6),
            ).otherwise(F.lit(0.0)).alias("recall_at_k"),
            F.col("ap_micro"),
            F.when(
                F.col("n_rel") > 0,
                F.round(
                    F.col("ap_micro")
                    / F.least(F.col("n_rel"), F.lit(k))
                    / F.lit(float(GAIN_SCALE)),
                    6,
                ),
            ).otherwise(F.lit(0.0)).alias("map_at_k"),
        )
    )


def stream_ranking_metrics(
    results_stream: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of :func:`ranking_metrics` (r12, VERDICT r11 #7)
    — the online evaluation a serving pipeline runs while result rows
    land: per query, the metrics over everything seen SO FAR, refreshed
    on each micro-batch that touches the query.

    Input stream columns: ``t`` (timestamp, non-NULL — the watermark
    needs it), ``query_id`` (long), ``id`` (long), ``rank`` (long,
    1-based, unique per query). ``qrels`` is STATIC (judgments exist
    before the run streams in): normalized to (query_id, id, rel>0)
    exactly like the batch lane.

    Shape: relevance attaches by a stream-static equi-join BEFORE the
    stateful step, so state per query is only the accumulated (rank,
    id, rel) triples — ≤ k rows by contract. Each update emits the
    query's run stats (dcg/ap micro-units, first relevant rank, hits —
    the same integer arithmetic as the batch ``per_q`` aggregate,
    replayed over ≤ k rows in Python with half-up rounding to match
    JVM ``F.round``), plus ``n_seen`` (rows accumulated — the progress
    column that distinguishes interim from final emissions). A second
    stream-static join attaches the per-query idcg/n_rel constants and
    the SHARED :func:`_ranking_finalize` projection produces the
    metric row, so a query's final emission (``n_seen`` == its run
    length) equals the batch :func:`ranking_metrics` row bit-for-bit
    (pinned by test).

    State is ≤ k small triples per query, append mode, no timeouts —
    the same bounded-state contract as the other streaming twins."""
    import math

    from typing import Iterable, Iterator, Tuple

    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q = qrels.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("id").cast("long").alias("id"),
        F.col("rel").cast("long").alias("rel"),
    ).where(F.col("rel") > 0)
    r = (
        results_stream.select(
            "t",
            F.col("query_id").cast("long").alias("query_id"),
            F.col("id").cast("long").alias("id"),
            F.col("rank").cast("long").alias("rank"),
        )
        .where(F.col("rank") <= k)
        # stream-static left join: rel rides each result row into the
        # stateful step, so state never needs the qrels table
        .join(q, ["query_id", "id"], "left")
    )

    _round_half_up = _round_half_up_double

    def update(
        key: Tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (qid,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            state.remove()
            return
        ranks, ids, rels = (
            state.get if state.exists else ((), (), ())
        )
        ranks, ids, rels = list(ranks), list(ids), list(rels)
        for pdf in pdfs:
            for rank, rid, rel in zip(
                pdf["rank"].astype("int64"), pdf["id"].astype("int64"),
                pdf["rel"],
            ):
                ranks.append(int(rank))
                ids.append(int(rid))
                rels.append(None if pd.isna(rel) else int(rel))
        state.update((tuple(ranks), tuple(ids), tuple(rels)))
        # replay the batch per_q aggregate over the ≤ k accumulated
        # rows: cum_hits along (rank, id) order, micro-unit gains
        order = sorted(range(len(ranks)), key=lambda i: (ranks[i], ids[i]))
        dcg = ap = hits = 0
        first_rel = None
        for i in order:
            if rels[i] is None:
                continue
            hits += 1
            rank = ranks[i]
            first_rel = rank if first_rel is None else min(first_rel, rank)
            # log(x)/log(2) mirrors the JVM Log2 expression shape (not
            # math.log2) so the double value matches bit-for-bit
            gain = (2.0 ** rels[i] - 1.0) / (
                math.log(rank + 1.0) / math.log(2.0)
            )
            dcg += _round_half_up(gain * GAIN_SCALE)
            # cum_hits at this row = hits (rows are in (rank, id) order)
            ap += _round_half_up(hits / rank * GAIN_SCALE)
        yield pd.DataFrame(
            [(int(qid), len(ranks), dcg, first_rel, hits, ap)],
            columns=[
                "query_id", "n_seen", "dcg_micro", "first_rel_rank",
                "hits", "ap_micro",
            ],
        )

    per_q = (
        r.withWatermark("t", watermark)
        .groupBy("query_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "query_id long, n_seen long, dcg_micro long, "
                "first_rel_rank long, hits long, ap_micro long"
            ),
            stateStructType=(
                "ranks array<long>, ids array<long>, rels array<long>"
            ),
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    ideal, totals = _ranking_ideal_totals(q, k)
    return _ranking_finalize(
        per_q, ideal, totals, k, extra_cols=("n_seen",),
        broadcast_static=True,
    )


#: integer micro-units for reciprocal-rank scores; 1e9 // (k0 + rank)
#: keeps ~7 significant digits for any rank a retriever emits while the
#: summed fusion score of even thousands of lists stays far inside int64
RRF_SCALE = 1_000_000_000


def rrf_fuse(
    rankings: list[DataFrame], k0: int = 60, k: int = 10
) -> DataFrame:
    """Reciprocal-Rank Fusion (Cormack et al., SIGIR'09) of N ranked
    lists — the standard way a curation pipeline combines lexical (BM25)
    and dense (embedding-cosine) retrieval without score calibration:
    only RANKS enter the fused score, so the incomparable score scales
    of the input retrievers never matter.

    Each input DataFrame must carry ``id`` and ``rank`` (1-based)
    columns. Returns the global top-``k`` as (rank, id, rrf_micro,
    n_lists): ``rrf_micro = sum over lists of RRF_SCALE // (k0 + rank)``
    — the RRF sum in integer micro-units, so the fusion is bit-exact
    under any partitioning — and ``n_lists`` = how many input lists
    ranked the id at all. Ties break by id ASC.

    Plan at 100 TB: the inputs are top-k lists (already tiny relative to
    the corpus); the fusion is one union + one hash aggregate on id +
    TakeOrderedAndProject — nothing here ever touches the corpus again.
    """
    from pyspark.sql import Window

    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if k0 < 1:
        raise ValueError(f"k0 must be >= 1, got {k0}")
    u = None
    for r in rankings:
        # integer `div`, not `/ + cast`: float division then CAST rounds
        # in DuckDB but truncates in Spark — div floors in both
        s = r.select(
            F.col("id"),
            F.expr(
                f"CAST({RRF_SCALE} AS BIGINT) div "
                f"CAST({k0} + rank AS BIGINT)"
            ).alias("part"),
        )
        u = s if u is None else u.unionByName(s)
    fused = u.groupBy("id").agg(
        F.sum("part").alias("rrf_micro"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
    topk = fused.orderBy(F.col("rrf_micro").desc(), F.col("id")).limit(k)
    w = Window.orderBy(F.col("rrf_micro").desc(), F.col("id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "id", "rrf_micro", "n_lists"
    )

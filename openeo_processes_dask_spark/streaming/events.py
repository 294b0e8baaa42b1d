"""Structured Streaming surface (SURVEY.md §2.14).

The reference has NO streaming (batch calendar buckets only) — this module
is the Spark-native extension: the same cube operators expressed over an
unbounded events source with watermarked event-time windows, so a pipeline
written against the batch cube API has a streaming twin.

Late data: the watermark is a lower bound for state EVICTION and
append-mode finalization — for plain aggregations Spark does NOT reject
late input (a straggler behind the watermark is admitted; its already-
expired window finalizes immediately — pinned in
tests/test_plans_and_streaming.py::test_watermark_controls_finalization
_not_admission). Guaranteed late-row dropping applies to
dropDuplicatesWithinWatermark and the stateful applyInPandasWithState
timeout paths.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openeo_processes_dask_spark.functions.reducers import resolve_reducer

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def stream_events(
    spark: SparkSession,
    path: str,
    schema: str = EVENTS_SCHEMA,
    max_files_per_trigger: Optional[int] = 1,
) -> DataFrame:
    """Unbounded read of an events directory (new parquet files = new
    micro-batches). Cube framing: t = ts, band = event_type."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path).select(
        "user_id",
        F.col("ts").alias("t"),
        F.col("event_type").alias("band"),
        "value",
    )


def stream_aggregate_temporal_period(
    stream: DataFrame,
    window_duration: str = "1 day",
    watermark: str = "1 hour",
    reducer: str = "mean",
) -> DataFrame:
    """Streaming twin of aggregate_temporal_period: watermarked tumbling
    event-time window + the same reducer library. Output columns match the
    batch operator (t = window start, band, value)."""
    builder = resolve_reducer(reducer)
    value = builder(F.col("value")).alias("value")
    return (
        stream.withWatermark("t", watermark)
        .groupBy(F.window("t", window_duration).alias("__w__"), "band")
        .agg(value)
        .select(F.col("__w__.start").alias("t"), "band", "value")
    )


def stream_aggregate_sliding(
    stream: DataFrame,
    window_duration: str = "3 days",
    slide: str = "1 day",
    watermark: str = "1 hour",
    reducer: str = "sum",
) -> DataFrame:
    """Sliding event-time windows (duration > slide): every event lands in
    duration/slide overlapping windows — the streaming rolling aggregate.
    State per (window, band) is bounded by the watermark exactly as in the
    tumbling case; the fan-out multiplies state rows, not input scans."""
    builder = resolve_reducer(reducer)
    value = builder(F.col("value")).alias("value")
    return (
        stream.withWatermark("t", watermark)
        .groupBy(F.window("t", window_duration, slide).alias("__w__"), "band")
        .agg(value)
        .select(F.col("__w__.start").alias("t"), "band", "value")
    )


def run_stream_to_memory(
    out: DataFrame, query_name: str = "stream_test", output_mode: str = "complete"
):
    """Drain all currently-available input (Trigger.AvailableNow) into an
    in-memory sink — the pattern tests use to verify streaming semantics
    deterministically. Stateful append-mode operators (sessionize) pass
    ``output_mode="append"``."""
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_exact(
    stream: DataFrame,
    key_cols: list,
    watermark: str = "1 hour",
    time_col: str = "t",
) -> DataFrame:
    """Streaming exact deduplication: emit only the FIRST event per key,
    with state bounded by the watermark (``dropDuplicatesWithinWatermark``
    — keys older than the watermark are evicted, so state never grows
    unboundedly the way an unbounded ``dropDuplicates`` would).

    This is the streaming twin of training.dedup.exact_duplicates' keep
    decision: in a training-data ingest pipeline it deduplicates the
    firehose before it ever lands, instead of a later batch pass. Exact
    only within the watermark horizon — a duplicate arriving later than
    the watermark is a new "first" (the standard streaming trade-off;
    the batch pass remains the ground truth across horizons).
    """
    if not key_cols:
        raise ValueError(
            "stream_dedup_exact requires explicit key_cols — guessing key "
            "columns on an arbitrary schema risks deduplicating on "
            "coincidentally-named columns"
        )
    return stream.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def stream_dedup_against(
    stream: DataFrame,
    seen: DataFrame,
    key_cols: list,
) -> DataFrame:
    """Stream-static LEFT ANTI join: drop streamed rows whose key already
    exists in a static "seen" table — the streaming twin of
    training.dedup.dedup_against, i.e. ingest v_{n} while filtering
    everything already in v_{n-1}'s fingerprint table.

    Plan shape at scale: the static side reduces to DISTINCT keys before
    the join (digests, not payloads), and Spark re-plans the static side
    per micro-batch, broadcasting it when small. Stateless — no watermark
    needed, unlike within-stream dedup: the state IS the static table."""
    if not key_cols:
        raise ValueError(
            "stream_dedup_against requires explicit key_cols — guessing "
            "key columns on an arbitrary schema risks anti-joining on "
            "coincidentally-named columns"
        )
    keys = list(key_cols)
    seen_keys = seen.select(*keys).distinct()
    return stream.join(seen_keys, keys, "left_anti")


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "t",
    right_time: str = "t",
    watermark: str = "1 hour",
    within: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: match right-stream rows to
    left-stream rows with the same ``on`` key whose event time falls in
    ``[left_time, left_time + within]`` — the view→click attribution /
    request→response correlation shape.

    Both sides carry a watermark and the join condition bounds BOTH
    event-time columns, which is what lets Spark EVICT join state: a
    buffered left row can be dropped once the right watermark passes
    ``left_time + within`` (and vice versa) — without the time bound the
    state store grows forever, the classic unbounded-join failure at
    100 TB/day rates. Output column names are prefixed ``l_``/``r_`` (a
    stream-stream join of two same-schema streams would otherwise emit
    ambiguous duplicate names).

    Late data: rows behind their stream's watermark may miss matches
    whose state was already evicted — the standard streaming trade;
    size ``watermark`` to the real out-of-orderness.
    """
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    l = lw.select(
        [F.col(c).alias(f"l_{c}") for c in lw.columns]
    )
    r = rw.select(
        [F.col(c).alias(f"r_{c}") for c in rw.columns]
    )
    cond = (
        (F.col(f"l_{on}") == F.col(f"r_{on}"))
        & (F.col(f"r_{right_time}") >= F.col(f"l_{left_time}"))
        & (
            F.col(f"r_{right_time}")
            <= F.col(f"l_{left_time}") + F.expr(f"INTERVAL {within}")
        )
    )
    return l.join(r, cond, how)


def run_stream_to_parquet(
    out: DataFrame, path: str, checkpoint: str
) -> "StreamingQuery":
    """Drain the stream into a parquet directory sink with EXACTLY-ONCE
    file semantics: the checkpoint records which source files each batch
    consumed and the sink's ``_spark_metadata`` log records which output
    files each batch committed, so a crash-and-restart (or a re-run over
    an already-drained source) appends nothing twice. This is the
    durable end of a streaming ETL — memory sinks are for tests, parquet
    sinks are what a 100 TB ingest actually writes. Append mode only
    (file sinks cannot retract)."""
    return (
        out.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def run_stream_upsert_manifest(
    out: DataFrame,
    table_dir: str,
    key_cols: list[str],
    checkpoint: str,
) -> "StreamingQuery":
    """Streaming merge-into: drain the stream through ``foreachBatch``
    and upsert each micro-batch into a manifest-versioned table
    (sources/manifest.py) — the production shape of a continuously
    updated 100 TB dataset: every batch becomes one atomic manifest
    commit that rewrites only the files holding matched keys, the
    checkpoint makes redelivery idempotent-at-the-batch level, and
    readers keep snapshot isolation (a reader pinned to version N never
    sees a half-applied batch).

    Within a batch, rows are reduced to one per key — a WHOLE row, never
    a per-column mix: the winner is max over the struct of value columns,
    with ``__seq`` (if present) leading the struct so it acts as
    latest-by-sequence; without ``__seq`` the struct order itself is the
    deterministic tiebreak. (An independent per-column max would
    fabricate rows combining fields from different inputs.)
    """
    from openeo_processes_dask_spark.sources.manifest import (
        create_table,
        read_manifest,
        upsert_rows,
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        val_cols = [c for c in batch_df.columns if c not in key_cols]
        ordered = sorted(val_cols, key=lambda c: c != "__seq")
        one = (
            batch_df.groupBy(*key_cols)
            .agg(
                F.max(F.struct(*ordered)).alias("__row")
            )
            .select(*key_cols, *[F.col(f"__row.{c}").alias(c) for c in ordered])
            .select(*key_cols, *val_cols)
        )
        try:
            read_manifest(spark, table_dir)
        except FileNotFoundError:
            create_table(one, table_dir)
            return
        upsert_rows(spark, table_dir, one, key_cols)

    return (
        out.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def snapshot_validity_intervals(
    snapshots: DataFrame, on: str = "t", by=None
) -> DataFrame:
    """Batch prep for the streaming as-of join: turn a snapshot/history
    table into validity intervals — one row per (by, on) with
    ``[__valid_from__, __valid_to__)`` = [its time, the key's next
    snapshot time), the last snapshot per key open-ended (NULL).

    The interval form converts "latest snapshot <= event time" (an
    ordered search) into plain interval CONTAINMENT, which a stateless
    stream-static join can evaluate. Duplicate (by, on) snapshot rows
    collapse to the max payload struct — the same deterministic rule as
    the batch ``asof_join``. With ``by=None`` the ordering window is
    global (single-task sort) — only for snapshot tables you would
    happily sort on one core."""
    from pyspark.sql import Window

    by = [by] if isinstance(by, str) else list(by or [])
    payload = [c for c in snapshots.columns if c != on and c not in by]
    # NULL-time snapshots can never be "latest <= event time" — drop
    # them up front (same contract as the batch asof_join, ADVICE r10)
    one = snapshots.where(F.col(on).isNotNull()).groupBy(*by, on).agg(
        F.max(F.struct(*[F.col(c) for c in payload])).alias("__pp__")
    )
    w = Window.partitionBy(*by).orderBy(on)
    return one.withColumn("__valid_to__", F.lead(on).over(w)).select(
        *by,
        F.col(on).alias("__valid_from__"),
        "__valid_to__",
        *[F.col("__pp__")[c].alias(c) for c in payload],
    )


def stream_asof_against(
    stream: DataFrame,
    snapshots: DataFrame,
    on: str = "t",
    by=None,
    right_prefix: str = "right_",
    how: str = "inner",
) -> DataFrame:
    """Streaming twin of ``asof_join(direction='backward')`` against a
    STATIC snapshot table: every streamed row is matched to the latest
    snapshot of its key at or before its event time — the classic
    event-enrichment join (price marks, feature snapshots, config
    versions) running inside a micro-batch pipeline.

    Plan shape at scale: the snapshot side is precomputed into validity
    intervals (:func:`snapshot_validity_intervals`, batch, once per
    table version) and the stream joins it STATELESSLY — an equi-join
    on the by-keys with interval containment as a residual predicate,
    so Spark broadcasts the static side when small and keeps NO
    watermark state (an ordered as-of window would be impossible on a
    stream; interval containment is the standard rewrite). Exactly one
    interval matches per key (intervals partition the key's timeline),
    so no post-join dedup is needed. ``how='left'`` keeps unmatched
    streamed rows with NULL snapshot columns."""
    if how not in ("inner", "left"):
        raise ValueError(f"stream_asof_against: unsupported how={how!r}")
    by = [by] if isinstance(by, str) else list(by or [])
    if not by:
        raise ValueError(
            "stream_asof_against requires by-keys: a keyless as-of has "
            "one global timeline, which is not meaningfully streamable"
        )
    iv = snapshot_validity_intervals(snapshots, on, by).alias("__iv__")
    s = stream.alias("__s__")
    cond = None
    for k in by:
        term = F.col(f"__s__.{k}") == F.col(f"__iv__.{k}")
        cond = term if cond is None else (cond & term)
    cond = (
        cond
        & (F.col(f"__s__.{on}") >= F.col("__iv__.__valid_from__"))
        & (
            F.col("__iv__.__valid_to__").isNull()
            | (F.col(f"__s__.{on}") < F.col("__iv__.__valid_to__"))
        )
    )
    joined = s.join(iv, cond, "left_outer" if how == "left" else "inner")
    payload = [
        c
        for c in snapshots.columns
        if c != on and c not in by
    ]
    return joined.select(
        *[F.col(f"__s__.{c}") for c in stream.columns],
        F.col("__iv__.__valid_from__").alias(f"{right_prefix}{on}"),
        *[
            F.col(f"__iv__.{c}").alias(f"{right_prefix}{c}")
            for c in payload
        ],
    )

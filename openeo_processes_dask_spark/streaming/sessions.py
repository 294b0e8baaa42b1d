"""Custom stateful streaming: event sessionization via
``applyInPandasWithState`` — the "custom stateful operator" lane of the
brief (the reference has no streaming at all, SURVEY.md §2.14).

A session = a run of events per user with gaps < ``gap_seconds``. State per
user holds the open session; an event-time timeout (watermark-driven)
closes and emits it. This is the canonical shape for any custom stateful
cube operator (running phenology, change detection): keyed state + event
-time timeout, pandas in, pandas out.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("value_sum", DoubleType()),
    ]
)

SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", IntegerType()),
        StructField("vsum", DoubleType()),
    ]
)


def sessionize(
    events: DataFrame,
    gap_seconds: int = 3600,
    watermark: str = "1 hour",
) -> DataFrame:
    """events (user_id, t, value, ...) → closed sessions.

    State machine per user: extend the open session while each event lands
    within ``gap_seconds`` of its end; otherwise emit the closed session and
    open a new one. The event-time timeout flushes sessions once the
    watermark passes their gap horizon — bounded state. Late events are
    NOT filtered by Spark before an applyInPandasWithState function
    (measured: numRowsDroppedByWatermark stays 0 and the straggler
    reaches update()), and this state machine assumes event-time order —
    an 18-day-old straggler would otherwise fold into whatever session
    is currently open. update() therefore drops rows below the current
    watermark explicitly (GroupState.getCurrentWatermarkMs).
    """
    gap_us = gap_seconds * 1_000_000

    def update(
        key: Tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n, v = state.get
                closed.append((user_id, s, e, n, v))
                state.remove()
        else:
            rows = pd.concat(list(pdfs)).sort_values("t")
            # explicit late-data gate: Spark does not pre-filter rows
            # below the watermark for stateful UDFs (see class docstring)
            wm_ms = state.getCurrentWatermarkMs()
            if wm_ms > 0:
                unit = rows["t"].dtype.str
                div = 1_000_000 if unit.endswith("[ns]") else 1_000
                rows = rows[rows["t"].astype("int64") // div >= wm_ms]
            if rows.empty:
                # nothing admissible this batch: leave state (and its
                # armed timeout) untouched
                return
            ts_us = rows["t"].astype("int64")  # ns -> handled below
            # pandas datetime64[us/ns] → microseconds
            unit_div = 1000 if rows["t"].dtype.str.endswith("[ns]") else 1
            if state.exists:
                s, e, n, v = state.get
            else:
                s = e = None
                n, v = 0, 0.0
            for t_raw, val in zip(ts_us, rows["value"].fillna(0.0)):
                t_us = int(t_raw) // unit_div
                if s is None:
                    s, e, n, v = t_us, t_us, 1, float(val)
                elif t_us - e <= gap_us:
                    e, n, v = max(e, t_us), n + 1, v + float(val)
                else:
                    closed.append((user_id, s, e, n, v))
                    s, e, n, v = t_us, t_us, 1, float(val)
            state.update((s, e, n, v))
            state.setTimeoutTimestamp((e + gap_us) // 1000)  # millis
        if closed:
            out = pd.DataFrame(
                closed,
                columns=["user_id", "start_us", "end_us", "n_events", "value_sum"],
            )
            yield pd.DataFrame(
                {
                    "user_id": out.user_id,
                    "session_start": pd.to_datetime(out.start_us, unit="us"),
                    "session_end": pd.to_datetime(out.end_us, unit="us"),
                    "n_events": out.n_events.astype("int32"),
                    "value_sum": out.value_sum,
                }
            )

    return (
        events.withWatermark("t", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


CAP_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("t", TimestampType()),
        StructField("value", DoubleType()),
        StructField("rank", IntegerType()),
    ]
)

CAP_STATE = StructType([StructField("n", LongType())])


def stream_cap_per_key(
    events: DataFrame,
    k: int,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming per-key quota: emit at most ``k`` events per user over the
    stream's lifetime (the batch lane's ``sampling.cap_per_group``, made
    incremental — dataset quotas enforced while ingesting, not in a
    post-pass).

    State per key is ONE integer (events admitted so far): bounded by the
    number of distinct keys, independent of stream length. Within a
    micro-batch, rows are admitted in (t, event_id) order so a single-batch
    replay is deterministic (`rank` = admission order, 1-based); across
    batches admission follows arrival order, as any online quota must.

    Output: (user_id, event_id, t, value, rank) for admitted events only.
    """

    def update(
        key: Tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            state.remove()
            return
        rows = pd.concat(list(pdfs)).sort_values(["t", "event_id"])
        n = state.get[0] if state.exists else 0
        take = rows.iloc[: max(0, k - n)]
        state.update((n + len(take),))
        if len(take):
            yield pd.DataFrame(
                {
                    "user_id": take["user_id"].astype("int64"),
                    "event_id": take["event_id"].astype("int64"),
                    "t": take["t"],
                    "value": take["value"].astype("float64"),
                    "rank": (
                        n + pd.RangeIndex(1, len(take) + 1)
                    ).astype("int32"),
                }
            )

    return (
        events.withWatermark("t", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=CAP_OUTPUT,
            stateStructType=CAP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


RESERVOIR_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
    ]
)

RESERVOIR_STATE = StructType(
    [
        StructField("keys", ArrayType(DoubleType())),
        StructField("ids", ArrayType(LongType())),
    ]
)


def stream_weighted_reservoir(
    events: DataFrame,
    k: int,
    seed: int = 42,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exactly-k weighted reservoir per user (the online twin of
    ``sampling.sample_weighted_fixed``): Efraimidis-Spirakis A-ES over the
    stream — each event's priority is ln(u)/w with u the seeded
    md5-uniform of event_id and w = ``value`` clamped positive; state per
    key is the current top-k (priority, event_id) pair list, bounded by k
    regardless of stream length.

    Because the priority is a pure row function, draining the whole
    stream yields EXACTLY the batch sample (same formula, same
    tie-break) — pinned by the gate's batch-SQL oracle. Emission is
    append-mode: a micro-batch emits the events it newly admitted into
    the reservoir; an admitted event later evicted by a higher-priority
    arrival was already emitted — the same online-admission caveat as
    ``stream_cap_per_key``, gone when a trigger covers the stream (the
    deterministic single-batch gate setup)."""
    import hashlib
    import math

    span = float(1 << 60)

    def _priority(event_id: int, weight) -> float:
        digest = hashlib.md5(f"{seed}-{event_id}".encode()).hexdigest()
        u = max(int(digest[:15], 16) / span, 1e-18)
        w = 1e-12
        if weight is not None and not pd.isna(weight):
            w = max(float(weight), 1e-12)
        return math.log(u) / w

    def update(
        key: Tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            state.remove()
            return
        rows = pd.concat(list(pdfs))
        pool = {
            int(i): _priority(int(i), v)
            for i, v in zip(rows["event_id"], rows["value"])
        }
        prev_ids: set = set()
        if state.exists:
            keys, ids = state.get
            prev_ids = {int(i) for i in ids}
            for kk, ii in zip(keys, ids):
                pool.setdefault(int(ii), float(kk))
        # top-k by (priority desc, event_id asc) — the batch tie-break
        kept = sorted(pool.items(), key=lambda t: (-t[1], t[0]))[: int(k)]
        state.update(
            ([float(p) for _, p in kept], [int(i) for i, _ in kept])
        )
        admitted = sorted(i for i, _ in kept if i not in prev_ids)
        if admitted:
            yield pd.DataFrame(
                {
                    "user_id": pd.Series(
                        [user_id] * len(admitted), dtype="int64"
                    ),
                    "event_id": pd.Series(admitted, dtype="int64"),
                }
            )

    return (
        events.withWatermark("t", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RESERVOIR_OUTPUT,
            stateStructType=RESERVOIR_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


ANOM_OUTPUT = StructType(
    [
        StructField("band", StringType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("zscore", DoubleType()),
    ]
)

ANOM_STATE = StructType(
    [StructField("hist", ArrayType(DoubleType()))]
)


def stream_anomaly(
    events: DataFrame,
    window: int = 20,
    threshold: float = 2.5,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of ``training.anomaly.anomalies``: each event is
    z-scored against the trailing ``window`` same-band values ONLINE and
    emitted immediately when |z| exceeds ``threshold`` — drift alarms
    while ingesting, not in a post-pass.

    State per band is the last ``window`` values (a fixed-size array —
    bounded by #bands x window, independent of stream length). Within a
    micro-batch rows process in (t, event_id) order, so a single-batch
    drain replays the batch operator exactly (the gate's oracle); across
    batches the history follows arrival order, as any online detector
    must. Unscorable points (short or constant history) score NULL and
    never alert — same rule as the batch lane.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")

    def update(
        key: Tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (band,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            state.remove()
            return
        rows = pd.concat(list(pdfs)).sort_values(["t", "event_id"])
        hist = list(state.get[0]) if state.exists else []
        out = []
        for eid, val in zip(
            rows["event_id"].astype("int64"), rows["value"].astype("float64")
        ):
            v = float(val)
            if len(hist) >= 2:
                m = sum(hist) / len(hist)
                var = sum((x - m) ** 2 for x in hist) / (len(hist) - 1)
                if var > 0:
                    z = (v - m) / var**0.5
                    if abs(z) > threshold:
                        out.append((band, int(eid), v, z))
            hist.append(v)
            if len(hist) > window:
                hist = hist[-window:]
        state.update((hist,))
        if out:
            yield pd.DataFrame(
                out, columns=["band", "event_id", "value", "zscore"]
            )

    return (
        events.withWatermark("t", watermark)
        .groupBy("band")
        .applyInPandasWithState(
            update,
            outputStructType=ANOM_OUTPUT,
            stateStructType=ANOM_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EMA_OUTPUT = StructType(
    [
        StructField("k", LongType()),
        StructField("event_id", LongType()),
        StructField("ema_micro", LongType()),
    ]
)

EMA_STATE = StructType([StructField("prev", LongType())])


def stream_ema(
    events: DataFrame,
    alpha_num: int = 2,
    alpha_den: int = 10,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of ``training.anomaly.ema``: the integer
    micro-unit EMA recurrence applied ONLINE per key — live smoothed
    telemetry while ingesting instead of a post-pass.

    Input columns: ``k`` (int64 key), ``event_id`` (int64 tie-break),
    ``t`` (timestamp), ``value`` (non-negative double). State per key is
    ONE int64 (the running EMA in micro-units) — constant per key,
    independent of stream length; contrast the window detector's
    last-N-array. Within a micro-batch rows process in (t, event_id)
    order, so a single sorted-batch drain replays the batch operator row
    for row (pinned by test); across batches history follows arrival
    order, as any online smoother must.
    """
    if not 0 < alpha_num <= alpha_den:
        raise ValueError(
            f"need 0 < alpha_num <= alpha_den, got {alpha_num}/{alpha_den}"
        )
    rest = alpha_den - alpha_num

    def update(
        key: Tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            state.remove()
            return
        rows = pd.concat(list(pdfs)).sort_values(["t", "event_id"])
        prev = int(state.get[0]) if state.exists else None
        out = []
        for eid, val in zip(
            rows["event_id"].astype("int64"), rows["value"].astype("float64")
        ):
            v = float(val)
            if v < 0:
                raise ValueError("stream_ema requires non-negative values")
            # half-up snap — mirrors the batch lane's F.round (Python's
            # built-in round banker's-rounds and would diverge on .5)
            vm = int(v * 1_000_000.0 + 0.5)
            prev = vm if prev is None else (alpha_num * vm + rest * prev) // alpha_den
            out.append((int(k), int(eid), prev))
        state.update((prev,))
        if out:
            yield pd.DataFrame(out, columns=["k", "event_id", "ema_micro"])

    return (
        events.withWatermark("t", watermark)
        .groupBy("k")
        .applyInPandasWithState(
            update,
            outputStructType=EMA_OUTPUT,
            stateStructType=EMA_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


FUNNEL_OUTPUT = StructType(
    [
        StructField("k", LongType()),
        StructField("step", IntegerType()),
        StructField("t", TimestampType()),
    ]
)

FUNNEL_STATE = StructType(
    [StructField("next_idx", IntegerType()), StructField("last_t", TimestampType())]
)


def stream_funnel(
    events: DataFrame,
    steps: list[str],
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of ``training.funnel.funnel``: per-user funnel
    progress tracked ONLINE — a row ``(k, step, t)`` is emitted the
    moment user ``k`` reaches step number ``step`` (1-based), so a live
    dashboard sees conversions as they happen instead of in a post-pass.

    Input columns: ``k`` (int64 user key), ``event_id`` (tie-break),
    ``t`` (timestamp), ``event`` (event-type string). State per key is
    (next step index, timestamp of the last bound step) — two scalars,
    constant regardless of stream length. Greedy earliest-match,
    strict-after semantics identical to the batch operator: a
    single sorted-batch drain aggregated to max(step) per user equals
    the batch ``steps_completed`` row for row (pinned by test).
    """
    if len(steps) < 2:
        raise ValueError(f"need at least 2 steps, got {len(steps)}")

    def update(
        key: Tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            state.remove()
            return
        rows = pd.concat(list(pdfs)).sort_values(["t", "event_id"])
        if state.exists:
            next_idx, last_t = state.get
            last_t = pd.Timestamp(last_t) if last_t is not None else None
        else:
            next_idx, last_t = 0, None
        out = []
        for t, ev in zip(rows["t"], rows["event"]):
            if next_idx >= len(steps):
                break
            if ev == steps[next_idx] and (
                next_idx == 0 or (last_t is not None and t > last_t)
            ):
                last_t = t
                next_idx += 1
                out.append((int(k), next_idx, t))
        state.update((int(next_idx), last_t.to_pydatetime() if last_t is not None else None))
        if out:
            yield pd.DataFrame(out, columns=["k", "step", "t"])

    return (
        events.withWatermark("t", watermark)
        .groupBy("k")
        .applyInPandasWithState(
            update,
            outputStructType=FUNNEL_OUTPUT,
            stateStructType=FUNNEL_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


FF_OUTPUT = StructType(
    [
        StructField("k", LongType()),
        StructField("event_id", LongType()),
        StructField("t", TimestampType()),
        StructField("value", DoubleType()),
        StructField("filled", BooleanType()),
    ]
)

FF_STATE = StructType(
    [
        StructField("last_t", TimestampType()),
        StructField("last_v", DoubleType()),
    ]
)


def stream_fill_forward(
    events: DataFrame,
    max_gap: float | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of ``operators.interval.fill_forward``: per-key
    LOCF gap fill applied ONLINE — a NULL reading is patched with the
    key's most recent non-NULL value at arrival time, instead of in a
    post-pass over the landed table. The missing stateful member of the
    as-of family (``stream_asof_against`` joins a stream to STATIC
    validity intervals; this carries state WITHIN the live stream).

    Input columns: ``k`` (int64 key), ``event_id`` (int64 tie-break),
    ``t`` (timestamp — must be non-NULL; the watermark needs it),
    ``value`` (double, NULL = gap). Output adds ``filled`` (this row's
    value was carried, not observed). State per key is ONE
    (last_t, last_v) pair — constant, independent of stream length.

    ``max_gap`` (seconds) bounds staleness exactly like the batch
    operator: a carried observation older than ``max_gap`` relative to
    the gap row's own ``t`` is NOT used — the row stays NULL (but the
    stale observation remains state: a later non-NULL resets it, and
    max_gap is measured per row, matching the batch (time, value)
    struct rule for a single column).

    Within a micro-batch rows process in (t, event_id) order, so a
    single sorted-batch drain replays the batch ``fill_forward`` row
    for row (pinned by test); across batches history follows arrival
    order, as any online filler must.
    """
    gap_ns = None if max_gap is None else int(float(max_gap) * 1e9)
    if gap_ns is not None and gap_ns < 0:
        raise ValueError(f"max_gap must be >= 0, got {max_gap}")

    def update(
        key: Tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            state.remove()
            return
        rows = pd.concat(list(pdfs)).sort_values(["t", "event_id"])
        if rows["t"].isna().any():
            raise ValueError(
                "stream_fill_forward requires non-NULL event time"
            )
        last_t, last_v = state.get if state.exists else (None, None)
        out = []
        for eid, t, v in zip(
            rows["event_id"].astype("int64"), rows["t"], rows["value"]
        ):
            if pd.isna(v):
                # the ordering guard applies whether or not max_gap is
                # set (ADVICE r11 #1): a cross-batch late row whose t
                # precedes the carried state must NOT be filled from
                # that FUTURE observation — that would be backward
                # fill, not LOCF — so both modes leave it NULL.
                usable = (
                    last_t is not None
                    and (t - last_t).value >= 0
                    and (gap_ns is None or (t - last_t).value <= gap_ns)
                )
                out.append(
                    (int(k), int(eid), t, float(last_v), True)
                    if usable
                    else (int(k), int(eid), t, None, False)
                )
            else:
                last_t, last_v = t, float(v)
                out.append((int(k), int(eid), t, last_v, False))
        if last_t is not None:
            state.update((last_t, last_v))
        if out:
            yield pd.DataFrame(
                out, columns=["k", "event_id", "t", "value", "filled"]
            )

    return (
        events.withWatermark("t", watermark)
        .groupBy("k")
        .applyInPandasWithState(
            update,
            outputStructType=FF_OUTPUT,
            stateStructType=FF_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

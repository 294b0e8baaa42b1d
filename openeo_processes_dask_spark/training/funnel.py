"""Ordered-event funnel analysis over the events table.

The conversion question every event pipeline asks: of the users who did
step 1, how many went on to do step 2 AFTER it, then step 3 after that?
Greedy earliest-match semantics (the industry-standard funnel): each
step binds to the EARLIEST qualifying event strictly after the previous
step's bound event. No reference counterpart (LLM/event-pipeline lane).

Determinism: each step is a min-timestamp aggregate — order-independent
— and strict ``>`` comparisons leave no tie ambiguity, so the result is
bit-identical under any partitioning and replayed exactly by a chained
CTE oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel progress through ``steps`` (ordered event types).

    Returns one row per user who completed at least step 1:
    ``(user, steps_completed, t1, ..., tK)`` where ``tk`` is the bound
    timestamp of step k (NULL once the funnel broke) and
    ``steps_completed`` counts the non-NULL prefix.

    Plan at 100 TB: K-1 joins of the (user, t_{k-1}) relation back into
    the single-step event scan, each followed by ONE min aggregate keyed
    by user — the per-step relations shrink monotonically (funnel!), so
    later joins are cheaper, and each is an equi-join on the user key
    with a pushed-down event-type filter on the scan side. No windows
    over the full event stream, no per-user collect.
    """
    if len(steps) < 2:
        raise ValueError(f"need at least 2 steps, got {len(steps)}")
    u = F.col(user_col)
    cur = (
        df.where(F.col(event_col) == steps[0])
        .groupBy(u.alias("user"))
        .agg(F.min(ts_col).alias("t1"))
    )
    out = cur
    for k, s in enumerate(steps[1:], start=2):
        ev = df.where(F.col(event_col) == s).select(
            u.alias("user"), F.col(ts_col).alias("__ts")
        )
        nxt = (
            ev.join(cur.select("user", F.col(f"t{k - 1}")), "user")
            .where(F.col("__ts") > F.col(f"t{k - 1}"))
            .groupBy("user")
            .agg(F.min("__ts").alias(f"t{k}"))
        )
        out = out.join(nxt, "user", "left")
        cur = nxt
    completed = F.lit(1)
    for k in range(2, len(steps) + 1):
        completed = completed + F.col(f"t{k}").isNotNull().cast("int")
    return out.select(
        F.col("user").alias(user_col),
        completed.alias("steps_completed"),
        *[F.col(f"t{k}") for k in range(1, len(steps) + 1)],
    )

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


def retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention — the companion report to :func:`funnel`:
    users are cohorted by the ISO week of their FIRST event, and each
    (cohort, offset) cell counts the cohort members active again
    ``offset`` weeks later (offset 0 = cohort size).

    Returns ``(cohort_week, week_offset, n_users)`` — exact distinct
    counts, so the compare is zero-tolerance.

    Plan at 100 TB: distinct (user, week) actives first — ONE hash
    aggregate that collapses the raw event volume to at most
    users × weeks — then the user-keyed join against the user-sized
    cohort relation and one counting aggregate. Events never shuffle
    raw; both big relations are keyed by user.
    """
    wk = F.date_trunc("week", F.col(ts_col))
    actives = (
        df.select(F.col(user_col).alias("user"), wk.alias("week"))
        .distinct()
    )
    cohorts = actives.groupBy("user").agg(F.min("week").alias("cohort_week"))
    return (
        actives.join(cohorts, "user")
        .select(
            "cohort_week",
            (
                F.datediff(F.col("week"), F.col("cohort_week"))
                / F.lit(7)
            ).cast("int").alias("week_offset"),
            "user",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(F.col("user")).alias("n_users"))
    )


def top_paths(
    df: DataFrame,
    k: int = 20,
    prefix_len: int = 5,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Most common event-type paths — the third leg of the event trio
    (funnel = one prescribed path, retention = return visits, this =
    which paths actually happen): each user's first ``prefix_len``
    events in (ts, tiebreak) order become a '>'-joined path string, and
    the ``k`` most frequent paths win (ties: path ASC).

    Returns ``(rank, path, n_users)``.

    Plan at 100 TB: row_number per user keyed once, the ``rn <=
    prefix_len`` filter compiles to WindowGroupLimit (per-partition
    heaps forward at most prefix_len rows per user), one path aggregate
    per user, one counting aggregate per path, and the global top-k is
    TakeOrderedAndProject. Raw events shuffle once, on the user key.
    """
    if k < 1 or prefix_len < 1:
        raise ValueError(f"k and prefix_len must be >= 1, got {k}, {prefix_len}")
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    first_n = df.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= prefix_len
    )
    paths = first_n.groupBy(F.col(user_col).alias("user")).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("__rn"), F.col(event_col)))
                ),
                lambda s: s[event_col],
            ),
            ">",
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    topk = counts.orderBy(F.col("n_users").desc(), F.col("path")).limit(k)
    rank_w = Window.orderBy(F.col("n_users").desc(), F.col("path"))
    return topk.withColumn("rank", F.row_number().over(rank_w)).select(
        "rank", "path", "n_users"
    )

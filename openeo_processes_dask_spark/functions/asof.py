"""Bounded nearest-label (as-of) merge shared by the resample family.

The resample operators align one cube's dimension labels onto another's
by NEAREST label (reference: cubes/resample.py:116-180,183-222 — xarray
``reindex(method="nearest")`` / ``sel(method="nearest")``). Until r9 the
mapping was built as ``src_labels.crossJoin(tgt_labels)`` → ``min_by``,
which Spark compiles to a BroadcastNestedLoopJoin — O(|src| × |tgt|)
comparisons. Fine for raster axes (10³–10⁴ labels), quadratic blow-up on
event-grade temporal axes (10⁶ distinct timestamps ⇒ 10¹² pairs); it was
the last BNLJ over two unbounded relations in the registry (VERDICT r9
what's-wrong #1).

This module replaces it with the classic bucketed merge, O(m + n) work
and fully distributed:

1. One 2-number aggregate probes the joint ``[lo, hi]`` value range.
2. Both distinct-label relations are hashed into range buckets (the
   SAME monotone ``floor((v - lo) / width)`` on both sides, so bucket
   order respects value order exactly). The bucket count adapts to the
   probed label cardinality (target ~256 labels/bucket, floor 4096,
   ceiling ~4.2M) so per-bucket pair work stays bounded even on 10⁸+
   label axes where a fixed spine would let quadratic work regrow.
3. Candidates for each left label are (a) every right label in its own
   bucket — a plain shuffled equi-join on the bucket id, never all
   pairs — plus (b) the largest right label in any EARLIER bucket and
   the smallest right label in any LATER bucket, read off a
   ``spark.range(N_BUCKETS)`` spine carrying running prev-max / next-min
   fills. The true nearest is always among these: it is either the
   largest right ≤ v (in-bucket, else exactly the prev fill) or the
   smallest right ≥ v (in-bucket, else exactly the next fill).
4. ``min(struct(dist, label))`` per left label — deterministic
   tie-break on the smaller right label, matching the old ``min_by``.

The only ordered-without-partition window runs over the bucket spine,
which is ``spark.range(n_buckets)`` — bounded by construction at ≤
``_MAX_BUCKETS`` (~4.2M) metadata-sized rows regardless of data size
(the plan-canary allowlist cites this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: default bucket-spine size: small enough that the spine windows are
#: metadata-sized, large enough that in-bucket candidate joins stay
#: near-linear (1e6 uniform labels -> ~244/bucket -> ~6e4 pairs/bucket)
N_BUCKETS = 4096

#: adaptive sizing: target mean labels-per-bucket (keeps per-bucket
#: pair work ~TARGET^2), and a spine ceiling so the prefix windows stay
#: a trivial single task even for absurd axes (1e9 labels -> 4M-row
#: spine, still KB-scale per row)
_TARGET_PER_BUCKET = 256
_MAX_BUCKETS = 4_194_304


def nearest_label_map(
    left: DataFrame, right: DataFrame, n_buckets: int | None = None
) -> DataFrame:
    """For each distinct left label, the nearest distinct right label.

    ``left`` must have columns ``(__l__, __lv__)`` and ``right``
    ``(__r__, __rv__)`` — the label itself plus its numeric sort value
    (identical for numeric axes; ``unix_micros`` for temporal ones),
    each relation distinct on the label. Returns
    ``(__l__, __r__, __dist__)`` with ``__dist__ = |__lv__ - __rv__|``
    and ties broken toward the smaller ``(__rv__, __r__)``, one row per
    left label that has a non-NULL sort value (NULL labels cannot be
    distance-compared and are dropped, as the join-on-label consumers
    would drop them anyway).
    """
    spark = left.sparkSession
    stats = (
        left.select(F.col("__lv__").cast("double").alias("v"))
        .unionAll(right.select(F.col("__rv__").cast("double").alias("v")))
        .agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.approx_count_distinct("v").alias("n"),
            # outlier-robust bucket range (ADVICE r10): equi-width over
            # the raw [min, max] is skew-sensitive — ONE far outlier
            # stretches the range until every real label lands in a
            # single bucket and the in-bucket equi-join regrows the
            # quadratic this module exists to kill. Bucketing over the
            # [p0.1%, p99.9%] span instead keeps the interior spread
            # intact; the clamp below folds outliers into the two edge
            # buckets (correctness is range-independent — the bucket
            # map only has to be monotone). Rides the same single-job
            # probe aggregate. Residual assumption, documented: the
            # INTERIOR distribution is roughly uniform; a heavily
            # clustered interior (e.g. log-spaced labels) still
            # concentrates buckets — per-bucket work degrades
            # gracefully (denser candidate join), never to all-pairs.
            F.percentile_approx("v", [0.001, 0.999], 10_000).alias("pp"),
        )
        .collect()[0]
    )
    if n_buckets is None:
        # size the spine so mean bucket occupancy ~_TARGET_PER_BUCKET:
        # a FIXED spine re-grows quadratic per-bucket work once labels
        # outnumber buckets*target (1e8 labels on 4096 buckets = 2e4
        # per bucket = 4e8 pairs per bucket). The estimate rides the
        # same 1-row aggregate as the range probe — no extra job.
        est = int(stats["n"] or 0)
        n_buckets = max(
            N_BUCKETS, min(_MAX_BUCKETS, est // _TARGET_PER_BUCKET)
        )
    lo = float(stats["lo"]) if stats["lo"] is not None else 0.0
    hi = float(stats["hi"]) if stats["hi"] is not None else 0.0
    pp = stats["pp"]
    if pp is not None and pp[0] is not None and pp[1] > pp[0]:
        lo, hi = float(pp[0]), float(pp[1])
    width = (hi - lo) / n_buckets
    if not width > 0.0:  # all labels equal (or a side is empty)
        width = 1.0

    def bucket(v):
        b = F.floor((v.cast("double") - F.lit(lo)) / F.lit(width))
        return F.least(
            F.greatest(b, F.lit(0)), F.lit(n_buckets - 1)
        ).cast("int")

    rb = right.withColumn("__b__", bucket(F.col("__rv__")))
    lb = left.withColumn("__b__", bucket(F.col("__lv__"))).where(
        F.col("__lv__").isNotNull()
    )

    # per-bucket extremes; struct min/max = (value, label) lexicographic,
    # so ties on the sort value resolve by label, deterministically
    per_bucket = rb.where(F.col("__rv__").isNotNull()).groupBy("__b__").agg(
        F.max(F.struct("__rv__", "__r__")).alias("mx"),
        F.min(F.struct("__rv__", "__r__")).alias("mn"),
    )
    spine = (
        spark.range(n_buckets)
        .select(F.col("id").cast("int").alias("__b__"))
        .join(per_bucket, "__b__", "left")
    )
    # EXCLUSIVE fills: own-bucket rights arrive via the equi-join below.
    # The window is ordered without a partition by design — the spine is
    # spark.range(n_buckets), bounded at <=_MAX_BUCKETS tiny rows by
    # construction.
    w_prev = Window.orderBy("__b__").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_next = Window.orderBy("__b__").rowsBetween(
        1, Window.unboundedFollowing
    )
    spine = spine.select(
        "__b__",
        F.last("mx", ignorenulls=True).over(w_prev).alias("__prev__"),
        F.first("mn", ignorenulls=True).over(w_next).alias("__next__"),
    )

    in_bucket = lb.join(rb, "__b__").select(
        "__l__", "__lv__", "__r__", "__rv__"
    )
    # force the broadcast only while the spine is trivially small (64k
    # rows of two structs is a few MB even with string/timestamp
    # labels); above that AQE decides from the RUNTIME size — a forced
    # 1M-row broadcast of wide label structs could pressure a
    # memory-constrained driver (ADVICE r10)
    spine_side = F.broadcast(spine) if n_buckets <= 65_536 else spine
    side = (
        lb.join(spine_side, "__b__")
        .select(
            "__l__",
            "__lv__",
            F.explode(F.array("__prev__", "__next__")).alias("__c__"),
        )
        .where(F.col("__c__").isNotNull())
        .select(
            "__l__",
            "__lv__",
            F.col("__c__.__r__").alias("__r__"),
            F.col("__c__.__rv__").alias("__rv__"),
        )
    )
    cand = in_bucket.unionByName(side).withColumn(
        "__dist__", F.abs(F.col("__lv__") - F.col("__rv__"))
    )
    best = cand.groupBy("__l__").agg(
        F.min(F.struct("__dist__", "__rv__", "__r__")).alias("__best__")
    )
    return best.select(
        "__l__",
        F.col("__best__.__r__").alias("__r__"),
        F.col("__best__.__dist__").alias("__dist__"),
    )

"""Distributed probabilistic sketches with DETERMINISTIC, engine-portable
hashing (md5-derived, like every dedup lane) — so the same sketch built on
any engine, any partitioning, is bit-identical, and a DuckDB oracle can
replay it exactly. No reference counterpart (the reference is a raster
operator library).

Sketches are the only honest answer at 100 TB for "how often does every
key occur" / "how many distinct keys" style questions when the key space
itself is too big to materialize: a Count-Min table is d*w integers and a
HyperLogLog is 2^p bytes REGARDLESS of input size, both built in one scan
with one tiny aggregate, both mergeable across partitions/days/shards by
construction (entrywise +/max).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, row: int, width: int) -> Column:
    """Row-``row`` bucket of ``key``: first 15 hex digits of
    md5(row-key) mod width — identical in DuckDB, so sketches replay."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}-"), key)), 1, 15), 16, 10
    ).cast("long")
    return (h % F.lit(width)).cast("int")


def count_min_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the Count-Min table: (row, bucket, cnt) with
    cnt = total weight of keys hashing to that (row, bucket).

    One scan + one hash aggregate over depth*width cells; the table is
    mergeable across any split of the input by entrywise addition (sums
    commute). Estimate of a key's count = min over rows of its bucket's
    cnt — an OVERestimate, never under (property-tested)."""
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    key = F.col(key_col).cast("string")
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(key, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
        w.alias("w"),
    )
    return (
        rows.select("rb.row", "rb.bucket", "w")
        .groupBy("row", "bucket")
        .agg(F.sum("w").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str = "key",
    depth: int = 4, width: int = 256,
) -> DataFrame:
    """(key, est) for every probe key: min over the ``depth`` bucket
    counters. The probe relation is tiny (it is a list of keys someone
    asks about), so the join broadcasts; the sketch is depth*width rows."""
    key = F.col(key_col).cast("string")
    pb = probes.select(
        key.alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(key, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("key", "rb.row", "rb.bucket")
    return (
        pb.join(sketch, ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def hyperloglog_registers(
    df: DataFrame, key_col: str, p: int = 10
) -> DataFrame:
    """HyperLogLog register table: (bucket, rho) with bucket = low ``p``
    bits of the md5-derived 60-bit hash and rho = leading-zero count of
    the remaining bits + 1 (capped by the hash width). One scan + one
    max aggregate over <= 2^p rows; mergeable by entrywise max.

    The hash is md5-derived — deterministic and engine-portable, so the
    register TABLE (not just the estimate) is oracle-checkable."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll-"), F.col(key_col).cast("string"))),
                    1, 15),
        16, 10,
    ).cast("long")  # 60-bit non-negative hash
    bits = 60 - p
    bucket = (h % F.lit(1 << p)).cast("int")
    # top 60-p bits via shift — double division would lose precision
    # past 2^53
    rest = F.shiftright(h, p)
    # rho = (60-p) - floor(log2(rest)) for rest>0, else (60-p)+1
    rho = F.when(
        rest > 0,
        F.lit(bits) - F.floor(F.log2(rest.cast("double"))).cast("int"),
    ).otherwise(F.lit(bits + 1)).cast("int")
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hyperloglog_estimate(registers: DataFrame, p: int = 10) -> float:
    """Driver-side HLL estimate from the register table (the table is
    <= 2^p rows — metadata-sized). Standard bias-corrected formula with
    linear counting for the small range."""
    m = 1 << p
    rows = {r["bucket"]: r["rho"] for r in registers.collect()}
    import math

    s = sum(2.0 ** -rows.get(b, 0) for b in range(m))
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m)
    )
    est = alpha * m * m / s
    zeros = m - len(rows)
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return est


def stream_count_min(
    stream: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Streaming Count-Min: the same md5-bucket cells maintained as a
    running streaming aggregate (complete/update mode) — frequency
    monitoring while ingesting. No watermark: the sketch is a LIFETIME
    summary whose state is d*w cells regardless of stream length, so
    unbounded state is exactly the contract (that's what a sketch IS).
    Because cell sums commute, the drained table equals the batch
    :func:`count_min_build` on the same rows — the gate's oracle."""
    key = F.col(key_col).cast("string")
    rows = stream.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(key, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb")
    )
    return (
        rows.select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Entrywise sum of Count-Min tables built with the SAME depth/width
    — the merge that makes per-day/per-shard sketches composable into a
    corpus sketch without touching raw data (sums commute)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def hyperloglog_merge(*registers: DataFrame) -> DataFrame:
    """Entrywise max of HLL register tables built with the SAME p —
    distinct counts compose across arbitrary splits of the data."""
    if not registers:
        raise ValueError("need at least one register table")
    u = registers[0]
    for r in registers[1:]:
        u = u.unionByName(r)
    return u.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hyperloglog_estimate_relational(
    registers: DataFrame, p: int = 10
) -> DataFrame:
    """1-row ``(estimate)`` HLL estimate computed RELATIONALLY — the
    oracle-checkable twin of :func:`hyperloglog_estimate` (which
    collects the register table and computes on the driver).

    Determinism across engines: the harmonic sum ``Σ 2^-rho`` is
    accumulated in EXACT integer micro-units — each register
    contributes ``2^(61-rho)`` (a shifted long, exact), absent buckets
    contribute ``2^61`` each via the zero count — summed in DECIMAL so
    nothing rounds until ONE final float division. Two engines
    computing ``alpha·m²·2^61 / S`` from the same integer ``S`` agree
    bit-for-bit; only the linear-counting branch's ``ln`` is a float
    intrinsic (rounded to 6 decimals like every float lane)."""
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m)
    )
    num = float(alpha) * m * m * float(1 << 61)
    agg = registers.agg(
        F.count(F.lit(1)).alias("nb"),
        F.coalesce(
            F.sum(F.expr("shiftleft(1L, 61 - rho)").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("s_units"),
    )
    zeros = (F.lit(m) - F.col("nb")).cast("long")
    denom = (
        zeros.cast("decimal(38,0)")
        * F.lit(1 << 61).cast("decimal(38,0)")
        + F.col("s_units")
    ).cast("double")
    raw = F.lit(num) / denom
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= 2.5 * m) & (zeros > 0), lc).otherwise(raw)
    return agg.select(F.round(est, 6).alias("estimate"))


def corpus_overlap(
    a: DataFrame, b: DataFrame, key_col: str, p: int = 10
) -> DataFrame:
    """Estimated overlap between two corpora WITHOUT joining them — the
    crawl-vs-crawl / source-vs-source telemetry a curation pipeline
    watches (an exact answer is `corpus_diff`; this is the
    constant-memory screen that decides whether the exact pass is worth
    running).

    One scan per side builds the two HLL register tables; the union
    sketch is their entrywise max (:func:`hyperloglog_merge` — no data
    touched twice), and inclusion-exclusion gives the intersection:
    ``|A∩B| ≈ est(A) + est(B) − est(A∪B)``, plus the Jaccard estimate.
    Returns ONE row ``(est_a, est_b, est_union, est_intersection,
    jaccard)``, all rounded to 6 decimals; the derived columns are
    computed FROM the rounded estimates so any engine replaying the
    register tables reproduces them exactly. Cost at 100 TB: two scans
    + three ≤2^p-row aggregates; the final assembly is a cross of three
    1-row frames (bounded by construction)."""
    ra = hyperloglog_registers(a, key_col, p)
    rb = hyperloglog_registers(b, key_col, p)
    ru = hyperloglog_merge(ra, rb)
    ea = hyperloglog_estimate_relational(ra, p).select(
        F.col("estimate").alias("est_a")
    )
    eb = hyperloglog_estimate_relational(rb, p).select(
        F.col("estimate").alias("est_b")
    )
    eu = hyperloglog_estimate_relational(ru, p).select(
        F.col("estimate").alias("est_union")
    )
    row = ea.crossJoin(eb).crossJoin(eu)
    inter = F.round(
        F.col("est_a") + F.col("est_b") - F.col("est_union"), 6
    )
    return row.select(
        "est_a",
        "est_b",
        "est_union",
        inter.alias("est_intersection"),
        F.round(inter / F.col("est_union"), 6).alias("jaccard"),
    )

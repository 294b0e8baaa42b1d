"""Plan-audit canary over the WHOLE gate registry (VERDICT r6 #8 / r7
#3 / r8 #4): every query's plans — including plans materialized EAGERLY
inside the gate (localCheckpoint / driver-side PAVA collects), captured
by instrumenting the DataFrame action methods — must contain

- no CartesianProduct (the all-pairs regression class),
- no ORDERED Window without a partition spec over a data-sized relation
  (SCALECHECK probe 12: a global ``row_number``/``lag`` forces an
  Exchange SinglePartition + single-task sort — a hard serial
  bottleneck at corpus scale), and
- no BroadcastNestedLoopJoin except on the audited allowlist (VERDICT
  r9 #2: Spark compiles a broadcast crossJoin to BNLJ, which the old
  canary never grepped for — the resample label×label crossJoin hid
  there, quadratic in distinct axis labels).

Global ordered windows and BNLJs are permitted only on explicit
allowlists of queries where the windowed/broadcast relation is PROVABLY
bounded (top-k output, distinct-of-capped/quantized column, literal or
limit-bounded broadcast side) — each entry carries its bound.
"""

from __future__ import annotations

import os
import re

import pytest

SF_DIR = os.environ.get("CANARY_SF_DIR", "/root/testdata/sf0.001")

#: queries allowed an ordered global window, with the bound that makes
#: the windowed relation metadata-sized (see SCALECHECK probe 12).
#: Anything NOT listed here that grows a global ordered window fails
#: the canary — audit the new site and either partition it or add it
#: here with its bound.
ALLOWED_GLOBAL_WINDOW: dict[str, str] = {
    "vocabulary": "rank over .limit(k) top-k (textanalysis.py:310-311)",
    "bm25_topk": "rank over .limit(k) top-k (textanalysis.py:385-386)",
    "bm25_index_search": "rank over .limit(k) top-k (same helper)",
    "hybrid_rrf": "rank over .limit(k) fused top-k (retrieval.py:176-177)",
    "top_paths": "rank over .limit(k) top paths (funnel.py:158-159)",
    "semdedup": "rank over .limit(k) (gates/training.py:857)",
    "classifier_auc": (
        "cumsum over DISTINCT scores; quantize-first contract "
        "(classifier.py:147-173)"
    ),
    "isotonic": "same distinct-score relation, capped at 65,536 bins",
    "percentile_rank": (
        "cumsum over DISTINCT values; quantize-first contract "
        "(maintenance.py:203)"
    ),
    "range_bounds": "cumsum over DISTINCT values (maintenance.py:151)",
    "incremental_curation": (
        "cumsum over DISTINCT quality scores (same equi-depth helper)"
    ),
    "training_pipeline": (
        "composes the audited vocabulary/range-bounds helpers"
    ),
    # the bucketed nearest-label merge (functions/asof.py): its only
    # global ordered windows run over the spark.range(4096) bucket
    # spine — bounded by construction at N_BUCKETS rows, any data size
    "resample_asof": "asof.py spine windows over the bounded spark.range bucket spine (<=4.2M tiny rows)",
    "resample_asof_window": (
        "asof.py bounded spine windows (valid_within gate)"
    ),
    "resample_cube_spatial_near": (
        "asof.py bounded spine windows, one per axis"
    ),
    "resample_cube_spatial_coarse": (
        "asof.py bounded spine windows, one per axis"
    ),
    "load_stac_resampled": (
        "composes resample_cube_spatial -> same bounded asof.py spine windows"
    ),
}

#: queries allowed a BroadcastNestedLoopJoin, each with the bound that
#: makes the broadcast side metadata-sized (literal table, capped query
#: batch, centroid/interval table, 1-row aggregate) or the output
#: itself the full cross (tap-table mapping whose size IS the result).
#: Anything else growing a BNLJ fails — audit the new site and either
#: turn it into an equi/bucketed join or add it here with its bound.
ALLOWED_BNLJ: dict[str, str] = {
    # per-axis tap tables crossed into the 2-D resample mapping: the
    # output is |X-taps| x |Y-taps| by definition — work = output size,
    # not wasted pairs (resample.py:_resample_convolved). mercator
    # shares the same code path (fires only when AQE broadcasts).
    "resample_bilinear": "tap-table cross; output-sized by definition",
    "resample_cubic": "tap-table cross; output-sized by definition",
    "resample_cubicspline": "tap-table cross; output-sized by definition",
    "resample_lanczos": "tap-table cross; output-sized by definition",
    "resample_gauss": "tap-table cross; output-sized by definition",
    "resample_mercator": "tap-table cross; output-sized by definition",
    # empty-bin / empty-polygon materialization: a LITERAL label or
    # feature-id table crossed with distinct group keys
    "aggregate_temporal_halves": (
        "literal label list x distinct group keys (aggregate.py:167)"
    ),
    "aggregate_spatial_zonal": (
        "literal feature-id table x distinct group keys "
        "(aggregate_spatial.py:150)"
    ),
    # capped query batches / centroid tables broadcast against the corpus
    "cosine_topk_batch": "broadcast(queries) — capped query batch",
    "ann_recall": "broadcast(queries) — capped query batch",
    "ivf_topk": "broadcast(centroids) — k centroids",
    "ivf_index_search": "broadcast(centroids) — k centroids",
    # 1-row aggregate / contract-bounded broadcasts
    "t_closeness": "broadcast(1-row corpus total) (pii.py t_closeness)",
    "percentile_rank": "broadcast(1-row total) (maintenance.py:206)",
    "range_bounds": "broadcast(1-row total)",
    "incremental_curation": "broadcast(1-row total)",
    "temperature_mix": "broadcast(1-row totals) (sampling.py:341,348)",
    "dedup_recall": "broadcast(1-row pair counts) (dedup.py:1620)",
    "cohens_kappa": (
        "cross of the 1-row (n, agree) and 1-row pe_num aggregates "
        "(classifier.py cohens_kappa) — bounded by construction"
    ),
    "corpus_overlap": (
        "cross of three 1-row HLL estimate frames (sketches.py "
        "corpus_overlap) — bounded by construction"
    ),
    "negative_samples": (
        "broadcast(md5-filtered candidate ids) non-equi-joined to the "
        "query pairs — pool/pool_mod ids, sized by the caller; Q x C "
        "score rows ARE the algorithm's ranked output "
        "(sampling.py:hash_negatives)"
    ),
    "source_divergence": (
        "non-equi self-join g1 < g2 of the DISTINCT corpus-slice "
        "relation — dashboard-small by documented contract "
        "(textanalysis.py:519-521)"
    ),
    "training_pipeline": "composes the audited helpers above",
    "semantic_dedup_recall": (
        "brute-force truth branch of the recall HARNESS: triangular "
        "self-join of the vec_id<400 capped sample (literal cap in the "
        "gate) + broadcast(1-row pair counts) (dedup.py:1620); the "
        "measured lane (semdedup_pairs) stays an equi-join on cluster"
    ),
    "semantic_dedup_planted": (
        "same harness truth branch over the vec_id<300 capped sample "
        "plus its planted copies (600 rows, literal cap in the gate); "
        "the measured lane stays an equi-join on cluster"
    ),
    "quantile_sketch": (
        "broadcast(1-row level/count metadata) non-equi-filtered "
        "against the tagged scan (sketches.py quantile_sketch) — the "
        "relational level pick (VERDICT r11 #3): Catalyst folds the "
        "constant join key, leaving __lvl__ >= __level__ as a BNLJ "
        "condition over an exactly-1-row build side"
    ),
    "quantile_sketch_merged": (
        "each unioned shard sketch carries the 1-row metadata "
        "broadcast above; bounded by construction"
    ),
    "count_min_by_source": (
        "broadcast cross of the sketch's DISTINCT group keys with the "
        "12-probe x depth bucket list (sketches.py "
        "count_min_estimate_grouped) — groups x 48 metadata rows by "
        "contract; the corpus itself is never crossed"
    ),
}


def _top_level_groups(s: str) -> list[str]:
    groups: list[str] = []
    depth, cur = 0, []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def global_ordered_windows(logical_plan: str) -> list[str]:
    """Lines of ``Window`` nodes that ORDER without partitioning.
    Logical Window prints ``Window [exprs], [partSpec], [orderSpec]``
    — the partition group is omitted entirely when empty, so a 2-group
    node whose second group carries ASC/DESC ordering is global."""
    bad = []
    for line in logical_plan.splitlines():
        m = re.search(r"\bWindow (\[.*)$", line)
        if not m:
            continue
        groups = _top_level_groups(m.group(1))
        ordered = re.search(r"\b(ASC|DESC) NULLS", groups[-1] or "")
        if len(groups) == 2 and ordered:
            bad.append(line.strip())
        elif len(groups) == 3 and not groups[1].strip() and ordered:
            bad.append(line.strip())
    return bad


def _plans_of(df) -> tuple[str, str]:
    qe = df._jdf.queryExecution()
    return qe.optimizedPlan().toString(), qe.sparkPlan().toString()


def test_detector_flags_injected_regression(spark):
    """The canary itself must fail on the regression class it exists
    for — a global row_number and a cartesian join."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("g")
    )
    bad = df.withColumn("r", F.row_number().over(W.orderBy("id")))
    logical, _ = _plans_of(bad)
    assert global_ordered_windows(logical), logical

    good = df.withColumn(
        "r", F.row_number().over(W.partitionBy("g").orderBy("id"))
    )
    logical, _ = _plans_of(good)
    assert not global_ordered_windows(logical)

    # with broadcast disabled, a crossJoin compiles to the exact node
    # the canary forbids
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _, phys = _plans_of(df.crossJoin(spark.range(50).toDF("id2")))
        assert "CartesianProduct" in phys, phys
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)

    # a broadcast crossJoin compiles to BroadcastNestedLoopJoin — the
    # node class the r9 resample regression hid in (VERDICT r9 #2)
    _, phys = _plans_of(
        df.crossJoin(F.broadcast(spark.range(50).toDF("id2")))
    )
    assert "BroadcastNestedLoopJoin" in phys, phys


@pytest.mark.slow
def test_registry_plans_have_no_serial_window_or_cartesian(
    spark, monkeypatch
):
    import __spark_entry__ as entry
    from tests.conftest import concrete_dataframe_cls

    DataFrame = concrete_dataframe_cls()

    captured: list[tuple[str, str, str]] = []  # (query, logical, physical)
    current = {"name": "?"}

    def _capture(df):
        try:
            logical, phys = _plans_of(df)
            captured.append((current["name"], logical, phys))
        except Exception:
            pass  # plans of foreachBatch-internal frames etc.

    for meth in ("collect", "toPandas", "count", "localCheckpoint"):
        real = getattr(DataFrame, meth)

        def make(real):
            def wrapper(self, *a, **kw):
                _capture(self)
                return real(self, *a, **kw)

            return wrapper

        monkeypatch.setattr(DataFrame, meth, make(real))

    failures = []
    for name, fn in entry.queries().items():
        current["name"] = name
        try:
            df = fn(spark, SF_DIR)
            _capture(df)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            failures.append(f"{name}: build error {type(exc).__name__}: {exc}")
    monkeypatch.undo()

    for name, logical, phys in captured:
        if "CartesianProduct" in phys:
            failures.append(f"{name}: CartesianProduct in physical plan")
        if "BroadcastNestedLoopJoin" in phys and name not in ALLOWED_BNLJ:
            failures.append(
                f"{name}: BroadcastNestedLoopJoin in physical plan"
            )
        bad = global_ordered_windows(logical)
        if bad and name not in ALLOWED_GLOBAL_WINDOW:
            failures.append(
                f"{name}: unpartitioned ordered Window: {bad[0][:160]}"
            )
    assert not failures, "\n".join(failures)

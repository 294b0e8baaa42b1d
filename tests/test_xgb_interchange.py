"""xgboost JSON interchange: export the NumPy CART forest in xgboost's
public model schema, and compile any xgboost JSON model (ours or one
from real xgboost) to pure-JVM Column / SQL expressions.

Reference parity target: ml/random_forest.py:30,131 returns an
``xgboost.core.Booster``; the interchange documents close that gap
without the library (DIVERGENCES.md)."""

from __future__ import annotations

import json
import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_spark.ml.random_forest import (
    ForestModel,
    _build_tree,
)
from openeo_processes_dask_spark.ml.xgb_interchange import (
    forest_to_xgboost_json,
    predict_xgboost_json,
    xgboost_json_to_column,
    xgboost_json_to_sql,
)


@pytest.fixture(scope="module")
def forest():
    rng = np.random.default_rng(7)
    X = rng.normal(size=(400, 3))
    y = X[:, 0] * 2 + np.sin(X[:, 1]) + rng.normal(scale=0.1, size=400)
    trees = []
    for t in range(5):
        r = np.random.default_rng(100 + t)
        boot = r.integers(0, len(y), size=len(y))
        trees.append(_build_tree(X[boot], y[boot], r, 5, 2, 2))
    return ForestModel(trees, ["f0", "f1", "f2"]), X, y


def test_export_schema_shape(forest):
    model, _, _ = forest
    doc = forest_to_xgboost_json(model)
    # must be valid JSON and carry the documented structure
    doc = json.loads(json.dumps(doc))
    learner = doc["learner"]
    booster = learner["gradient_booster"]
    assert booster["name"] == "gbtree"
    assert learner["objective"]["name"] == "reg:squarederror"
    assert learner["learner_model_param"]["num_feature"] == "3"
    trees = booster["model"]["trees"]
    assert len(trees) == 5
    assert booster["model"]["gbtree_model_param"]["num_trees"] == "5"
    for t in trees:
        n = len(t["left_children"])
        for k in (
            "right_children",
            "parents",
            "split_indices",
            "split_conditions",
            "default_left",
            "base_weights",
            "sum_hessian",
            "loss_changes",
            "split_type",
        ):
            assert len(t[k]) == n, k
        assert int(t["tree_param"]["num_nodes"]) == n
        # children are either both present or both absent per node
        for l, r in zip(t["left_children"], t["right_children"]):
            assert (l == -1) == (r == -1)


def test_compiled_column_matches_engine_predict(spark, forest):
    model, X, _ = forest
    doc = forest_to_xgboost_json(model)
    expected = model.predict(X[:100])
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in X[:100]],
        "f0 double, f1 double, f2 double",
    )
    got = [
        r.prediction
        for r in predict_xgboost_json(df, doc)
        .select("prediction")
        .collect()
    ]
    np.testing.assert_allclose(sorted(got), sorted(expected), rtol=1e-12)


def test_sql_twin_matches_column(spark, forest):
    model, X, _ = forest
    doc = forest_to_xgboost_json(model)
    sql_expr = xgboost_json_to_sql(doc)
    con = duckdb.connect()
    # exponent-form literals parse as DOUBLE (bare decimals would route
    # through DuckDB's not-correctly-rounded DECIMAL->DOUBLE conversion)
    vals = ", ".join(
        f"({a:.17e}, {b:.17e}, {c:.17e})" for a, b, c in X[:50]
    )
    exp = [
        r[0]
        for r in con.execute(
            f"SELECT {sql_expr} FROM (VALUES {vals}) t(f0, f1, f2) ORDER BY 1"
        ).fetchall()
    ]
    np.testing.assert_allclose(exp, sorted(model.predict(X[:50])), rtol=1e-12)


def test_threshold_boundary_routes_left(spark):
    """The engine's `x <= thr` left-branch must survive the conversion to
    xgboost's `x < cond`: a feature exactly AT the threshold goes left."""
    thr = 1.25  # exactly representable
    tree = {"f": 0, "thr": thr, "l": {"leaf": -10.0}, "r": {"leaf": 10.0}}
    model = ForestModel([tree], ["f0"])
    doc = forest_to_xgboost_json(model)
    cond = doc["learner"]["gradient_booster"]["model"]["trees"][0][
        "split_conditions"
    ][0]
    assert cond == math.nextafter(thr, math.inf)
    df = spark.createDataFrame(
        [(thr,), (math.nextafter(thr, math.inf),), (1.0,), (2.0,)],
        "f0 double",
    )
    rows = {
        r.f0: r.prediction
        for r in predict_xgboost_json(df, doc).collect()
    }
    assert rows[thr] == -10.0  # boundary: left, same as engine's <=
    assert rows[math.nextafter(thr, math.inf)] == 10.0
    assert rows[1.0] == -10.0 and rows[2.0] == 10.0


def test_null_feature_follows_default_left(spark):
    tree = {"f": 0, "thr": 0.0, "l": {"leaf": 1.0}, "r": {"leaf": 2.0}}
    doc = forest_to_xgboost_json(ForestModel([tree], ["f0"]))
    df = spark.createDataFrame([(None,), (5.0,)], "f0 double")
    rows = {r.f0: r.prediction for r in predict_xgboost_json(df, doc).collect()}
    # default_left=0 on export (ADVICE r9): missing routes RIGHT,
    # matching the engine's `x <= thr` (False for NaN) exactly
    assert rows[None] == 2.0
    assert rows[5.0] == 2.0
    # flip default_left in the document -> NULLs go left
    doc["learner"]["gradient_booster"]["model"]["trees"][0]["default_left"] = [
        1,
        0,
        0,
    ]
    rows = {r.f0: r.prediction for r in predict_xgboost_json(df, doc).collect()}
    assert rows[None] == 1.0


def test_nan_roundtrip_matches_native_predict(spark):
    """The advertised bit-for-bit round-trip must hold on NaN-bearing
    scoring data (ADVICE r9): the engine's `x <= thr` sends NaN RIGHT,
    and the exported default_left=0 must reproduce that in every
    compiled lane."""
    tree = {
        "f": 0,
        "thr": 1.0,
        "l": {"leaf": 10.0},
        "r": {"f": 1, "thr": -2.0, "l": {"leaf": 20.0}, "r": {"leaf": 30.0}},
    }
    model = ForestModel([tree], ["f0", "f1"])
    X = np.array(
        [
            [float("nan"), -5.0],  # NaN f0 -> right; f1 <= -2 -> 20
            [5.0, float("nan")],  # right; NaN f1 -> right -> 30
            [0.0, 0.0],  # left -> 10
            [float("nan"), float("nan")],  # right, right -> 30
        ]
    )
    expected = model.predict(X)
    doc = forest_to_xgboost_json(model)
    df = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(X)],
        "i int, f0 double, f1 double",
    )
    for mode in ("case", "walk", "pandas"):
        got = [
            r.p
            for r in df.select(
                "i", xgboost_json_to_column(doc, mode=mode).alias("p")
            )
            .orderBy("i")
            .collect()
        ]
        assert got == list(expected), mode


def test_non_identity_objectives_rejected():
    """gbtree models whose objective applies an inverse link must be
    rejected loudly (ADVICE r9) — the compiled margin sum would be
    silently wrong for them."""
    tree = {"f": 0, "thr": 0.0, "l": {"leaf": 1.0}, "r": {"leaf": 2.0}}
    doc = forest_to_xgboost_json(ForestModel([tree], ["f0"]))
    for bad in ("binary:logistic", "multi:softmax", "count:poisson",
                "reg:gamma", "reg:tweedie", "rank:pairwise"):
        doc["learner"]["objective"]["name"] = bad
        with pytest.raises(ValueError, match="objective"):
            xgboost_json_to_column(doc)
    doc["learner"]["objective"]["name"] = "reg:squarederror"
    xgboost_json_to_column(doc)  # identity link: fine

    doc["learner"]["learner_model_param"]["num_class"] = "3"
    with pytest.raises(ValueError, match="num_class"):
        xgboost_json_to_column(doc)
    doc["learner"]["learner_model_param"]["num_class"] = "0"

    doc["learner"]["gradient_booster"]["model"]["tree_info"] = [1]
    with pytest.raises(ValueError, match="tree_info"):
        xgboost_json_to_column(doc)


def test_per_node_arrays_share_preorder_indexing():
    """sum_hessian / loss_changes must be indexed like every other
    per-node array (ADVICE r9: they were appended post-recursion, i.e.
    post-order). With per-node-distinct values the alignment is
    directly observable."""
    from openeo_processes_dask_spark.ml.xgb_interchange import _flatten_tree

    tree = {
        "f": 0,
        "thr": 1.0,
        "l": {"f": 1, "thr": 2.0, "l": {"leaf": 3.0}, "r": {"leaf": 4.0}},
        "r": {"leaf": 5.0},
    }
    flat = _flatten_tree(tree, 1)
    n = len(flat["left_children"])
    assert len(flat["sum_hessian"]) == n
    assert len(flat["loss_changes"]) == n
    # preorder: root=0, its left subtree rooted at 1 (leaves 2, 3),
    # right leaf at 4 — and arrays must be coherent with child pointers
    assert flat["left_children"][0] == 1
    assert flat["right_children"][0] == 4
    assert flat["left_children"][1] == 2
    assert flat["right_children"][1] == 3


def test_foreign_xgboost_document(spark):
    """A hand-built document shaped like real xgboost output (bare arrays,
    base_score in scientific notation, INT_MAX parents) compiles and
    scores: base_score + sum of leaves."""
    tree0 = {
        "left_children": [1, -1, -1],
        "right_children": [2, -1, -1],
        "parents": [2147483647, 0, 0],
        "split_indices": [1, 0, 0],
        "split_conditions": [3.0, -1.0, 1.0],
        "default_left": [1, 0, 0],
    }
    tree1 = {
        "left_children": [-1],
        "right_children": [-1],
        "parents": [2147483647],
        "split_indices": [0],
        "split_conditions": [0.25],
        "default_left": [0],
    }
    doc = {
        "version": [1, 7, 6],
        "learner": {
            "feature_names": ["a", "b"],
            "gradient_booster": {
                "name": "gbtree",
                "model": {"trees": [tree0, tree1]},
            },
            "learner_model_param": {"base_score": "5E-1"},
            "objective": {"name": "reg:squarederror"},
        },
    }
    df = spark.createDataFrame(
        [(0.0, 2.0), (0.0, 3.0), (0.0, None)], "a double, b double"
    )
    rows = {
        (r.a, r.b): r.prediction
        for r in predict_xgboost_json(df, doc).collect()
    }
    assert rows[(0.0, 2.0)] == pytest.approx(0.5 - 1.0 + 0.25)  # b<3 left
    assert rows[(0.0, 3.0)] == pytest.approx(0.5 + 1.0 + 0.25)  # b>=3 right
    # NULL 'b' (tree0's split feature): default_left=1 -> left leaf -1.0
    assert rows[(0.0, None)] == pytest.approx(0.5 - 1.0 + 0.25)
    # SQL twin agrees
    con = duckdb.connect()
    sql = xgboost_json_to_sql(doc)
    got = con.execute(
        f"SELECT {sql} FROM (VALUES (0.0, 2.0), (0.0, 3.0)) t(a, b) ORDER BY 1"
    ).fetchall()
    assert [g[0] for g in got] == pytest.approx([-0.25, 1.75])


def test_walk_and_pandas_lanes_match_case(spark, forest):
    """All three compile lanes score identically; auto picks by size."""
    model, X, _ = forest
    doc = forest_to_xgboost_json(model)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in X[:100]],
        "f0 double, f1 double, f2 double",
    )
    ref = sorted(
        r[0] for r in df.select(xgboost_json_to_column(doc, mode="case")).collect()
    )
    for mode in ("walk", "pandas"):
        got = sorted(
            r[0]
            for r in df.select(xgboost_json_to_column(doc, mode=mode)).collect()
        )
        np.testing.assert_allclose(got, ref, rtol=1e-12, err_msg=mode)
    with pytest.raises(ValueError, match="mode"):
        xgboost_json_to_column(doc, mode="jit")


def test_nan_and_null_are_missing_in_every_lane(spark):
    """xgboost semantics: NaN == NULL == missing -> default_left route,
    in the case, walk, AND pandas lanes."""
    tree = {"f": 0, "thr": 0.0, "l": {"leaf": 1.0}, "r": {"leaf": 2.0}}
    doc = forest_to_xgboost_json(ForestModel([tree], ["f0"]))
    df = spark.createDataFrame(
        [(None,), (float("nan"),), (5.0,), (-5.0,)], "f0 double"
    )
    for mode in ("case", "walk", "pandas"):
        rows = [
            r[0]
            for r in df.select(
                xgboost_json_to_column(doc, mode=mode).alias("p")
            ).collect()
        ]
        # export sets default_left=0 (ADVICE r9): missing routes RIGHT,
        # matching the engine's `x <= thr` NaN behavior
        assert rows == [2.0, 2.0, 2.0, 1.0], mode
    # SQL twin: NaN follows default_left too
    con = duckdb.connect()
    sql = xgboost_json_to_sql(doc)
    got = con.execute(
        f"SELECT {sql} FROM (VALUES (CAST('nan' AS DOUBLE)), (5.0)) t(f0)"
    ).fetchall()
    assert [g[0] for g in got] == [2.0, 2.0]


def test_auto_mode_thresholds(forest):
    from openeo_processes_dask_spark.ml import xgb_interchange as xi

    model, _, _ = forest
    doc = forest_to_xgboost_json(model)
    nodes = sum(
        len(t["left_children"])
        for t in doc["learner"]["gradient_booster"]["model"]["trees"]
    )
    # the fixture forest is beyond the case budget -> auto must not build
    # the fused CASE chain (the janino-64KB-fallback regression class)
    assert nodes > 0
    picked = []
    orig_walk, orig_pd = xi._walk_column, xi._pandas_column
    orig_case = xi._compile_tree_column
    try:
        xi._walk_column = lambda *a, **k: picked.append("walk") or F.lit(0.0)
        xi._pandas_column = lambda *a, **k: picked.append("pandas") or F.lit(0.0)
        xi._compile_tree_column = (
            lambda *a, **k: picked.append("case") or F.lit(0.0)
        )
        xgboost_json_to_column(doc, mode="auto")
        expect = (
            "case"
            if nodes <= xi._CASE_NODE_BUDGET
            else ("walk" if nodes <= xi._WALK_NODE_BUDGET else "pandas")
        )
        assert picked[0] == expect
    finally:
        xi._walk_column, xi._pandas_column = orig_walk, orig_pd
        xi._compile_tree_column = orig_case


def test_feature_cols_override_and_errors():
    tree = {"left_children": [-1], "right_children": [-1],
            "split_indices": [0], "split_conditions": [1.5]}
    doc = {
        "learner": {
            "gradient_booster": {"name": "gbtree", "model": {"trees": [tree]}},
            "learner_model_param": {"base_score": "0"},
        }
    }
    with pytest.raises(ValueError, match="feature"):
        xgboost_json_to_column(doc)
    assert xgboost_json_to_column(doc, ["z"]) is not None
    doc["learner"]["gradient_booster"]["name"] = "gblinear"
    with pytest.raises(ValueError, match="gbtree"):
        xgboost_json_to_column(doc, ["z"])


def test_golden_hand_computed_predictions(spark):
    """Golden-value pins (VERDICT r9 #6): the rf_xgb gate's oracle shares
    this module's exporter, so a shared-helper bug would be invisible to
    it. These expected values are HAND-COMPUTED from the tree definitions
    below — independent of every helper — and pin the full route table:
    both leaf sides, the `<=`->`<` boundary at thr and at nextafter(thr),
    and NULL-feature default routing, across the native predictor, all
    three compiled Column lanes, and the SQL twin.

    Tree A: f0 <= 1.25 ? 2.0 : (f1 <= -0.5 ? 4.0 : 8.0)
    Tree B: f1 <= 0.0 ? 16.0 : 32.0
    Ensemble = mean(A, B); missing routes RIGHT (default_left=0).
    """
    tree_a = {
        "f": 0,
        "thr": 1.25,
        "l": {"leaf": 2.0},
        "r": {"f": 1, "thr": -0.5, "l": {"leaf": 4.0}, "r": {"leaf": 8.0}},
    }
    tree_b = {"f": 1, "thr": 0.0, "l": {"leaf": 16.0}, "r": {"leaf": 32.0}}
    model = ForestModel([tree_a, tree_b], ["f0", "f1"])
    doc = forest_to_xgboost_json(model)

    above = math.nextafter(1.25, math.inf)
    golden = [
        # (f0, f1, hand-computed (A + B) / 2)
        (0.0, 0.0, 9.0),      # A left -> 2;  B left -> 16
        (1.25, 0.0, 9.0),     # AT thr: <= routes LEFT -> 2; B 16
        (above, 0.0, 12.0),   # just above thr: right, f1 > -0.5 -> 8; B 16
        (2.0, -0.5, 10.0),    # right, AT inner thr -> left 4; B left 16
        (2.0, 1.0, 20.0),     # right -> 8; B right -> 32
        (None, 1.0, 20.0),    # NULL f0 -> default RIGHT -> 8; B 32
        (0.0, None, 17.0),    # A left -> 2; NULL f1 -> default RIGHT -> 32
    ]

    # native predictor (NaN for NULL — the engine's missing encoding)
    X = np.array(
        [[math.nan if v is None else v for v in (a, b)] for a, b, _ in golden]
    )
    np.testing.assert_array_equal(
        model.predict(X), [e for _, _, e in golden]
    )

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b, _) in enumerate(golden)],
        "i int, f0 double, f1 double",
    )
    for mode in ("case", "walk", "pandas"):
        got = [
            r.p
            for r in df.select(
                "i", xgboost_json_to_column(doc, mode=mode).alias("p")
            )
            .orderBy("i")
            .collect()
        ]
        assert got == [e for _, _, e in golden], mode

    sql_expr = xgboost_json_to_sql(doc)
    vals = ", ".join(
        "({}, {}, {})".format(
            i,
            "CAST(NULL AS DOUBLE)" if a is None else f"{a:.17e}",
            "CAST(NULL AS DOUBLE)" if b is None else f"{b:.17e}",
        )
        for i, (a, b, _) in enumerate(golden)
    )
    got_sql = [
        r[0]
        for r in duckdb.connect()
        .execute(
            f"SELECT {sql_expr} FROM (VALUES {vals}) t(i, f0, f1) ORDER BY i"
        )
        .fetchall()
    ]
    assert got_sql == [e for _, _, e in golden]

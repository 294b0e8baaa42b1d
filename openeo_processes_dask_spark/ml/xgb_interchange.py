"""xgboost JSON model interchange — without importing xgboost.

The reference's ``fit_regr_random_forest`` returns an
``xgboost.core.Booster`` (reference: ml/random_forest.py:30,131) that
users persist and reload across tools. xgboost itself is not in this
container, but its model format is public and stable (xgboost docs,
"Introduction to Model IO": a versioned JSON schema with per-tree node
arrays). This module closes the interchange gap in both directions using
only that public schema:

- :func:`forest_to_xgboost_json` exports the engine's ``ForestModel``
  (NumPy CART forest, ml/random_forest.py) as an xgboost ``gbtree`` /
  ``reg:squarederror`` JSON document that xgboost's ``load_model`` can
  consume where it is installed.
- :func:`xgboost_json_to_column` compiles ANY such JSON model — ours or
  one trained by real xgboost — into a single nested ``CASE`` Column
  expression. That is the Spark-first inference answer: the reference
  broadcasts a Booster and calls it per block; here the model becomes a
  pure JVM expression inside whole-stage codegen, so scoring 100 TB
  never leaves the executor's generated code (no Python, no broadcast,
  no Arrow hop).
- :func:`xgboost_json_to_sql` emits the same compiled model as ANSI SQL
  (the DuckDB oracle twin of the Column lane, and a way to push a model
  into any SQL engine).

Semantics notes (both from the public docs):

- xgboost routes ``x < split_condition`` to the left ("yes") child; the
  engine's CART uses ``x <= thr`` left. The exporter maps losslessly via
  ``nextafter(thr, +inf)``: for float64 inputs ``x <= thr`` iff
  ``x < nextafter(thr)``.
- xgboost predicts ``base_score + sum(leaf_t)``; the engine's ensemble
  averages. Exported leaves are pre-divided by ``num_trees`` so the sum
  over exported trees equals the engine's mean, bit-for-bit (the
  division happens once per leaf at export, not per row).
- A missing (NULL) feature follows ``default_left``. The engine's
  training never produces missing splits, so exports set
  ``default_left=1`` uniformly; imports honor whatever the model says.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_INT_MAX = 2147483647  # xgboost's "no parent" sentinel


def _flatten_tree(tree: dict, num_trees: int) -> dict:
    """Nested CART dict -> xgboost node arrays (preorder indexing)."""
    left, right, parents = [], [], []
    split_indices, split_conditions, default_left = [], [], []
    base_weights, sum_hessian, loss_changes = [], [], []

    def walk(node: dict, parent: int) -> int:
        i = len(left)
        left.append(-1)
        right.append(-1)
        parents.append(parent)
        if "leaf" in node:
            split_indices.append(0)
            # leaf value lives in split_conditions (public schema); the
            # /num_trees rescale turns the engine's mean into xgboost's sum
            split_conditions.append(node["leaf"] / num_trees)
            default_left.append(0)
            base_weights.append(node["leaf"] / num_trees)
        else:
            split_indices.append(int(node["f"]))
            split_conditions.append(math.nextafter(float(node["thr"]), math.inf))
            default_left.append(1)
            base_weights.append(0.0)
            left[i] = walk(node["l"], i)
            right[i] = walk(node["r"], i)
        sum_hessian.append(0.0)
        loss_changes.append(0.0)
        return i

    walk(tree, _INT_MAX)
    return {
        "left_children": left,
        "right_children": right,
        "parents": parents,
        "split_indices": split_indices,
        "split_conditions": split_conditions,
        "split_type": [0] * len(left),
        "default_left": default_left,
        "base_weights": base_weights,
        "sum_hessian": sum_hessian,
        "loss_changes": loss_changes,
        "categories": [],
        "categories_nodes": [],
        "categories_segments": [],
        "categories_sizes": [],
    }


def forest_to_xgboost_json(model, base_score: float = 0.0) -> dict:
    """Export a :class:`ForestModel` as an xgboost-format JSON document
    (``gbtree`` booster, ``reg:squarederror`` objective). The document is
    self-contained and loadable by ``xgboost.Booster().load_model`` where
    xgboost exists; here its twin consumers are
    :func:`xgboost_json_to_column` / :func:`xgboost_json_to_sql`."""
    n = len(model.trees)
    num_feature = len(model.feature_cols)
    trees = []
    for t, tree in enumerate(model.trees):
        flat = _flatten_tree(tree, n)
        flat["id"] = t
        flat["tree_param"] = {
            "num_deleted": "0",
            "num_feature": str(num_feature),
            "num_nodes": str(len(flat["left_children"])),
            "size_leaf_vector": "1",
        }
        trees.append(flat)
    return {
        "version": [2, 0, 0],
        "learner": {
            "attributes": {},
            "feature_names": list(model.feature_cols),
            "feature_types": ["float"] * num_feature,
            "gradient_booster": {
                "name": "gbtree",
                "model": {
                    "gbtree_model_param": {
                        "num_trees": str(n),
                        "num_parallel_tree": "1",
                    },
                    "iteration_indptr": list(range(n + 1)),
                    "tree_info": [0] * n,
                    "trees": trees,
                },
            },
            "learner_model_param": {
                "base_score": repr(float(base_score)),
                "boost_from_average": "1",
                "num_class": "0",
                "num_feature": str(num_feature),
                "num_target": "1",
            },
            "objective": {
                "name": "reg:squarederror",
                "reg_loss_param": {"scale_pos_weight": "1"},
            },
        },
    }


def _model_parts(obj: dict):
    """(trees, base_score, feature_names) from a full or bare document."""
    learner = obj.get("learner", obj)
    booster = learner["gradient_booster"]
    if booster.get("name", "gbtree") not in ("gbtree", ""):
        raise ValueError(
            f"Unsupported booster {booster.get('name')!r}; only gbtree "
            "(tree ensemble) models compile to expressions"
        )
    trees = booster["model"]["trees"]
    base = float(learner.get("learner_model_param", {}).get("base_score", 0.0))
    feats = learner.get("feature_names") or None
    return trees, base, feats


def _compile_tree_column(tree: dict, feats: list[Column]) -> Column:
    left = tree["left_children"]
    right = tree["right_children"]
    cond = tree["split_conditions"]
    fidx = tree["split_indices"]
    dleft = tree.get("default_left", [1] * len(left))

    def node(i: int) -> Column:
        if left[i] == -1:
            return F.lit(float(cond[i]))
        feat = feats[fidx[i]]
        default = node(left[i] if dleft[i] else right[i])
        return (
            F.when(feat.isNull(), default)
            .when(feat < F.lit(float(cond[i])), node(left[i]))
            .otherwise(node(right[i]))
        )

    return node(0)


def xgboost_json_to_column(
    obj: dict, feature_cols: list[str] | None = None
) -> Column:
    """Compile an xgboost JSON model into one Column expression:
    ``base_score + sum over trees of CASE chains``. Pure JVM — scoring
    stays inside whole-stage codegen with zero Python/broadcast cost.

    ``feature_cols`` overrides the model's ``feature_names`` (required
    when the model carries none, e.g. trained on unnamed matrices)."""
    trees, base, names = _model_parts(obj)
    cols = feature_cols or names
    if not cols:
        raise ValueError(
            "Model has no feature_names; pass feature_cols explicitly"
        )
    feats = [F.col(c).cast("double") for c in cols]
    acc = F.lit(float(base))
    for t in trees:
        acc = acc + _compile_tree_column(t, feats)
    return acc


def _dlit(v) -> str:
    """Float64 SQL literal in exponent form. The exponent forces the
    engine's correctly-rounded float parser; a bare decimal literal would
    be parsed as DECIMAL and DuckDB's DECIMAL->DOUBLE conversion is not
    correctly rounded once the mantissa exceeds 2^53 — enough to collapse
    a nextafter(thr) split condition back onto thr and flip the boundary
    branch (measured)."""
    return f"{float(v):.17e}"


def _compile_tree_sql(tree: dict, feats: list[str]) -> str:
    left = tree["left_children"]
    right = tree["right_children"]
    cond = tree["split_conditions"]
    fidx = tree["split_indices"]
    dleft = tree.get("default_left", [1] * len(left))

    def node(i: int) -> str:
        if left[i] == -1:
            return _dlit(cond[i])
        f = feats[fidx[i]]
        default = node(left[i] if dleft[i] else right[i])
        return (
            f"(CASE WHEN {f} IS NULL THEN {default} "
            f"WHEN {f} < {_dlit(cond[i])} "
            f"THEN {node(left[i])} "
            f"ELSE {node(right[i])} END)"
        )

    return node(0)


def xgboost_json_to_sql(
    obj: dict, feature_exprs: list[str] | None = None
) -> str:
    """The SQL twin of :func:`xgboost_json_to_column`: one scalar SQL
    expression evaluating the model (DuckDB oracle lane / pushing a model
    into any SQL engine). ``feature_exprs`` are SQL texts per feature
    index, defaulting to the model's feature_names as column names."""
    trees, base, names = _model_parts(obj)
    feats = feature_exprs or names
    if not feats:
        raise ValueError(
            "Model has no feature_names; pass feature_exprs explicitly"
        )
    acc = _dlit(base)
    for t in trees:
        acc = f"({acc} + {_compile_tree_sql(t, feats)})"
    return acc


def predict_xgboost_json(
    data: DataFrame,
    obj: dict,
    feature_cols: list[str] | None = None,
    out_col: str = "prediction",
) -> DataFrame:
    """Score ``data`` with an xgboost JSON model, fully JVM-side."""
    return data.withColumn(
        out_col, xgboost_json_to_column(obj, feature_cols)
    )

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
- A missing (NULL/NaN) feature follows ``default_left``. The engine's
  ``x <= thr`` comparison is False for NaN, routing missing values
  RIGHT — so exports set ``default_left=0`` uniformly (ADVICE r9: the
  previous ``default_left=1`` silently flipped NaN routing between the
  native predictor and every compiled lane); imports honor whatever the
  model says.
- Only identity-link objectives compile: a gbtree model with
  ``binary:logistic`` / ``multi:softmax`` / ``count:poisson`` etc.
  would need an inverse link (and per-class tree grouping) the compiled
  sum does not apply, so :func:`_model_parts` rejects them loudly
  instead of returning silently-wrong margins (ADVICE r9).
"""

from __future__ import annotations

import math

import pandas as pd
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
        # appended at node-creation time so ALL per-node arrays share the
        # same preorder indexing (ADVICE r9: appending after the child
        # recursion left these two in post-order — harmless while 0.0,
        # a latent trap for real per-node stats)
        sum_hessian.append(0.0)
        loss_changes.append(0.0)
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
            # missing (NULL/NaN) routes RIGHT: the engine's `x <= thr`
            # is False for NaN, so default_left=0 makes the compiled
            # lanes bit-identical to ForestModel.predict on NaN-bearing
            # scoring data (ADVICE r9)
            default_left.append(0)
            base_weights.append(0.0)
            left[i] = walk(node["l"], i)
            right[i] = walk(node["r"], i)
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


#: objectives whose prediction is the raw margin sum (identity link) —
#: the only ones a compiled `base_score + sum(leaf)` reproduces. Every
#: other objective applies an inverse link (sigmoid for binary:logistic,
#: exp for count:poisson/reg:gamma/reg:tweedie, softmax for multi:*) the
#: compiled expression does NOT, and logistic models additionally store
#: base_score on probability scale — silently wrong numbers (ADVICE r9).
_IDENTITY_LINK_OBJECTIVES = frozenset(
    {
        "reg:squarederror",
        "reg:squaredlogerror",
        "reg:linear",  # legacy alias of reg:squarederror
        "reg:pseudohubererror",
        "reg:absoluteerror",
        "reg:quantileerror",
    }
)


def _model_parts(obj: dict):
    """(trees, base_score, feature_names) from a full or bare document."""
    learner = obj.get("learner", obj)
    booster = learner["gradient_booster"]
    if booster.get("name", "gbtree") not in ("gbtree", ""):
        raise ValueError(
            f"Unsupported booster {booster.get('name')!r}; only gbtree "
            "(tree ensemble) models compile to expressions"
        )
    objective = learner.get("objective", {}).get("name", "reg:squarederror")
    if objective not in _IDENTITY_LINK_OBJECTIVES:
        raise ValueError(
            f"Unsupported objective {objective!r}: the compiled "
            "base_score + sum(leaf) expression is the raw margin, and "
            "only identity-link regression objectives "
            f"({sorted(_IDENTITY_LINK_OBJECTIVES)}) predict on that "
            "scale. Logistic/softmax/Poisson models would return "
            "silently-wrong numbers — apply the inverse link (and for "
            "multi-class, per-class tree grouping) outside this module."
        )
    params = learner.get("learner_model_param", {})
    num_class = int(params.get("num_class", 0) or 0)
    if num_class > 1:
        raise ValueError(
            f"Multi-class model (num_class={num_class}) not supported: "
            "its trees belong to per-class groups and summing them "
            "across classes is meaningless"
        )
    tree_info = booster["model"].get("tree_info") or []
    if any(int(g) != 0 for g in tree_info):
        raise ValueError(
            "Model has trees in multiple output groups (nonzero "
            "tree_info) — per-class/multi-target boosters do not "
            "compile to a single scalar expression"
        )
    trees = booster["model"]["trees"]
    base = float(params.get("base_score", 0.0))
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
        # NULL *and* NaN are both "missing" to xgboost: default_left route
        return (
            F.when(feat.isNull() | F.isnan(feat), default)
            .when(feat < F.lit(float(cond[i])), node(left[i]))
            .otherwise(node(right[i]))
        )

    return node(0)


def _globalize(trees: list[dict]):
    """Concatenate per-tree node arrays into one global address space
    (child pointers rebased; -1 leaf sentinel preserved) and compute the
    model's max depth. The flat arrays become SINGLE array literals in
    the walk lane — generated code is O(1) in model size."""
    left, right, fidx, cond, dleft, roots = [], [], [], [], [], []
    max_depth = 0
    for t in trees:
        off = len(left)
        roots.append(off)
        tl, tr = t["left_children"], t["right_children"]
        tdl = t.get("default_left", [1] * len(tl))
        for i in range(len(tl)):
            left.append(tl[i] + off if tl[i] != -1 else -1)
            right.append(tr[i] + off if tr[i] != -1 else -1)
            fidx.append(int(t["split_indices"][i]))
            cond.append(float(t["split_conditions"][i]))
            dleft.append(int(tdl[i]))
        depth = [0] * len(tl)
        for i in range(len(tl)):
            if tl[i] != -1:
                depth[tl[i]] = depth[tr[i]] = depth[i] + 1
        max_depth = max(max_depth, max(depth) if depth else 0)
    return left, right, fidx, cond, dleft, roots, max_depth


def _walk_column(trees: list[dict], base: float, feats: list[Column]) -> Column:
    left, right, fidx, cond, dleft, roots, max_depth = _globalize(trees)
    L, R = F.lit(left), F.lit(right)
    FI, C, DL = F.lit(fidx), F.lit(cond), F.lit(dleft)
    ROOT = F.lit(roots)
    x_arr = F.array(*feats)

    def step(s: Column, _i: Column) -> Column:
        l = F.element_at(L, s + 1)
        x = F.element_at(x_arr, F.element_at(FI, s + 1) + 1)
        c = F.element_at(C, s + 1)
        go_left = F.when(
            x.isNull() | F.isnan(x), F.element_at(DL, s + 1) == 1
        ).otherwise(x < c)
        return F.when(l == -1, s).otherwise(
            F.when(go_left, l).otherwise(F.element_at(R, s + 1))
        )

    def tree_leaf(acc: Column, t: Column) -> Column:
        final = (
            F.aggregate(
                F.sequence(F.lit(1), F.lit(max_depth)),
                F.element_at(ROOT, t + 1),
                step,
            )
            if max_depth > 0
            else F.element_at(ROOT, t + 1)
        )
        return acc + F.element_at(C, final + 1)

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(len(trees) - 1)),
        F.lit(float(base)),
        tree_leaf,
    )


# Above this many total nodes the sum-of-CASE-chains expression risks
# blowing janino's 64 KB method limit once fused with the rest of the
# stage (measured: ~500 nodes + a parquet scan fails, falling back to
# interpreted projection); the array-walk lane stays O(depth) in
# generated code no matter how many trees the model has.
_CASE_NODE_BUDGET = 192
# Above this, even the walk lane's per-row interpreted HOF cost
# (~32 us/row at 7.6k nodes, measured) loses to the Arrow hop of the
# vectorized pandas lane (level-synchronous NumPy traversal).
_WALK_NODE_BUDGET = 2048


def _pandas_scorer(trees: list[dict], base: float):
    """Vectorized batch scorer: all rows advance one tree level per
    NumPy step (level-synchronous traversal), so a batch costs
    O(rows x trees x depth) fancy-indexing ops instead of per-row
    Python. The flat node arrays ship to executors inside the UDF
    closure (KBs even for large boosters, no broadcast needed)."""
    import numpy as np

    left, right, fidx, cond, dleft, roots, max_depth = _globalize(trees)
    L = np.asarray(left, dtype=np.int64)
    R = np.asarray(right, dtype=np.int64)
    FI = np.asarray(fidx, dtype=np.int64)
    C = np.asarray(cond, dtype=np.float64)
    DL = np.asarray(dleft, dtype=np.bool_)

    def score_batch(cols) -> "np.ndarray":
        X = np.column_stack(
            [np.asarray(c, dtype=np.float64) for c in cols]
        )
        n = len(X)
        out = np.full(n, float(base))
        rows = np.arange(n)
        for root in roots:
            idx = np.full(n, root, dtype=np.int64)
            for _ in range(max_depth):
                l = L[idx]
                at_split = l != -1
                if not at_split.any():
                    break
                x = X[rows, FI[idx]]
                go_left = np.where(np.isnan(x), DL[idx], x < C[idx])
                idx = np.where(at_split, np.where(go_left, l, R[idx]), idx)
            out += C[idx]
        return out

    return score_batch


def _pandas_column(
    trees: list[dict], base: float, cols: list[str]
) -> Column:
    from pyspark.sql.functions import pandas_udf

    score_batch = _pandas_scorer(trees, base)

    @pandas_udf("double")
    def _score(*series: pd.Series) -> pd.Series:
        return pd.Series(score_batch(series))

    return _score(*[F.col(c).cast("double") for c in cols])


def xgboost_json_to_column(
    obj: dict, feature_cols: list[str] | None = None, mode: str = "auto"
) -> Column:
    """Compile an xgboost JSON model into one Column expression:
    ``base_score + sum over trees``. Pure JVM — scoring stays inside
    whole-stage codegen with zero Python/broadcast cost.

    Two code shapes, selected by ``mode``:

    - ``"case"`` — nested CASE chains, one branch per node. Fastest for
      small models, but generated code is O(total nodes): past janino's
      64 KB method limit Spark silently falls back to interpreted
      projection (~3× slower, measured on the rf_xgb gate).
    - ``"walk"`` — the node arrays become single array LITERALS
      (constant objects in codegen, not per-element expressions) and a
      depth-bounded ``aggregate`` loop walks them. Generated code is
      O(max_depth), independent of tree count — the lane that survives
      a 500-tree production Booster.
    - ``"pandas"`` — Arrow-batched vectorized NumPy traversal (all rows
      advance one level per step). Pays the Arrow hop but scoring cost
      per row is ~30x lower than the interpreted walk on large models;
      the production lane for real multi-hundred-tree boosters.
    - ``"auto"`` (default) — ``case`` up to ``_CASE_NODE_BUDGET`` total
      nodes, ``walk`` to ``_WALK_NODE_BUDGET``, ``pandas`` beyond.

    NULL and NaN features are both "missing" (xgboost semantics): they
    follow ``default_left`` in every lane.

    ``feature_cols`` overrides the model's ``feature_names`` (required
    when the model carries none, e.g. trained on unnamed matrices)."""
    trees, base, names = _model_parts(obj)
    cols = feature_cols or names
    if not cols:
        raise ValueError(
            "Model has no feature_names; pass feature_cols explicitly"
        )
    if mode not in ("auto", "case", "walk", "pandas"):
        raise ValueError(f"mode must be auto|case|walk|pandas, got {mode!r}")
    if mode == "auto":
        total_nodes = sum(len(t["left_children"]) for t in trees)
        if total_nodes <= _CASE_NODE_BUDGET:
            mode = "case"
        elif total_nodes <= _WALK_NODE_BUDGET:
            mode = "walk"
        else:
            mode = "pandas"
    if mode == "pandas":
        return _pandas_column(trees, base, list(cols))
    feats = [F.col(c).cast("double") for c in cols]
    if mode == "walk":
        return _walk_column(trees, base, feats)
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
            f"(CASE WHEN {f} IS NULL OR isnan({f}) THEN {default} "
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

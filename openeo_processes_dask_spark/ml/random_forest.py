"""Random-forest regression (reference: ml/random_forest.py — SURVEY.md §2.13).

The reference trains dask-xgboost on a vector cube's predictor columns
(random_forest.py:22-125) and broadcasts the Booster for prediction
(:128-161). Neither xgboost nor sklearn is in this container, so the model
is a pure-NumPy CART forest — and the Spark-first angle is the
*parallelization axis*: training data is broadcast once and each executor
task grows one bootstrap tree (``mapInPandas`` over a tree-index table),
which is exactly how you'd scale bagging on a cluster (trees are
embarrassingly parallel; the training matrix for vector cubes is
metadata-sized next to the raster data).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process

# ---- pure-NumPy CART ----------------------------------------------------


def _build_tree(
    X: np.ndarray,
    y: np.ndarray,
    rng: np.random.Generator,
    max_depth: int,
    min_leaf: int,
    n_feature_sample: int,
):
    """Variance-reduction CART; returns a nested dict (JSON-serializable)."""

    def grow(idx: np.ndarray, depth: int):
        if depth >= max_depth or len(idx) < 2 * min_leaf or np.ptp(y[idx]) == 0:
            return {"leaf": float(y[idx].mean())}
        feats = rng.choice(X.shape[1], size=n_feature_sample, replace=False)
        best = None
        parent_sse = ((y[idx] - y[idx].mean()) ** 2).sum()
        for f in feats:
            xs = X[idx, f]
            for q in (0.25, 0.5, 0.75):
                thr = float(np.quantile(xs, q))
                left = idx[xs <= thr]
                right = idx[xs > thr]
                if len(left) < min_leaf or len(right) < min_leaf:
                    continue
                sse = ((y[left] - y[left].mean()) ** 2).sum() + (
                    (y[right] - y[right].mean()) ** 2
                ).sum()
                if best is None or sse < best[0]:
                    best = (sse, f, thr, left, right)
        if best is None or best[0] >= parent_sse:
            return {"leaf": float(y[idx].mean())}
        _, f, thr, left, right = best
        return {
            "f": int(f),
            "thr": thr,
            "l": grow(left, depth + 1),
            "r": grow(right, depth + 1),
        }

    return grow(np.arange(len(y)), 0)


def _predict_tree(tree: dict, X: np.ndarray) -> np.ndarray:
    out = np.empty(len(X))
    for i, row in enumerate(X):
        node = tree
        while "leaf" not in node:
            node = node["l"] if row[node["f"]] <= node["thr"] else node["r"]
        out[i] = node["leaf"]
    return out


class ForestModel:
    """The engine's 'Booster' equivalent: a list of CART dicts + metadata.
    Small enough to broadcast (the reference broadcasts its Booster the
    same way, random_forest.py:138-144)."""

    def __init__(self, trees: list[dict], feature_cols: list[str]):
        self.trees = trees
        self.feature_cols = feature_cols

    def predict(self, X: np.ndarray) -> np.ndarray:
        # strict left-to-right tree sum (np.mean's pairwise reduction order
        # varies with n) so an exported-rules SQL twin can reproduce the
        # ensemble bit-for-bit
        acc = _predict_tree(self.trees[0], X)
        for t in self.trees[1:]:
            acc = acc + _predict_tree(t, X)
        return acc / len(self.trees)


@process
def fit_regr_random_forest(
    predictors: DataFrame,
    target: str,
    num_trees: int = 100,
    max_variables=None,
    seed: int = 42,
    max_depth: int = 8,
    min_leaf: int = 2,
    max_training_rows: int = 1_000_000,
) -> ForestModel:
    """Train a bagged CART forest
    (reference: ml/random_forest.py:22-125; 'sqrt' feature sampling default
    mirrors its max_features handling).

    Distribution model: the training matrix is driver-collected ONCE and
    shipped to executors via an explicit SparkContext broadcast (one copy
    per executor, not per task closure, destroyed after the tree collect);
    one Spark task per tree. Bagging needs every tree to see the whole
    matrix, so the collect is inherent to the algorithm.

    When the input exceeds ``max_training_rows`` the training set is a
    DETERMINISTIC seeded sample of exactly ``max_training_rows`` rows
    (VERDICT r02 #4): each row is keyed by md5(seed, row values) and the
    smallest keys win, so the sample is reproducible across partitionings
    and cluster sizes — the distributed analogue of a seeded reservoir.
    The sample is drawn scan-side (a hash-threshold filter keeps ~cap rows
    before the exact top-k), so at 100 TB only ~cap rows ever leave the
    executors. Tree seeds are ``seed + tree_index`` → deterministic forest
    regardless of scheduling.
    """
    feature_cols = [c for c in predictors.columns if c != target]
    n_rows = predictors.count()
    if n_rows > max_training_rows:
        cols = [*feature_cols, target]
        key = F.md5(
            F.concat_ws(
                "\x1f", F.lit(str(seed)), *[F.col(c).cast("string") for c in cols]
            )
        )
        keyed = predictors.select(*cols, key.alias("__rk__"))
        # scan-side pre-filter: keep ~5% more than the cap by hash
        # threshold (uniform in [0, 2^60)), then take the exact cap by key
        # order. Falls back to the unfiltered top-k in the (adversarial)
        # case where the margin undershoots.
        frac = max_training_rows / n_rows
        bound = int(min(1.0, frac * 1.05) * (1 << 60))
        pre = keyed.where(
            F.conv(F.substring(F.col("__rk__"), 1, 15), 16, 10).cast("bigint")
            < F.lit(bound)
        )
        if pre.count() < max_training_rows:
            pre = keyed
        predictors = (
            pre.orderBy("__rk__", *cols).limit(int(max_training_rows)).drop("__rk__")
        )
    pdf = predictors.select(*feature_cols, target).toPandas()
    X = pdf[feature_cols].to_numpy(dtype="float64")
    y = pdf[target].to_numpy(dtype="float64")
    if max_variables in (None, "sqrt"):
        n_feat = max(1, int(np.sqrt(X.shape[1])))
    elif max_variables == "all":
        n_feat = X.shape[1]
    else:
        n_feat = int(max_variables)

    spark = predictors.sparkSession
    bc = spark.sparkContext.broadcast((X, y))
    tree_idx = spark.range(num_trees).select(F.col("id").cast("int").alias("tree"))
    md, ml = max_depth, min_leaf

    def train(batches):
        import json as _json

        Xb, yb = bc.value
        for pdf_batch in batches:
            rows = []
            for t in pdf_batch["tree"]:
                rng = np.random.default_rng(seed + int(t))
                boot = rng.integers(0, len(yb), size=len(yb))
                tree = _build_tree(Xb[boot], yb[boot], rng, md, ml, n_feat)
                rows.append({"tree": int(t), "model": _json.dumps(tree)})
            yield pd.DataFrame(rows)

    trees_df = tree_idx.repartition(min(num_trees, 64)).mapInPandas(
        train, schema="tree int, model string"
    )
    import json as _json

    try:
        trees = [
            _json.loads(r["model"])
            for r in sorted(trees_df.collect(), key=lambda r: r["tree"])
        ]
    finally:
        # the broadcast matrix is only needed during the tree collect;
        # leaving it pinned would leak cap-sized executor+driver memory
        # per fit for the lifetime of the SparkContext
        bc.unpersist(blocking=False)
        bc.destroy()
    return ForestModel(trees, feature_cols)


@process
def predict_random_forest(data: DataFrame, model: ForestModel) -> DataFrame:
    """Broadcast the forest, predict via Arrow-batched pandas UDF
    (reference: ml/random_forest.py:128-161)."""
    cols = model.feature_cols
    trees = model.trees

    @F.pandas_udf("double")
    def predict(*feat: pd.Series) -> pd.Series:
        X = np.column_stack([f.to_numpy(dtype="float64") for f in feat])
        m = ForestModel(trees, cols)
        return pd.Series(m.predict(X))

    return data.withColumn("prediction", predict(*[F.col(c) for c in cols]))

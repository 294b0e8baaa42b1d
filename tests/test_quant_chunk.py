"""quantize_embeddings (similarity.py) + chunk_text (textanalysis.py)."""

import pytest

from openeo_processes_dask_spark.training.similarity import (
    quantize_embeddings,
)
from openeo_processes_dask_spark.training.textanalysis import chunk_text


def test_quantize_roundtrip_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    rows = {r["id"]: r for r in quantize_embeddings(df).collect()}
    r1 = rows[1]
    # absmax 1.0 -> scale 1/127; codes = round(x * 127)
    assert r1["codes"] == [127, -64, 32, 0]
    assert r1["scale"] == round(1.0 / 127.0, 6)
    assert 0 <= r1["mean_abs_err"] < 1.0 / 127.0
    r2 = rows[2]
    assert r2["codes"] == [0, 0, 0, 0]
    assert r2["scale"] == 0.0
    assert r2["mean_abs_err"] == 0.0


def test_quantize_codes_bounded(spark):
    import random

    random.seed(3)
    vecs = [
        (i, [random.uniform(-2, 2) for _ in range(16)]) for i in range(20)
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    for r in quantize_embeddings(df).collect():
        assert all(-127 <= c <= 127 for c in r["codes"])


def test_chunk_text_windows(spark):
    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, words), (2, ""), (3, "solo")],
                               ["doc_id", "text"])
    out = chunk_text(df, chunk_tokens=4, overlap=2)
    rows = sorted(
        (r["id"], r["chunk_id"], r["n_tokens"], r["chunk"])
        for r in out.collect()
    )
    # n=10, step=2, keep start 0 and starts < 10-2=8 -> 0,2,4,6
    assert [r[:3] for r in rows if r[0] == 1] == [
        (1, 0, 4), (1, 1, 4), (1, 2, 4), (1, 3, 4),
    ]
    assert rows[0][3] == "w0 w1 w2 w3"
    assert [r for r in rows if r[0] == 2] == []  # empty doc -> no chunks
    assert [r[:3] for r in rows if r[0] == 3] == [(3, 0, 1)]


def test_chunk_text_no_degenerate_tail(spark):
    # n == chunk_tokens: the second start (step) would cover only seen
    # tokens and must be dropped
    df = spark.createDataFrame(
        [(1, " ".join("x" * 1 for _ in range(4)))], ["doc_id", "text"]
    )
    out = chunk_text(df, chunk_tokens=4, overlap=2).collect()
    assert len(out) == 1


def test_chunk_text_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_text(df, chunk_tokens=4, overlap=4)


def test_quantized_topk_matches_python_replay(spark):
    import math
    import random

    from openeo_processes_dask_spark.training.similarity import (
        quantized_topk,
    )

    random.seed(11)
    vecs = [
        (i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(30)
    ]
    query = vecs[0][1]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    got = [(r["vec_id"], r["qdot"]) for r in quantized_topk(df, query, k=5).collect()]

    def rha(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    qa = max(abs(x) for x in query) / 127.0
    qc = [int(rha(x / qa)) for x in query]
    exp = []
    for i, v in vecs:
        s = max(abs(x) for x in v) / 127.0
        safe = s if s else 1.0
        c = [int(rha(x / safe)) for x in v]
        idot = sum(a * b for a, b in zip(c, qc))
        exp.append((i, round(idot * s * qa, 6)))
    exp = sorted(exp, key=lambda p: (-p[1], p[0]))[:5]
    assert got == exp
    # the quantized ranking tracks the exact one: the query itself wins
    assert got[0][0] == 0


def test_quantized_topk_plan_take_ordered(spark):
    from openeo_processes_dask_spark.diagnostics import plan_report
    from openeo_processes_dask_spark.training.similarity import (
        quantized_topk,
    )

    df = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.3, -0.4])], ["vec_id", "embedding"]
    )
    r = plan_report(quantized_topk(df, [0.5, 0.5], k=1))
    assert "TakeOrderedAndProject" in r.text and r.python_free


# --- standardize_embeddings ---------------------------------------------

def test_standardize_matches_numpy(spark):
    import numpy as np

    from openeo_processes_dask_spark.training.similarity import (
        standardize_embeddings,
    )

    vecs = [(i, [float(i), float(i % 2), 7.0]) for i in range(6)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    rows = {(r["id"], r["dim"]): r["z"] for r in standardize_embeddings(df).collect()}
    X = np.round(np.array([v for _, v in vecs]) * 1e6)
    for d in range(3):
        mu, sd = X[:, d].mean(), X[:, d].std(ddof=1)
        for i in range(6):
            exp = None if sd == 0 else round((X[i, d] - mu) / sd, 6)
            got = rows[(i, d)]
            assert (got is None) == (exp is None)
            if exp is not None:
                assert abs(got - exp) < 1e-9
    # constant dim (d=2) -> NULL everywhere, never a divide-by-zero crash
    assert all(rows[(i, 2)] is None for i in range(6))


def test_standardize_output_is_mean0_var1(spark):
    from openeo_processes_dask_spark.training.similarity import (
        standardize_embeddings,
    )

    vecs = [(i, [float((i * 7 + 3) % 11), float(i)]) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = standardize_embeddings(df)
    from pyspark.sql import functions as F

    stats = out.groupBy("dim").agg(
        F.round(F.avg("z"), 4).alias("mu"), F.round(F.var_samp("z"), 3).alias("v")
    ).collect()
    for r in stats:
        assert abs(r["mu"]) < 1e-3 and abs(r["v"] - 1.0) < 1e-2

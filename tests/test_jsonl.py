"""sources/jsonl.py — JSONL reading and embedded-JSON parsing."""

import json

from openeo_processes_dask_spark.sources.jsonl import (
    parse_json_column,
    read_jsonl,
)


def test_read_jsonl_roundtrip(spark, tmp_path):
    rows = [{"doc_id": i, "text": f"doc {i}", "score": i / 4} for i in range(20)]
    p = tmp_path / "dump.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    df = read_jsonl(spark, str(p), "doc_id LONG, text STRING, score DOUBLE")
    got = sorted(
        (r["doc_id"], r["text"], r["score"]) for r in df.collect()
    )
    assert got == [(r["doc_id"], r["text"], r["score"]) for r in rows]


def test_read_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "dirty.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\nNOT JSON AT ALL\n{"doc_id": 3, "text": "fine"}\n')
    df = read_jsonl(spark, str(p), "doc_id LONG, text STRING", keep_corrupt=True)
    clean = df.where(df["_corrupt_record"].isNull())
    bad = df.where(df["_corrupt_record"].isNotNull())
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 3]
    assert [r["_corrupt_record"] for r in bad.collect()] == ["NOT JSON AT ALL"]


def test_parse_json_column_typed_and_null_on_malformed(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 7, "tag": "x"}'), (2, "boom"), (3, None)],
        "id long, props string",
    )
    out = parse_json_column(df, "props", "k INT, tag STRING")
    got = {r["id"]: r["props_parsed"] for r in out.collect()}
    assert got[1]["k"] == 7 and got[1]["tag"] == "x"
    assert got[2] is None or got[2]["k"] is None  # malformed -> NULL struct
    assert got[3] is None


def test_parse_json_column_stays_jvm_side(spark):
    # the parse must compile to a from_json expression inside the plan —
    # no BatchEvalPython / ArrowEvalPython (Python would cap throughput)
    df = spark.createDataFrame([(1, '{"k": 1}')], "id long, props string")
    plan = (
        parse_json_column(df, "props", "k INT")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_write_jsonl_roundtrip_and_sharding(spark, tmp_path):
    import glob

    from openeo_processes_dask_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl,
    )

    rows = [(i, f"line with\nnewline {i}", i * 1.5) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, text string, score double")
    d = str(tmp_path / "out_jsonl")
    n = write_jsonl(df, d, target_file_bytes=4096)
    files = [f for f in glob.glob(d + "/part-*") if not f.endswith(".crc")]
    assert n > 1 and len(files) == n  # sharding actually happened
    back = read_jsonl(spark, d, "id LONG, text STRING, score DOUBLE")
    got = sorted((r["id"], r["text"], r["score"]) for r in back.collect())
    assert got == sorted(rows)  # embedded newlines survive JSON escaping


def test_write_jsonl_empty_frame(spark, tmp_path):
    from openeo_processes_dask_spark.sources.jsonl import write_jsonl

    df = spark.createDataFrame([], "id long, text string")
    assert write_jsonl(df, str(tmp_path / "empty_jsonl")) == 1

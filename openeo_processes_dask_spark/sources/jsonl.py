"""JSONL / embedded-JSON ingestion for crawl and event dumps.

Raw training corpora overwhelmingly arrive as JSON-lines (Common Crawl
WET/WARC post-processing, chat/event logs) or as parquet with embedded
JSON string columns (the ``events.props`` column in the test fixtures).
The reference's analogue is its GeoJSON loaders
(``openeo_processes_dask/process_implementations/cubes/load.py`` —
load_geojson/load_url); this lane generalizes ingestion to arbitrary
line-delimited JSON, Spark-first.

Scale notes:

- ``read_jsonl`` REQUIRES an explicit schema. ``spark.read.json`` without
  one performs a full inference pre-pass — a second complete scan of 100
  TB before the first real job. With a schema the read is one pass,
  line-splittable (uncompressed / bzip2 jsonl splits by line; a .gz file
  is one task — shard your dumps), and malformed lines land in
  ``_corrupt_record`` (PERMISSIVE) instead of failing the job.
- ``parse_json_column`` compiles to the JVM ``from_json`` expression:
  Catalyst projects ONLY the requested fields out of the JSON blob,
  stays inside whole-stage codegen, and never touches Python. Malformed
  documents yield a NULL struct — filterable, never throwing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read line-delimited JSON at ``path`` with an explicit ``schema``
    (DDL string, e.g. ``"doc_id LONG, text STRING"``).

    ``keep_corrupt=True`` appends a ``_corrupt_record`` string column
    holding the raw line for rows that failed to parse (NULL for clean
    rows) — the quarantine-don't-crash pattern for dirty dumps.
    """
    full = schema + (", _corrupt_record STRING" if keep_corrupt else "")
    reader = spark.read.schema(full)
    if keep_corrupt:
        reader = reader.option("columnNameOfCorruptRecord", "_corrupt_record")
    return reader.json(path)


def parse_json_column(
    df: DataFrame, col: str, schema: str, out_col: str | None = None
) -> DataFrame:
    """Parse an embedded-JSON string column into a typed struct column
    ``out_col`` (default ``<col>_parsed``) using ``from_json`` with the
    given DDL ``schema``. Unparseable values become NULL structs."""
    out = out_col or f"{col}_parsed"
    return df.withColumn(out, F.from_json(F.col(col), schema))


def write_jsonl(
    df: DataFrame,
    path: str,
    target_file_bytes: int = 128 << 20,
    sample_rows: int = 200,
) -> int:
    """Write ``df`` as sharded JSON-lines under ``path`` (one ``to_json``
    projection -> text sink), sizing the shard count from a driver-side
    serialization sample so files land near ``target_file_bytes`` — the
    interchange format most external tokenizer/training stacks consume.
    Returns the shard count used.

    Scale notes: ``to_json`` is a JVM expression (no Python); the sample
    is ``sample_rows`` rows serialized once on the driver to estimate
    bytes/row (same actual-size philosophy as compact_parquet, adapted
    to a sink whose size IS the serialized text). Uncompressed jsonl is
    line-splittable on read — the reason to prefer it over .gz shards
    for re-ingestion.
    """
    rows = df.limit(sample_rows).select(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("j")
    ).collect()
    if not rows:
        n = 1
    else:
        per_row = sum(len(r["j"]) + 1 for r in rows) / len(rows)
        total = df.count() * per_row
        n = max(1, int(total // target_file_bytes) + 1)
    out = df.select(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")
    )
    out.repartition(n).write.mode("overwrite").text(path)
    return n

"""SCALECHECK probe 26a (r14, VERDICT r13 #2): build the multi-row-group
scaled dataset the 8-vs-32-core parallelism probe runs on.

Every sf0.1 fixture parquet is ONE row group in ONE file, so a scan is
one task and sub-second gates are driver-overhead-bound — the r13 bench
could not demonstrate core scaling (all 8v32 ratios <= 1.5). This tool
writes /root/probe_scale/sf1x via a copy-index crossJoin (a 100-way
union plan is itself an analysis bottleneck):

- lineitem x100 with per-copy shifted keys (l_suppkey/l_orderkey/
  l_partkey + copy stride), 64 files -> 100x groups for the cube gates'
  aggregates AND windows (~60M rows);
- documents x10 SALTED (the r5 SCALECHECK recipe: per-copy boundary
  token so near-dup structure is preserved per copy, not multiplied
  across copies — keeps the LSH buckets linear), 64 files;
- embeddings x1000 with shifted vec_ids (same vectors -> same per-row
  scoring cost; 2M rows), 64 files;
- the remaining tables copied verbatim.

Perf probe data only — never read by any declared query, the bench, or
the oracle; sf_dir is an explicit argument everywhere.

Usage: PYTHONPATH=/root/repo python tools/probe26_make_scale_data.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("PROBE_SCALE_DIR", "/root/probe_scale/sf1x")
COPIES_LI = 100
COPIES_DOC = 10
COPIES_EMB = 1000
FILES = 64


def _copies(spark, df, n: int):
    idx = spark.range(n).select(F.col("id").cast("long").alias("__copy__"))
    return df.crossJoin(idx)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("r14-probe26-gen")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from openeo_processes_dask_spark.sources.load import load_table

    os.makedirs(DST, exist_ok=True)

    li = load_table(spark, SRC, "lineitem")
    c = F.col("__copy__")
    out = _copies(spark, li, COPIES_LI).select(
        (F.col("l_orderkey") + c * 10_000_000).alias("l_orderkey"),
        (F.col("l_partkey") + c * 1_000_000).alias("l_partkey"),
        (F.col("l_suppkey") + c * 1_000_000).alias("l_suppkey"),
        *[
            f.name
            for f in li.schema
            if f.name not in ("l_orderkey", "l_partkey", "l_suppkey")
        ],
    )
    out.repartition(FILES).write.mode("overwrite").parquet(
        f"{DST}/lineitem.parquet"
    )
    print("lineitem done", flush=True)

    docs = load_table(spark, SRC, "documents")
    out = _copies(spark, docs, COPIES_DOC).select(
        (F.col("doc_id") + c * 1_000_000).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" zzcopy"), c.cast("string"), F.lit("salt")
        ).alias("text"),
        *[f.name for f in docs.schema if f.name not in ("doc_id", "text")],
    )
    out.repartition(FILES).write.mode("overwrite").parquet(
        f"{DST}/documents.parquet"
    )
    print("documents done", flush=True)

    emb = load_table(spark, SRC, "embeddings")
    out = _copies(spark, emb, COPIES_EMB).select(
        (F.col("vec_id") + c * 1_000_000).alias("vec_id"),
        *[f.name for f in emb.schema if f.name != "vec_id"],
    )
    out.repartition(FILES).write.mode("overwrite").parquet(
        f"{DST}/embeddings.parquet"
    )
    print("embeddings done", flush=True)

    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "events",
    ):
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    print("copies done", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

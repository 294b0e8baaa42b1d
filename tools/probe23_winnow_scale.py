"""SCALECHECK probe 23 (r13 continuation): winnowed ingest screen cost
vs archive size.

Probe 22's archive-growth experiment for the WINNOWING lane
(`winnow_incremental`): a fixed 2,000-doc new batch (the probe-22
deterministic 30-token pseudo-texts, half perturbed archive copies,
half fresh) screened against archives of 50k / 100k / 200k documents.
The archive (id, fingerprint) table — what `winnow_fingerprints` emits,
minus pos — is built ONCE per size and written to parquet; the
per-increment screen (new-batch HOF selection + strictly new x seen
fingerprint join) is timed min-of-3. The contrast leg re-derives the
archive fingerprints from raw text on every ingest, one shot per size.

Usage: PYTHONPATH=/root/repo python tools/probe23_winnow_scale.py
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from openeo_processes_dask_spark.training.dedup import (
    winnow_fingerprints,
    winnow_incremental,
)

VOCAB = 5000
TOKENS = 30
NEW_N = 2000
K, W = 5, 4


def synth_docs(spark, lo: int, hi: int, perturb: bool = False):
    """Probe-22 generator: 30 tokens from a 5k vocabulary by integer
    arithmetic — content is a pure function of doc_id."""
    base = spark.range(lo, hi).select(F.col("id").alias("doc_id"))
    toks = [
        F.concat(
            F.lit("w"),
            ((F.col("doc_id") * 7 + j * 13) % VOCAB).cast("string"),
        )
        for j in range(TOKENS)
    ]
    text = F.concat_ws(" ", *toks)
    if perturb:
        text = F.concat(text, F.lit(" zz9"))
    return base.select("doc_id", text.alias("text"))


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("probe23")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="probe23_")
    try:
        for n_arch in (50_000, 100_000, 200_000):
            arch = synth_docs(spark, 0, n_arch)
            fp_path = os.path.join(work, f"wfp_{n_arch}")
            t0 = time.time()
            # deduplicate ONCE at write time (the seen_distinct
            # contract): raw selections can repeat a fingerprint
            # across positions of one doc
            winnow_fingerprints(arch, k=K, w=W).select(
                "id", "fingerprint"
            ).distinct().write.mode("overwrite").parquet(fp_path)
            build = time.time() - t0
            seen = spark.read.parquet(fp_path)
            new = synth_docs(
                spark, 0, NEW_N // 2, perturb=True
            ).unionAll(
                synth_docs(
                    spark, 10_000_000, 10_000_000 + NEW_N // 2
                )
            )
            # per-increment screen vs the persisted table, min-of-3:
            # default path (re-distincts the archive side per ingest)
            # and the seen_distinct contract path (skips that exchange)
            times, times_fast = [], []
            n_pairs = 0
            for _ in range(3):
                t0 = time.time()
                n_pairs = winnow_incremental(
                    new, seen, k=K, w=W, min_shared=1
                ).count()
                times.append(time.time() - t0)
                t0 = time.time()
                winnow_incremental(
                    new, seen, k=K, w=W, min_shared=1,
                    seen_distinct=True,
                ).count()
                times_fast.append(time.time() - t0)
            # contrast: re-derive archive fingerprints per ingest
            t0 = time.time()
            rederived = winnow_fingerprints(arch, k=K, w=W).select(
                "id", "fingerprint"
            )
            winnow_incremental(
                new, rederived, k=K, w=W, min_shared=1
            ).count()
            rederive = time.time() - t0
            print(
                f"archive={n_arch}: screen(min-of-3)={min(times):.2f}s "
                f"(all {[round(t, 2) for t in times]}), "
                f"seen_distinct={min(times_fast):.2f}s "
                f"(all {[round(t, 2) for t in times_fast]}), "
                f"re-derive={rederive:.2f}s, build-once={build:.1f}s, "
                f"pairs={n_pairs}"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

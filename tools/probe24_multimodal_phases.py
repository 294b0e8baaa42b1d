"""Round-14 probe: phase attribution for ingest_screen_multimodal
(VERDICT r13 #1). Times, per repetition: (a) fixture construction —
archive checkpoint + overlapped pool (new batch / signature tables /
k-means fit), (b) screen construction — ingest_screen_multimodal()
call, which includes minhash_incremental's internal eager checkpoint,
(c) the final count() action. Also counts Spark jobs per phase via the
status tracker.

Usage: PYTHONPATH=/root/repo python tools/probe24_multimodal_phases.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r14-probe24")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from openeo_processes_dask_spark.gates.training import (
        _multimodal_ingest_fixture,
        _setup,
    )
    from openeo_processes_dask_spark.training.dedup import (
        ingest_screen_multimodal,
    )

    _setup(spark)
    tracker = spark.sparkContext.statusTracker()

    def jobs() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    # warm-up (mirror bench)
    import __spark_entry__ as e
    qs = e.queries()
    qs["ingest_screen_multimodal"](spark, sf_dir).count()
    spark.catalog.clearCache()

    for rep in range(3):
        j0, t0 = jobs(), time.time()
        new, seen_fps, seen_sigs, members, cents, seen_hashes, new_sigs = (
            _multimodal_ingest_fixture(spark, sf_dir, with_new_sigs=True)
        )
        j1, t1 = jobs(), time.time()
        out = ingest_screen_multimodal(
            new, seen_fps, seen_sigs, members, cents, seen_hashes,
            n=3, num_hashes=64, bands=16, text_threshold=0.2,
            sem_threshold=0.35, max_hamming=3, hash_bands=8,
            new_signatures=new_sigs,
        )
        j2, t2 = jobs(), time.time()
        n = out.count()
        j3, t3 = jobs(), time.time()
        print(
            f"rep{rep}: fixture {t1-t0:.3f}s ({j1-j0} jobs) | "
            f"construct {t2-t1:.3f}s ({j2-j1} jobs) | "
            f"count {t3-t2:.3f}s ({j3-j2} jobs) | rows={n} | "
            f"total {t3-t0:.3f}s",
            flush=True,
        )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()

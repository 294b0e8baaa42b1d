"""Round-14 probe: per-gate build-vs-exec split (guide §1/§5). For each
named gate, times DataFrame construction (fn call — includes any eager
fixture actions) separately from the count() action, min-of-N each,
plus job counts per phase.

Usage: PYTHONPATH=/root/repo python tools/probe25_build_exec.py [q ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

DEFAULT = [
    "ingest_screen_multimodal", "semantic_dedup_incremental",
    "hybrid_rrf", "jaccard_prefix", "quantile_sketch",
    "curation_pipeline", "winnow_overlap", "ingest_screen",
    "bm25_index_search", "minhash_incremental", "span_dedup_stats",
]


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("PROBE_RUNS", "3"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r14-probe25")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs = e.queries()
    names = sys.argv[1:] or DEFAULT
    tracker = spark.sparkContext.statusTracker()

    def jobs() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    qs["filter_temporal"](spark, sf_dir).count()
    qs[names[0]](spark, sf_dir).count()  # warm the first target
    spark.catalog.clearCache()

    for name in names:
        fn = qs[name]
        bb, cc, bj, cj = float("inf"), float("inf"), 0, 0
        for _ in range(runs):
            j0, t0 = jobs(), time.time()
            df = fn(spark, sf_dir)
            j1, t1 = jobs(), time.time()
            df.count()
            j2, t2 = jobs(), time.time()
            if (t2 - t0) < (bb + cc):
                bb, cc, bj, cj = t1 - t0, t2 - t1, j1 - j0, j2 - j1
            spark.catalog.clearCache()
        print(
            f"{name}: build {bb:.3f}s ({bj} jobs) + exec {cc:.3f}s "
            f"({cj} jobs) = {bb+cc:.3f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

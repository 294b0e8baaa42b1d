"""SCALECHECK probe 26b (r14, VERDICT r13 #2/#7): run the flat-scaling
queries against the multi-row-group scaled dataset (probe 26a) at the
given core count, min-of-N count() each, and print one JSON line. Also
the harness for the guide-§9 deployment-conf A/B (zstd shuffle codec +
preferSortMergeJoin=false) — pass PROBE_CONF=prod.

Env: SPARK_GRAFT_CPUS (default 32), PROBE_SCALE_DIR, PROBE_RUNS,
PROBE_CONF (default|prod), PROBE_QUERIES (comma list).
Usage: PYTHONPATH=/root/repo python tools/probe26_scale_run.py
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

QUERIES = [
    "reduce_mean_over_time",
    "aggregate_dekad",
    "cumsum",
    "interpolate_gaps",
    "cosine_topk",
    "minhash_near_dups",
]


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("PROBE_SCALE_DIR", "/root/probe_scale/sf1x")
    runs = int(os.environ.get("PROBE_RUNS", "3"))
    conf = os.environ.get("PROBE_CONF", "default")
    names = [
        q for q in os.environ.get(
            "PROBE_QUERIES", ",".join(QUERIES)
        ).split(",") if q
    ]
    shuffle_parts = os.environ.get("PROBE_SHUFFLE") or str(max(int(cpus), 8))
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r14-probe26")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
    )
    if conf == "prod":
        # guide §9 candidates, measured here (NOT in bench.py): shuffle
        # codec + join-strategy preference
        b = (
            b.config("spark.io.compression.codec", "zstd")
            .config("spark.sql.join.preferSortMergeJoin", "false")
        )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs = e.queries()
    # warm-up
    qs[names[0]](spark, sf_dir).count()
    spark.catalog.clearCache()

    out = {"cpus": int(cpus), "conf": conf, "sf_dir": sf_dir, "timings": {},
           "exchanges": {}}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"probe26:{name}")
        plan = None
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.count()
            best = min(best, time.time() - t0)
            if plan is None:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
            spark.catalog.clearCache()
        out["timings"][name] = round(best, 3)
        out["exchanges"][name] = len(re.findall(r"\bExchange\b", plan))
        print(f"# {name}: {best:.3f}s", flush=True)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

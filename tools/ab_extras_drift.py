"""Round-13 drift adjudication (VERDICT r12 #3): isolated min-of-N of
the three watch-item extras — bm25_index_search, harmonic, hybrid_rrf —
for a worktree A/B against the r11 close-out commit.

The judge's quiet r12 readings (1.93 / 2.13 / 1.37 s) sat above the
r11-quiet band (~1.4 / 1.5-1.6 / 1.1-1.2) on code untouched in r12.
This script runs ONE side (the checkout it is invoked from) in a fresh
JVM: each gate isolated, min-of-N after one untimed warm execution,
with the shuffle + IO calibrations bracketing the block so a noisy
reading self-describes.

Usage: PYTHONPATH=<checkout> python tools/ab_extras_drift.py [runs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession

GATES = ("bm25_index_search", "harmonic", "hybrid_rrf")


def _cal(spark, cpus: int) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        spark.range(0, 20_000_000, 1, cpus).selectExpr(
            "id % 1000000 AS k", "id AS v"
        ).groupBy("k").sum("v").selectExpr("sum(`sum(v)`)").collect()
        best = min(best, time.time() - t0)
    return round(best, 3)


def _io_cal() -> float:
    import tempfile

    buf = b"\x5a" * (8 << 20)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        with tempfile.NamedTemporaryFile(dir="/tmp", delete=False) as f:
            for _ in range(8):
                f.write(buf)
            f.flush()
            os.fsync(f.fileno())
            path = f.name
        with open(path, "rb") as f:
            while f.read(16 << 20):
                pass
        os.unlink(path)
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-extras-drift")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs = e.queries()
    cal_start, io_start = _cal(spark, cpus), _io_cal()
    out: dict[str, float] = {}
    for name in GATES:
        fn = qs[name]
        fn(spark, sf_dir).count()  # untimed: codegen/footer warm-up
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        spark.catalog.clearCache()
    cal_end, io_end = _cal(spark, cpus), _io_cal()
    print(
        json.dumps(
            {
                "checkout": os.path.basename(os.getcwd()),
                "timings": out,
                "cal_start": cal_start,
                "cal_end": cal_end,
                "io_start": io_start,
                "io_end": io_end,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

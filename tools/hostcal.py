"""Standalone host-noise probe: the bench's engine-independent shuffle
and IO calibrations (bench.py lines ~119-163), runnable any time to
decide whether a measurement window is trustworthy. Quiet references on
this host: shuffle ~1.0-1.3 s, io ~0.13-0.19 s.

Usage: python tools/hostcal.py [repeats]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

from pyspark.sql import SparkSession


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("hostcal")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # one warm-up shuffle so JIT/codegen doesn't inflate the first rep
    spark.range(0, 1_000_000, 1, int(cpus)).selectExpr(
        "id % 1000 AS k", "id AS v"
    ).groupBy("k").sum("v").collect()
    for _ in range(reps):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            spark.range(0, 20_000_000, 1, int(cpus)).selectExpr(
                "id % 1000000 AS k", "id AS v"
            ).groupBy("k").sum("v").selectExpr("sum(`sum(v)`)").collect()
            best = min(best, time.time() - t0)
        buf = b"\x5a" * (8 << 20)
        io_best = float("inf")
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
            io_best = min(io_best, time.time() - t0)
        print(
            f"shuffle_cal={best:.3f} io_cal={io_best:.3f} "
            f"quiet={'YES' if best <= 1.3 and io_best <= 0.5 else 'NO'}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

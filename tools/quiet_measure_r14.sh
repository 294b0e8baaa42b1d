#!/bin/bash
# r14 quiet-gated measurement batch: wait until the engine-independent
# calibrations read quiet, then run the probe suite + bench, logging to
# /tmp/r14_measure/. Drops /tmp/r14_measure/MEASURING while active so
# the interactive session can avoid contending.
set -u
OUT=/tmp/r14_measure
mkdir -p $OUT
cd /root/repo
export PYTHONPATH=/root/repo

quiet() {
  python - <<'EOF' 2>/dev/null
import sys, time, os
sys.path.insert(0,"/root/repo")
from pyspark.sql import SparkSession
spark=(SparkSession.builder.master("local[32]").config("spark.ui.enabled","false")
  .config("spark.driver.memory","8g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
best=float("inf")
for _ in range(3):
    t0=time.time()
    spark.range(0,20_000_000,1,32).selectExpr("id % 1000000 AS k","id AS v").groupBy("k").sum("v").selectExpr("sum(`sum(v)`)").collect()
    best=min(best,time.time()-t0)
import tempfile
buf=b"\x5a"*(8<<20); t0=time.time()
with tempfile.NamedTemporaryFile(dir="/tmp",delete=False) as f:
    for _ in range(8): f.write(buf)
    f.flush(); os.fsync(f.fileno()); p=f.name
with open(p,"rb") as f:
    while f.read(16<<20): pass
os.unlink(p)
io=time.time()-t0
print(f"cal={best:.3f} io={io:.3f}")
spark.stop()
sys.exit(0 if (best<=1.3 and io<=0.5) else 1)
EOF
}

# wait for quiet, up to 3 hours
for i in $(seq 1 18); do
  if quiet >> $OUT/quiet_poll.log 2>&1; then
    echo "$(date +%H:%M:%S) quiet confirmed" >> $OUT/quiet_poll.log
    break
  fi
  sleep 110
done

touch $OUT/MEASURING
trap "rm -f $OUT/MEASURING" EXIT

step() {  # step <name> <cmd...>
  name=$1; shift
  if quiet >> $OUT/quiet_poll.log 2>&1; then
    echo "$(date +%H:%M:%S) step $name (quiet)" >> $OUT/quiet_poll.log
  else
    echo "$(date +%H:%M:%S) step $name (NOISY - running anyway, flagged)" >> $OUT/quiet_poll.log
  fi
  "$@" > $OUT/$name.log 2> $OUT/$name.err
}

step probe24 python tools/probe24_multimodal_phases.py
step probe25 env PROBE_RUNS=5 python tools/probe25_build_exec.py \
  ingest_screen_multimodal semantic_dedup_incremental hybrid_rrf \
  quantile_sketch ingest_screen minhash_incremental simhash_near_dups \
  bm25_index_search jaccard_prefix
step bench_mid python bench.py
step probe26_c32 env SPARK_GRAFT_CPUS=32 python tools/probe26_scale_run.py
step probe26_c8 env SPARK_GRAFT_CPUS=8 python tools/probe26_scale_run.py
step probe26_c32_prod env SPARK_GRAFT_CPUS=32 PROBE_CONF=prod python tools/probe26_scale_run.py
step probe26_c8_prod env SPARK_GRAFT_CPUS=8 PROBE_CONF=prod python tools/probe26_scale_run.py
echo "$(date +%H:%M:%S) DONE" >> $OUT/quiet_poll.log
rm -f $OUT/MEASURING

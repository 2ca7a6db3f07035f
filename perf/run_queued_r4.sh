#!/bin/bash
# Round-4 queued TPU measurements — run once the axon tunnel is back.
# Sequential (the runtime serializes anyway); each logs to /tmp/r4_*.log.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
LOGDIR=/tmp
run() {
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a $LOGDIR/r4_driver.log
  timeout 7200 python "$@" > $LOGDIR/r4_${name}.log 2>&1
  echo "=== $name exit=$? $(date +%H:%M:%S) ===" | tee -a $LOGDIR/r4_driver.log
}
# first-of-a-kind Mosaic kernels (v5 DIF, v4 peaks) — budget long compiles
run v5w    perf/r4_v5w.py
run peaks  perf/r4b_peaks.py
echo "=== tpu_suite start $(date +%H:%M:%S) ===" | tee -a $LOGDIR/r4_driver.log
FFTCONV_TEST_TPU=1 timeout 7200 python -m pytest tests/ -q \
  > $LOGDIR/r4_tpu_suite.log 2>&1
suite_rc=$?
echo "=== tpu_suite exit=$suite_rc $(date +%H:%M:%S) ===" | tee -a $LOGDIR/r4_driver.log
# refresh the round artifact in-repo only on a clean run
if [ "$suite_rc" = 0 ]; then cp $LOGDIR/r4_tpu_suite.log /root/repo/TPU_SUITE_r04.txt; fi
run bench  bench.py
if grep -q '^{"metric"' $LOGDIR/r4_bench.log 2>/dev/null; then
  grep '^{"metric"' $LOGDIR/r4_bench.log | tail -1 \
    > /root/repo/BENCH_r04_queued.json
fi
echo "ALL DONE $(date)" >> $LOGDIR/r4_driver.log

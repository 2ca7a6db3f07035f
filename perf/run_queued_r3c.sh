#!/bin/bash
# Round-3c queued TPU measurements — run once the axon tunnel is back.
# Sequential (the runtime serializes anyway); each logs to /tmp/r3c_*.log.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOGDIR=/tmp
run() {
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a $LOGDIR/r3c_driver.log
  timeout 5400 python "$@" > $LOGDIR/r3c_${name}.log 2>&1
  echo "=== $name exit=$? $(date +%H:%M:%S) ===" | tee -a $LOGDIR/r3c_driver.log
}
run high_prec  perf/diag_high_prec.py
run inv_direct perf/diag_inverse_tier_direct.py
run bigk_geom  perf/sweep_bigk_geometry.py
echo "=== tpu_suite start $(date +%H:%M:%S) ===" | tee -a $LOGDIR/r3c_driver.log
FFTCONV_TEST_TPU=1 timeout 5400 python -m pytest tests/ -q \
  > $LOGDIR/r3c_tpu_suite.log 2>&1
suite_rc=$?
echo "=== tpu_suite exit=$suite_rc $(date +%H:%M:%S) ===" | tee -a $LOGDIR/r3c_driver.log
# refresh the round artifact in-repo only on a clean run
if [ "$suite_rc" = 0 ]; then cp $LOGDIR/r3c_tpu_suite.log /root/repo/TPU_SUITE_r03.txt; fi
run bench      bench.py
# keep the measured record next to the driver's own BENCH_r03.json —
# only a real JSON record (bench may crash/timeout; stderr is merged in)
if grep -q '^{"metric"' $LOGDIR/r3c_bench.log 2>/dev/null; then
  grep '^{"metric"' $LOGDIR/r3c_bench.log | tail -1 \
    > /root/repo/BENCH_r03_queued.json
fi
echo "ALL DONE $(date)" >> $LOGDIR/r3c_driver.log

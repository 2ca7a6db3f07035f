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
echo "=== tpu_suite exit=$? $(date +%H:%M:%S) ===" | tee -a $LOGDIR/r3c_driver.log
run bench      bench.py
echo "ALL DONE $(date)" >> $LOGDIR/r3c_driver.log

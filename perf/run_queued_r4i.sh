#!/bin/bash
# Round-4i final-artifact run: TPU suite + full bench at the round's final
# HEAD (post v5-peaks/top-k/32²-envelope registrations). Launch ONLY with
# the working tree committed and quiescent — pytest imports race edits.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
LOGDIR=/tmp
echo "=== tpu_suite start $(date +%H:%M:%S) head=$(git rev-parse --short HEAD) ===" | tee -a $LOGDIR/r4i_driver.log
FFTCONV_TEST_TPU=1 timeout 7200 python -m pytest tests/ -q \
  > $LOGDIR/r4i_tpu_suite.log 2>&1
suite_rc=$?
echo "=== tpu_suite exit=$suite_rc $(date +%H:%M:%S) ===" | tee -a $LOGDIR/r4i_driver.log
if [ "$suite_rc" = 0 ]; then cp $LOGDIR/r4i_tpu_suite.log /root/repo/TPU_SUITE_r04.txt; fi
echo "=== bench start $(date +%H:%M:%S) ===" | tee -a $LOGDIR/r4i_driver.log
timeout 7200 python bench.py > $LOGDIR/r4i_bench.log 2>&1
echo "=== bench exit=$? $(date +%H:%M:%S) ===" | tee -a $LOGDIR/r4i_driver.log
if grep -q '^{"metric"' $LOGDIR/r4i_bench.log 2>/dev/null; then
  grep '^{"metric"' $LOGDIR/r4i_bench.log | tail -1 \
    > /root/repo/BENCH_r04_queued.json
fi
echo "ALL DONE $(date)" >> $LOGDIR/r4i_driver.log

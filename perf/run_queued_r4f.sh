#!/bin/bash
# Round-4f queued TPU run: suite at HEAD (validates the per-F radix_w
# dispatch keying on-chip) + quick bench sanity. Full bench reruns at the
# round's final HEAD.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
LOGDIR=/tmp
echo "=== tpu_suite start $(date +%H:%M:%S) head=$(git rev-parse --short HEAD) ===" | tee -a $LOGDIR/r4f_driver.log
FFTCONV_TEST_TPU=1 timeout 7200 python -m pytest tests/ -q \
  > $LOGDIR/r4f_tpu_suite.log 2>&1
suite_rc=$?
echo "=== tpu_suite exit=$suite_rc $(date +%H:%M:%S) ===" | tee -a $LOGDIR/r4f_driver.log
if [ "$suite_rc" = 0 ]; then cp $LOGDIR/r4f_tpu_suite.log /root/repo/TPU_SUITE_r04.txt; fi
echo "=== quick_bench start $(date +%H:%M:%S) ===" | tee -a $LOGDIR/r4f_driver.log
BENCH_QUICK=1 timeout 3600 python bench.py > $LOGDIR/r4f_bench_quick.log 2>&1
echo "=== quick_bench exit=$? $(date +%H:%M:%S) ===" | tee -a $LOGDIR/r4f_driver.log
echo "ALL DONE $(date)" >> $LOGDIR/r4f_driver.log

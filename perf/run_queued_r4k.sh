#!/bin/bash
# Round-4k final-artifact run: full bench FIRST (captures the rows added
# since the r4i artifact: ragged_bank16_stream, dpm_hog_bf16out_stream,
# detect_peaks_f32_stream at the 32^2 envelope), then the TPU suite at
# the same HEAD. Launch ONLY with the working tree committed and
# quiescent — pytest imports race edits.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
LOGDIR=/tmp
echo "=== bench start $(date +%H:%M:%S) head=$(git rev-parse --short HEAD) ===" | tee -a $LOGDIR/r4k_driver.log
timeout 7200 python bench.py > $LOGDIR/r4k_bench.log 2>&1
echo "=== bench exit=$? $(date +%H:%M:%S) ===" | tee -a $LOGDIR/r4k_driver.log
if grep -q '^{"metric"' $LOGDIR/r4k_bench.log 2>/dev/null; then
  grep '^{"metric"' $LOGDIR/r4k_bench.log | tail -1 \
    > /root/repo/BENCH_r04_queued.json
fi
echo "=== tpu_suite start $(date +%H:%M:%S) ===" | tee -a $LOGDIR/r4k_driver.log
FFTCONV_TEST_TPU=1 timeout 7200 python -m pytest tests/ -q \
  > $LOGDIR/r4k_tpu_suite.log 2>&1
suite_rc=$?
echo "=== tpu_suite exit=$suite_rc $(date +%H:%M:%S) ===" | tee -a $LOGDIR/r4k_driver.log
if [ "$suite_rc" = 0 ]; then cp $LOGDIR/r4k_tpu_suite.log /root/repo/TPU_SUITE_r04.txt; fi
echo "ALL DONE $(date)" >> $LOGDIR/r4k_driver.log

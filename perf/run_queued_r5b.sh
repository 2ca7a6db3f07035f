#!/bin/sh
# Round-5 artifact regeneration after the review-fix commit: TPU suite at
# HEAD, then the full bench in the same session (VERDICT #2's "suite and
# bench at true HEAD" requirement).
set -u
cd /root/repo
JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
PYTHONPATH=/root/repo:/root/.axon_site \
FFTCONV_TEST_TPU=1 \
python -m pytest tests/ -q > /tmp/tpu_suite_r05b.log 2>&1
echo "suite rc=$?" >> /tmp/tpu_suite_r05b.log
JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
PYTHONPATH=/root/repo:/root/.axon_site \
python bench.py > /tmp/bench_r05b.log 2>&1
echo "bench done rc=$?" >> /tmp/bench_r05b.log

#!/bin/sh
# Round-5 artifact sequence: wait for the running TPU suite (pid in
# /tmp/tpusuite.pid) to finish, then run the full bench on the same
# HEAD — VERDICT #2's "suite and bench in one session" requirement.
set -u
PID=$(cat /tmp/tpusuite.pid)
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
cd /root/repo
JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
PYTHONPATH=/root/repo:/root/.axon_site \
python bench.py > /tmp/bench_r05.log 2>&1
echo "bench done rc=$?" >> /tmp/bench_r05.log

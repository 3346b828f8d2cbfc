#!/bin/bash
# Round-4 TPU measurement queue (run once the axon relay returns).
#
# Waits for 127.0.0.1:8093, SIGSTOPs the CPU production-eval python (child
# of /tmp/r4_queue3.pid) so the single core is quiet during relay timing,
# runs the four queued measurements sequentially (relay is exclusive per
# process), then SIGCONTs the eval. Status: /tmp/r4_tpu_queue.status.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

STATUS=/tmp/r4_tpu_queue.status
: > "$STATUS"

# 1. wait for the relay (up to 12 h)
for i in $(seq 1 1440); do
  if timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8093' 2>/dev/null; then
    echo "RELAY_UP $(date -Is)" >> "$STATUS"; break
  fi
  sleep 30
done
if ! grep -q RELAY_UP "$STATUS"; then
  echo "RELAY_NEVER_RETURNED $(date -Is)" >> "$STATUS"; exit 1
fi

# 2. pause the CPU eval's python children (specific parent PID, no patterns)
PAUSED=""
if [ -f /tmp/r4_queue3.pid ] && kill -0 "$(cat /tmp/r4_queue3.pid)" 2>/dev/null; then
  PAUSED=$(pgrep -P "$(cat /tmp/r4_queue3.pid)" || true)
  for p in $PAUSED; do kill -STOP "$p" 2>/dev/null; done
  echo "PAUSED_CPU_EVAL pids=$PAUSED" >> "$STATUS"
fi
resume() { for p in $PAUSED; do kill -CONT "$p" 2>/dev/null; done; echo "RESUMED_CPU_EVAL" >> "$STATUS"; }
trap resume EXIT

# 3. the queue (each bounded; first compiles are slow)
timeout 3600 python bench.py > /tmp/r4_bench.log 2>&1
echo "bench rc=$?" >> "$STATUS"

timeout 2400 python scripts/interp_bench.py > /tmp/r4_interp.log 2>&1
echo "interp rc=$?" >> "$STATUS"

timeout 1200 python scripts/pallas_parity.py > /tmp/r4_pallas.log 2>&1
echo "pallas rc=$?" >> "$STATUS"

timeout 1200 python scripts/hist_dtype_bench.py > /tmp/r4_hist.log 2>&1
echo "hist rc=$?" >> "$STATUS"

echo "TPU_QUEUE_DONE $(date -Is)" >> "$STATUS"

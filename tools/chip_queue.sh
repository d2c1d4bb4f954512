#!/bin/bash
# Serial chip-job queue with TPU health gating and wedge detection.
#
# The tunneled v5e runtime intermittently (a) wedges individual processes —
# the axon tunnel threads die and the client blocks forever in C (see
# run_with_stall_guard.sh) — and (b) goes fully unresponsive for minutes.
# Each stage therefore: waits for a trivial matmul to succeed, runs under
# the stall guard, and retries up to 3 times. Output: /tmp/chip_queue.log.
#
# Usage: nohup tools/chip_queue.sh > /dev/null 2>&1 &   (from repo root)
cd "$(dirname "$0")/.." || exit 1
G=tools/run_with_stall_guard.sh
LOG=/tmp/chip_queue.log

healthy() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); (x @ x).block_until_ready()" >/dev/null 2>&1
}

wait_healthy() {
  for i in $(seq 1 60); do
    healthy && return 0
    echo "=== tpu unhealthy, waiting ($i) $(date +%H:%M:%S)" >> $LOG
    sleep 120
  done
  return 1
}

run() {
  local name="$1"; shift
  for att in 1 2 3; do
    wait_healthy || { echo "=== $name: tpu never recovered" >> $LOG; return 1; }
    echo "=== $name attempt $att start $(date +%H:%M:%S)" >> $LOG
    $G "$@" >> $LOG 2>&1
    local rc=$?
    echo "=== $name attempt $att rc=$rc $(date +%H:%M:%S)" >> $LOG
    [ $rc -eq 0 ] && return 0
    sleep 20
  done
  echo "=== $name gave up" >> $LOG
}

run mixed2        1800 python tools/measure_offline.py mixed2
run int4a8        1800 python tools/measure_offline.py int4a8
run shallow_calib 1500 python tools/measure_offline.py shallow_calib
run reprobe       5400 python tools/reprobe_reasoning.py
run qlora         3600 python tools/bench_train.py --probe --only qlora
run int4_cached   1500 python tools/measure_offline.py int4_cached
echo "=== QUEUE DONE $(date +%H:%M:%S)" >> $LOG

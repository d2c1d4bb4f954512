#!/bin/bash
# run_with_stall_guard.sh <hard_timeout_s> <cmd...>
# Runs cmd; kills it if its CPU time stays flat for 7 consecutive 60s
# samples (the tunneled TPU runtime wedges: a remote call blocks forever in
# C with zero CPU progress — observed 3x on 2026-08-20). Exit 97 = stalled.
HARD=$1; shift
"$@" &
PID=$!
SECS=0; LAST=-1; FLAT=0
while kill -0 $PID 2>/dev/null; do
  sleep 60; SECS=$((SECS+60))
  CPU=$(awk '{print $14+$15}' /proc/$PID/stat 2>/dev/null || echo -2)
  if [ "$CPU" = "$LAST" ]; then FLAT=$((FLAT+1)); else FLAT=0; fi
  LAST=$CPU
  if [ $FLAT -ge 7 ]; then
    echo "[stall-guard] no CPU progress for 7 min; killing $PID" >&2
    kill -9 $PID 2>/dev/null; wait $PID 2>/dev/null; exit 97
  fi
  if [ $SECS -ge $HARD ]; then
    echo "[stall-guard] hard timeout ${HARD}s; killing $PID" >&2
    kill -9 $PID 2>/dev/null; wait $PID 2>/dev/null; exit 98
  fi
done
wait $PID

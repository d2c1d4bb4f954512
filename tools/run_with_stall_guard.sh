#!/bin/bash
# run_with_stall_guard.sh <hard_timeout_s> <cmd...>
#
# Runs cmd, watching for the tunneled-TPU wedge signature observed 3x on
# 2026-08-20: the axon tunnel connection drops, the client's
# axon-conn-read/axon-conn-write threads exit, and the main thread blocks
# forever in C with zero CPU (SIGALRM handlers can't run there either).
# A healthy chip job — including a legitimately slow server-side compile —
# always keeps its axon-conn-read thread alive, so "no axon-conn thread
# for 3 consecutive 60s samples after warmup" is a precise kill signal.
# Exit 97 = wedged-and-killed, 98 = hard timeout.
HARD=$1; shift
"$@" &
PID=$!
SECS=0; NOCONN=0
while kill -0 $PID 2>/dev/null; do
  sleep 60; SECS=$((SECS+60))
  CONN=0
  for t in /proc/$PID/task/*; do
    case "$(cat "$t/comm" 2>/dev/null)" in axon-conn*) CONN=1;; esac
  done
  if [ $SECS -ge 180 ] && [ $CONN -eq 0 ]; then
    NOCONN=$((NOCONN+1))
  else
    NOCONN=0
  fi
  if [ $NOCONN -ge 3 ]; then
    echo "[stall-guard] axon tunnel threads gone for 3 min; killing $PID" >&2
    kill -9 $PID 2>/dev/null; wait $PID 2>/dev/null; exit 97
  fi
  if [ $SECS -ge $HARD ]; then
    echo "[stall-guard] hard timeout ${HARD}s; killing $PID" >&2
    kill -9 $PID 2>/dev/null; wait $PID 2>/dev/null; exit 98
  fi
done
wait $PID

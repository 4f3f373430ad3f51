#!/bin/bash
# Serialized TPU job runner: every invocation holds an exclusive flock on
# /tmp/tpu.lock for the duration of its command (the tunnel TPU is
# single-tenant; concurrent clients block each other).
# Usage: tpu_queue.sh <logfile> <timeout_s> <cmd...>
LOG=$1; TMO=$2; shift 2
cd /root/repo
export PYTHONUNBUFFERED=1
(
  flock -x 9
  date >> "$LOG"
  echo "== $* ==" >> "$LOG"
  timeout "$TMO" "$@" >> "$LOG" 2>&1
  echo "== rc=$? ==" >> "$LOG"
  date >> "$LOG"
) 9>/tmp/tpu.lock

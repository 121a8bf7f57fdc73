#!/bin/bash
# Keep trying to prime the TPU compile cache until it succeeds once.
# Survives remote-compile-service outages by retrying every 10 min.
# Log: scripts/prime_r3.log   Success marker: scripts/.prime_done
cd /root/repo
LOG=scripts/prime_r3.log
MARKER=scripts/.prime_done
for i in $(seq 1 40); do
  if [ -f "$MARKER" ]; then exit 0; fi
  echo "=== prime attempt $i $(date -u +%H:%M:%S) ===" >> "$LOG"
  if timeout 5400 python -u scripts/prime_cache.py >> "$LOG" 2>&1; then
    touch "$MARKER"
    echo "=== primed ok $(date -u +%H:%M:%S) ===" >> "$LOG"
    exit 0
  fi
  echo "=== attempt $i failed rc=$? $(date -u +%H:%M:%S); sleeping ===" >> "$LOG"
  sleep 600
done

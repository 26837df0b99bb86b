#!/bin/bash
# Unattended trigger for the round-4 hardware evidence chain: wait for the
# tunnel watcher to report UP (/tmp/tpu_status.txt), wait for any running
# pytest to finish (CPU contention corrupts TPU timings — CLAUDE.md), then
# run run_evidence_chain.sh exactly once.  Lock file prevents double runs.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/evidence
LOCK=/tmp/evidence/chain.lock
while true; do
  if grep -q UP /tmp/tpu_status.txt 2>/dev/null; then
    # don't start while the CPU test suite is running on this 1-vCPU box
    if ls /proc/*/cmdline 2>/dev/null | xargs -I{} sh -c 'tr "\0" " " < {} 2>/dev/null' | grep -q "[p]ytest tests"; then
      sleep 60
      continue
    fi
    if mkdir "$LOCK" 2>/dev/null; then
      echo "chain starting $(date +%H:%M:%S)" > /tmp/evidence/chain_status.txt
      bash benchmarks/run_evidence_chain.sh > /tmp/evidence/chain.log 2>&1
      rc=$?
      echo "chain done rc=$rc $(date +%H:%M:%S)" > /tmp/evidence/chain_status.txt
      exit $rc
    else
      exit 0   # another instance already ran / is running
    fi
  fi
  sleep 60
done

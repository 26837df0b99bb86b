#!/bin/bash
# Unattended trigger for the hardware evidence chain: wait for the
# tunnel watcher to report UP (/tmp/tpu_status.txt), wait for any running
# pytest to finish (CPU contention corrupts TPU timings — CLAUDE.md), then
# run run_evidence_chain.sh.  On failure (tunnel flap mid-chain) the
# watcher is restarted and the chain retries, up to 5 attempts.
# VIP_ROUND (default 05) names the artifacts: EVIDENCE_r$VIP_ROUND.md and
# BENCH_DETAILS_r$VIP_ROUND.json.  Round-4 postmortem: the running copy of
# this script predated the EVIDENCE-writing code, so the chain completed
# (rc=0) but never committed the artifact its commit message named — the
# snapshot block below is now the committed source of truth, and it always
# writes the file BEFORE git add so the two can't diverge again.
set -u
cd "$(dirname "$0")/.."
VIP_ROUND="${VIP_ROUND:-05}"
export VIP_ROUND
mkdir -p /tmp/evidence
LOCK=/tmp/evidence/chain.lock
attempts=0

# never run two watchers at once: concurrent TPU probe clients can deadlock
rearm_watcher() {
  old=$(cat /tmp/tunnel_watch.pid 2>/dev/null)
  if [ -n "${old:-}" ]; then kill "$old" 2>/dev/null; fi
  nohup bash benchmarks/tunnel_watch.sh >> /tmp/tunnel_watch.log 2>&1 &
  echo $! > /tmp/tunnel_watch.pid
}
while true; do
  if grep -q UP /tmp/tpu_status.txt 2>/dev/null; then
    # don't start while the CPU test suite is running on this 1-vCPU box
    if ls /proc/*/cmdline 2>/dev/null | xargs -I{} sh -c 'tr "\0" " " < {} 2>/dev/null' | grep -q "[p]ytest tests"; then
      sleep 60
      continue
    fi
    # the status file can be stale (the watcher exits after its first UP):
    # re-probe before committing to a multi-hour chain run
    if ! timeout 120 env JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python -c "
import jax; d = jax.devices(); assert d and d[0].platform == 'tpu', d
" >/dev/null 2>&1; then
      echo "DOWN reprobe" > /tmp/tpu_status.txt
      rearm_watcher
      sleep 240
      continue
    fi
    if mkdir "$LOCK" 2>/dev/null; then
      attempts=$((attempts + 1))
      echo "chain attempt $attempts starting $(date +%H:%M:%S)" > /tmp/evidence/chain_status.txt
      bash benchmarks/run_evidence_chain.sh > /tmp/evidence/chain_attempt$attempts.log 2>&1
      rc=$?
      echo "chain attempt $attempts done rc=$rc $(date +%H:%M:%S)" > /tmp/evidence/chain_status.txt
      if [ $rc -eq 0 ] || [ $attempts -ge 5 ]; then
        # Strand-proofing: snapshot the stage logs into the repo and commit
        # the evidence artifacts, in case no interactive session is alive
        # when the tunnel finally returns.
        {
          echo "# Round-$VIP_ROUND hardware evidence chain (unattended run)"
          echo
          echo "Chain rc=$rc after $attempts attempt(s), $(date -u +%Y-%m-%dT%H:%M:%SZ)."
          echo "Stages: revalidate_abf -> hw_parity -> validate_wexler_search ->"
          echo "baseline_configs (BENCH_DETAILS_r$VIP_ROUND.json) -> bench.py."
          for lg in abf hwparity wexsearch matrix bench; do
            echo; echo "## $lg (tail)"; echo '```'
            tail -30 /tmp/evidence/$lg.log 2>/dev/null
            echo '```'
          done
        } > "EVIDENCE_r$VIP_ROUND.md"
        git add "EVIDENCE_r$VIP_ROUND.md" BENCH_DETAILS.json "BENCH_DETAILS_r$VIP_ROUND.json" 2>/dev/null
        git commit -q -m "Hardware evidence chain: on-chip revalidation + benchmark matrix (rc=$rc)" || true
        exit $rc
      fi
      # failed — likely a tunnel flap: re-arm the watcher and retry
      rmdir "$LOCK"
      echo "DOWN rearm" > /tmp/tpu_status.txt
      rearm_watcher
      sleep 300
    else
      exit 0   # another instance already ran / is running
    fi
  fi
  sleep 60
done

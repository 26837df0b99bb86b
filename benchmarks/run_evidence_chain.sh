#!/bin/bash
# Hardware evidence chain.  Run as ONE command the moment the axon tunnel
# is up; each stage is a separate python process so only one TPU client
# exists at a time.  Logs to /tmp/evidence/*.log.
#
#   VIP_ROUND=05 bash benchmarks/run_evidence_chain.sh
#
# Order matters: parity/validation first (cheap, catches Mosaic rejections
# early), the long full matrix afterwards, headline bench last.
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export VIP_ROUND="${VIP_ROUND:-05}"
cd "$(dirname "$0")/.."
mkdir -p /tmp/evidence
overall=0
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ==="
  # generous per-stage timeouts: killing a TPU client mid-compile wedges
  # the remote compiler ~20 min (CLAUDE.md) — only true hangs may die
  timeout "$tmo" "$@" >/tmp/evidence/$name.log 2>&1
  rc=$?
  echo "--- $name rc=$rc (tail) ---"
  tail -25 /tmp/evidence/$name.log
  if [ $rc -ne 0 ]; then overall=1; fi
}
run abf        3000 python benchmarks/revalidate_abf.py
run hwparity   3600 python benchmarks/hw_parity.py
run wexsearch  3600 python benchmarks/validate_wexler_search.py
run matrix     7200 python benchmarks/baseline_configs.py
run bench      1800 python bench.py
echo "=== evidence chain overall rc=$overall ==="
exit $overall

#!/bin/bash
# Poll the axon TPU tunnel until it answers, then stop (so the probe can
# never collide with a real TPU client once the tunnel is usable).
# Status file: /tmp/tpu_status.txt  (DOWN <ts> | UP <ts>)
while true; do
  ts=$(date +%H:%M:%S)
  if timeout 90 env JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python -c "
import jax
d = jax.devices()
assert d and d[0].platform == 'tpu', d
" >/dev/null 2>&1; then
    echo "UP $ts" > /tmp/tpu_status.txt
    exit 0
  fi
  echo "DOWN $ts" > /tmp/tpu_status.txt
  sleep 240
done

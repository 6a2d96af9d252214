#!/bin/bash
# Poll the axon TPU tunnel until it is alive, then exit 0.
# The tunnel dies occasionally (the register() call in the axon
# sitecustomize then hangs every `import jax`); only host infra can
# restore it. Probe = full import + devices() + one tiny compile, each
# attempt under a hard timeout, logged with timestamps.
LOG=${1:-/tmp/tunnel_poll.log}
MAX_S=${2:-43200}
START=$(date +%s)
while true; do
  NOW=$(date +%s)
  if [ $((NOW - START)) -gt "$MAX_S" ]; then
    echo "$(date -u +%FT%TZ) giving up after ${MAX_S}s" >> "$LOG"
    exit 1
  fi
  timeout 90 python -u -c "
import time, jax, jax.numpy as jnp
d = jax.devices()
y = (jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()
print('ALIVE', d)
" >> "$LOG" 2>&1
  RC=$?
  if [ $RC -eq 0 ]; then
    echo "$(date -u +%FT%TZ) tunnel ALIVE" >> "$LOG"
    exit 0
  fi
  echo "$(date -u +%FT%TZ) probe rc=$RC (dead), sleeping 180s" >> "$LOG"
  sleep 180
done

#!/bin/bash
# Loop until the axon TPU tunnel answers a basic jit matmul, then exit 0.
# Each attempt is a fresh short-lived python process under timeout.
for i in $(seq 1 400); do
  if timeout 75 python - <<'PY' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((128,128))
(x @ x).block_until_ready()
PY
  then
    echo "TPU tunnel UP at $(date)"
    exit 0
  fi
  echo "attempt $i down at $(date)"
  sleep 90
done
echo "TPU never returned"
exit 1

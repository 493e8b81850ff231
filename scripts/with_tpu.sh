#!/bin/bash
# Wait until the TPU tunnel accepts a fresh client, then exec the real job.
# (A client starting while the previous one is tearing down can wedge on a
# futex forever; a cheap probe subprocess absorbs that risk instead.)
for i in $(seq 1 40); do
  if timeout 90 python -c "import jax, jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
    sleep 5
    exec "$@"
  fi
  echo "tpu preflight attempt $i failed; retrying" >&2
  sleep 30
done
echo "TPU never became available" >&2
exit 1

#!/bin/bash
# Launch a TPU job robustly:
# 1. probe the tunnel with a throwaway client until it answers;
# 2. run the job; if it exits 17 (ensure_device_alive watchdog: client was
#    born with a dead transport), wait and relaunch with a fresh client.
probe() {
  timeout 90 python -c "import jax, jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" >/dev/null 2>&1
}
for attempt in $(seq 1 8); do
  for i in $(seq 1 40); do
    probe && break
    echo "tpu preflight attempt $i failed; retrying" >&2
    sleep 30
  done
  sleep 5
  "$@"
  rc=$?
  [ $rc -ne 17 ] && exit $rc
  echo "job client was wedged at birth (rc=17); relaunching (attempt $attempt)" >&2
  sleep 45
done
echo "giving up after 8 wedged launches" >&2
exit 1

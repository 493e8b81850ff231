#!/bin/bash
# Launch a TPU job robustly. The tunnel hands out good and wedged client
# slots unpredictably; a wedged client cannot error — it hangs. Strategy:
# one initial probe (fail fast if the tunnel is fully down), then launch
# the job directly and rely on its ensure_device_alive watchdog (rc=17) to
# cycle through slots WITHOUT interleaving extra probe clients (a probe can
# consume the next good slot and leave the job the broken one).
probe() {
  timeout 90 python -c "import jax, jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" >/dev/null 2>&1
}
for i in $(seq 1 40); do
  probe && break
  echo "tpu preflight attempt $i failed; retrying" >&2
  sleep 30
done
export LR_DEVICE_ALIVE_TIMEOUT=${LR_DEVICE_ALIVE_TIMEOUT:-75}
# Mid-run wedge guard (round 4: a healthy job wedged at step ~2200 — zero
# CPU, no exception, forever). Training/encode loops beat a StepWatchdog;
# 900s of no progress -> exit 17 -> relaunched below, resumes from the
# last checkpoint. 900 >> the worst legit gap (~5 min first-step compile).
export LR_STEP_WATCHDOG_S=${LR_STEP_WATCHDOG_S:-900}
for attempt in $(seq 1 12); do
  sleep 5
  "$@"
  rc=$?
  [ $rc -ne 17 ] && exit $rc
  echo "job client was wedged at birth (rc=17); relaunching (attempt $attempt)" >&2
done
echo "giving up after 12 wedged launches" >&2
exit 1

#!/bin/bash
# Round-5 chain supervisor. with_tpu.sh gives up after 12 wedged client
# launches (~16 min); real tunnel outages (driver resets) can last longer,
# which killed the chain once this round. This loop relaunches r5b_chain.sh
# whenever it dies with stages still pending — each relaunch skips banked
# stages via the $A/.done_<name> markers, so retrying is free.
#
# Usage: setsid nohup bash scripts/r5_supervisor.sh > /tmp/supervisor.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
A=${1:-.artifacts}
CHAIN=${CHAIN:-scripts/r5b_chain.sh}
# Every stage the chain can produce, in order (must match $CHAIN).
STAGES=(speedup_r5 q_proj_s1 pooled_sig cheader_ft rr_proj_s1 big_pt q_big
        rr_big mine_neural rr_neural q_asym q_mrl_w q_s2 rr_np16 rr_dw)
echo $$ > /tmp/supervisor.pid

all_done() {
  for s in "${STAGES[@]}"; do
    [ -f "$A/.done_$s" ] || return 1
  done
  return 0
}

chain_alive() {
  [ -f /tmp/chain.pid ] && kill -0 "$(cat /tmp/chain.pid)" 2>/dev/null
}

while true; do
  if all_done; then echo "[sup] all stages done $(date -u +%H:%M:%S)"; exit 0; fi
  if ! chain_alive; then
    echo "[sup] chain dead, stages pending; cooling 120s then relaunching $(date -u +%H:%M:%S)"
    sleep 120   # let a wedged tunnel slot free itself (CLAUDE.md ~60s rule)
    if ! chain_alive; then   # re-check: an interactive relaunch may have won
      setsid nohup bash "$CHAIN" >> /tmp/r5b_chain.log 2>&1 < /dev/null &
      echo "[sup] relaunched $(date -u +%H:%M:%S)"
      sleep 60
    fi
  fi
  sleep 60
done

"""Claim exclusive use of the tunneled TPU chip before a benchmark run.

The axon tunnel serves ONE client at a time (CLAUDE.md): if the driver's
end-of-round ``bench.py`` starts while a round-study job (quality_study /
rerank_study / lm_pretrain chain) still holds the chip, the bench client
wedges on a futex at its first jax call and the round's BENCH artifact is
lost. Worse, even *probing* while another client computes can wedge the
tunnel for both.

So the claim protocol is strictly ordered:

1. Read every ``/tmp/*.pid`` file this repo's chains write, keep only pids
   that are alive AND whose /proc cmdline references this repo's study
   scripts (never pattern-kill: exact recorded pids only, cmdline-verified).
2. Expand each root to its full descendant set via one /proc scan
   (``bash with_tpu.sh`` -> ``python quality_study.py`` chains), SIGTERM,
   grace, SIGKILL leftovers. The study jobs all checkpoint + auto-resume,
   so this loses at most one checkpoint interval of work.
3. Wait for the tunnel to free the slot (~60s after the holder dies), then
   probe with a SUBPROCESS jax client under a timeout — a wedged probe must
   never hang the caller — retrying until a trivial op completes.

Only then may the caller make its first in-process jax call.
"""
from __future__ import annotations

import glob
import os
import signal
import subprocess
import sys
import time

# A recorded pid is only ours if its cmdline mentions one of these.
_STUDY_MARKERS = (
    "quality_study", "rerank_study", "lm_pretrain", "with_tpu",
    "r4_chain", "r5_chain", "r5b_chain", "r5c_chain", "r5d_chain",
    "serving_latency", "sparse_engine",
    "rerank_predictions", "bm25_teacher", "harvest_pretrain",
    "mine_neural_negatives", "asym_speedup_table", "r5_supervisor",
)

_PROBE = ("import jax, jax.numpy as jnp; "
          "(jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()")


def _cmdline(pid: int) -> str:
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            return f.read().replace(b"\0", b" ").decode(errors="replace")
    except OSError:
        return ""


def _descendants(roots: set[int]) -> set[int]:
    """One /proc scan -> ppid edges -> BFS from roots (roots included)."""
    children: dict[int, list[int]] = {}
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/stat") as f:
                stat = f.read()
            # field 4 = ppid; comm (field 2) may contain spaces, parse after ')'
            ppid = int(stat.rsplit(")", 1)[1].split()[1])
        except (OSError, IndexError, ValueError):
            continue
        children.setdefault(ppid, []).append(int(entry))
    out, frontier = set(roots), list(roots)
    while frontier:
        for child in children.get(frontier.pop(), ()):
            if child not in out:
                out.add(child)
                frontier.append(child)
    return out


def _study_roots(pid_dir: str) -> set[int]:
    roots: set[int] = set()
    me = os.getpid()
    for path in glob.glob(os.path.join(pid_dir, "*.pid")):
        try:
            pid = int(open(path).read().strip())
        except (OSError, ValueError):
            continue
        if pid == me or pid <= 1:
            continue
        cmd = _cmdline(pid)
        if cmd and any(m in cmd for m in _STUDY_MARKERS):
            roots.add(pid)
    return roots


def _signal_all(pids: set[int], sig: int) -> None:
    for pid in pids:
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, sig)
        except OSError:
            pass


def probe_chip(timeout: float = 90.0) -> bool:
    """Touch the chip from a throwaway subprocess client (wedge-safe)."""
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE], timeout=timeout,
                           stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def claim_chip(pid_dir: str = "/tmp", probe_attempts: int = 8,
               settle_seconds: float = 60.0, verbose: bool = True) -> bool:
    """Free + verify the chip. Returns True when a probe succeeded.

    MUST be called before the caller's first jax call (backend init included
    — ``jax.default_backend()`` creates the client).
    """
    log = (lambda m: print(m, file=sys.stderr)) if verbose else (lambda m: None)
    roots = _study_roots(pid_dir)
    if roots:
        tree = _descendants(roots)
        live = {p for p in tree if _cmdline(p)}
        log(f"[claim_chip] terminating study jobs (checkpointed): {sorted(live)}")
        _signal_all(live, signal.SIGTERM)
        deadline = time.time() + 15
        while time.time() < deadline and any(_cmdline(p) for p in live):
            time.sleep(1)
        leftovers = {p for p in live if _cmdline(p)}
        if leftovers:
            _signal_all(leftovers, signal.SIGKILL)
        log(f"[claim_chip] waiting {settle_seconds:.0f}s for the tunnel "
            "slot to free")
        time.sleep(settle_seconds)
    for attempt in range(probe_attempts):
        if probe_chip():
            return True
        log(f"[claim_chip] probe {attempt + 1}/{probe_attempts} failed; "
            "retrying in 30s")
        time.sleep(30)
    log("[claim_chip] chip never came back; proceeding anyway")
    return False

"""claim_chip: the bench-time single-tunnel-slot guard (CLAUDE.md one-client
rule). Verifies the pid-file discovery is exact (recorded pids only,
cmdline-verified — never pattern matching), the descendant walk reaches the
``with_tpu.sh -> python`` chain, and unrelated processes are untouched."""
import os
import signal
import subprocess
import time

from lightretriever_tpu.utils.chip_claim import (
    _descendants, _study_roots, claim_chip)


def _spawn(tag):
    # $0 carries the tag into /proc/<pid>/cmdline without running anything
    # named like a study script.
    return subprocess.Popen(["sh", "-c", "sleep 60", tag],
                            stdout=subprocess.DEVNULL)


def test_study_roots_requires_marker(tmp_path):
    ours = _spawn("quality_study-dummy")
    other = _spawn("innocent-bystander")
    try:
        (tmp_path / "a.pid").write_text(str(ours.pid))
        (tmp_path / "b.pid").write_text(str(other.pid))
        (tmp_path / "stale.pid").write_text("999999999")
        (tmp_path / "junk.pid").write_text("not-a-pid")
        roots = _study_roots(str(tmp_path))
        assert roots == {ours.pid}
    finally:
        for p in (ours, other):
            p.kill()
            p.wait()


def test_descendants_walk():
    # parent sh spawns a child sleep; walk from the parent must include both
    parent = subprocess.Popen(["sh", "-c", "sleep 60 & wait"],
                              stdout=subprocess.DEVNULL)
    time.sleep(0.3)
    try:
        tree = _descendants({parent.pid})
        assert parent.pid in tree
        assert len(tree) >= 2  # the backgrounded sleep
    finally:
        for pid in _descendants({parent.pid}):
            try:
                os.kill(pid, signal.SIGKILL)
            except OSError:
                pass
        parent.wait()


def test_claim_chip_kills_only_recorded_tree(tmp_path):
    ours = _spawn("rerank_study-dummy")
    bystander = _spawn("innocent-bystander")
    (tmp_path / "run.pid").write_text(str(ours.pid))
    try:
        # probe_attempts=0 -> no chip probing (CPU test env); settle=0
        claim_chip(pid_dir=str(tmp_path), probe_attempts=0,
                   settle_seconds=0, verbose=False)
        deadline = time.time() + 5
        while time.time() < deadline and ours.poll() is None:
            time.sleep(0.1)
        assert ours.poll() is not None, "recorded study job not terminated"
        assert bystander.poll() is None, "unrelated process was killed"
    finally:
        for p in (ours, bystander):
            if p.poll() is None:
                p.kill()
            p.wait()


def test_claim_chip_noop_without_pidfiles(tmp_path):
    assert claim_chip(pid_dir=str(tmp_path), probe_attempts=0,
                      settle_seconds=0, verbose=False) is False

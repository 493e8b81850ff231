"""StepWatchdog: mid-run wedge guard (inference/utils.py).

The tunnel runtime can wedge MID-RUN (round 4: after ~2k healthy train
steps the next dispatch blocked forever — zero CPU, no exception). The
watchdog turns that silent hang into the rc=17 relaunch contract that
ensure_device_alive already uses for birth wedges (with_tpu.sh retries,
the trainer resumes from its last checkpoint).
"""
import time

import pytest

from lightretriever_tpu.inference.utils import StepWatchdog


@pytest.fixture(scope="module")
def tok():
    from tests.tokenizer_fixture import make_tiny_tokenizer

    return make_tiny_tokenizer()


def test_fires_without_beats():
    fired = []
    wd = StepWatchdog(0.15, exit_fn=fired.append)
    time.sleep(0.6)
    wd.stop()
    assert fired == [17]


def test_beats_keep_it_alive_and_stop_silences_it():
    fired = []
    wd = StepWatchdog(0.3, exit_fn=fired.append)
    for _ in range(5):
        time.sleep(0.1)
        wd.beat()
    wd.stop()
    time.sleep(0.5)
    assert fired == []


def test_from_env_gates_on_var(monkeypatch):
    monkeypatch.delenv("LR_STEP_WATCHDOG_S", raising=False)
    assert StepWatchdog.from_env() is None
    monkeypatch.setenv("LR_STEP_WATCHDOG_S", "0")
    assert StepWatchdog.from_env() is None
    monkeypatch.setenv("LR_STEP_WATCHDOG_S", "not-a-number")
    assert StepWatchdog.from_env() is None
    monkeypatch.setenv("LR_STEP_WATCHDOG_S", "30")
    wd = StepWatchdog.from_env(exit_fn=lambda code: None)
    assert wd is not None and wd.timeout_s == 30.0
    wd.stop()


def test_custom_exit_code():
    fired = []
    wd = StepWatchdog(0.1, exit_code=23, exit_fn=fired.append)
    time.sleep(0.4)
    wd.stop()
    assert fired == [23]


def test_trainer_loop_wires_the_watchdog(monkeypatch, tok):
    """train() must install + beat the watchdog: with the env var set, a
    healthy (fast) loop constructs one, beats it every step, never fires,
    and stops it on exit."""
    created = []
    fired = []
    monkeypatch.setenv("LR_STEP_WATCHDOG_S", "60")
    orig_init = StepWatchdog.__init__

    def spy_init(self, timeout_s, exit_code=17, exit_fn=None, name="step"):
        orig_init(self, timeout_s, exit_code=exit_code,
                  exit_fn=fired.append, name=name)
        created.append(self)

    monkeypatch.setattr(StepWatchdog, "__init__", spy_init)
    from tests.test_training import _groups, _make_trainer
    from lightretriever_tpu.training.data import train_dataloader

    trainer, col = _make_trainer(tok, max_steps=3)
    trainer.train_iter = train_dataloader(iter(_groups(16)), col, batch_size=8)
    trainer.train()
    train_wds = [w for w in created if w._name == "train"]
    assert len(train_wds) == 1, "train() must install exactly one watchdog"
    wd = train_wds[0]
    assert fired == [] and wd._stopped.is_set()
    assert wd.timeout_s == 60.0


if __name__ == "__main__":
    import sys

    import pytest

    sys.exit(pytest.main([__file__, "-q"]))

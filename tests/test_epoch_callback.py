"""The shared epoch loop's ``epoch_callback`` hook: per-epoch observables
(cloak sigma statistics — the reference prints these every epoch,
/root/reference/training/training_cloak.py:429-438) merge into each history
entry so trainers and parity harnesses can overlay optimization dynamics,
not just endpoints."""

import numpy as np

from sept_tpu.train import ExperimentConfig
from sept_tpu.train.device_loop import _run_epoch_loop


class _State:
    def __init__(self, v):
        self.v = v


def _loop(cfg, callback):
    def train_epoch(st, epoch, order):
        return _State(st.v + 1.0), {"loss": 1.0 / (epoch + 1), "acc": 0.5}

    def val_epoch(st):
        return {"loss": 1.0 / st.v, "acc": st.v / 10.0, "uar": 0.5}

    return _run_epoch_loop(
        _State(0.0), cfg,
        train_epoch=train_epoch,
        val_epoch=val_epoch,
        test_epoch=lambda st: {"acc": 0.5, "uar": 0.5,
                               "conf": np.zeros((2, 2))},
        m_total=8, needs_order=True, resume_path=None,
        replicate=lambda st: st, verbose=False,
        epoch_callback=callback,
    )


def test_epoch_callback_merges_into_every_history_entry():
    cfg = ExperimentConfig(num_epochs=4, min_select_epoch=1,
                           early_stop_patience=20, optimizer="sgd")
    seen = []

    def cb(state):
        seen.append(state.v)
        return {"sigma_log_mean": float(np.log(state.v))}

    result = _loop(cfg, cb)
    assert len(result.history) == 4
    # callback sees the post-train-epoch state (v = 1, 2, 3, 4)
    assert seen == [1.0, 2.0, 3.0, 4.0]
    for i, entry in enumerate(result.history):
        assert entry["sigma_log_mean"] == float(np.log(i + 1.0))
        # the standard metric keys are untouched
        assert set(entry) >= {"train", "validate", "test", "sigma_log_mean"}


def test_no_callback_leaves_history_shape_unchanged():
    cfg = ExperimentConfig(num_epochs=3, min_select_epoch=1,
                           early_stop_patience=20, optimizer="sgd")
    result = _loop(cfg, None)
    assert len(result.history) == 3
    assert all(set(e) == {"train", "validate", "test"}
               for e in result.history)

"""Mid-fold (epoch-level) checkpoint/resume: an interrupted fold continues
from its last completed epoch with an identical trajectory."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sept_tpu.data.pipeline import SplitArrays
from sept_tpu.models import Conv2dBiRNN
from sept_tpu.train import (
    ExperimentConfig,
    init_state,
    make_eval_logits_fn,
    make_optimizer,
)
from sept_tpu.train.device_loop import fit_device

# multi-minute on one core: excluded from the default fast lane (pyproject addopts)
pytestmark = pytest.mark.slow

T, D = 40, 32
KEY = jax.random.PRNGKey(8)


def _split(n, seed):
    rng = np.random.default_rng(seed)
    return SplitArrays(
        windows=rng.standard_normal((n, T, D)).astype(np.float32),
        labels_emo=(np.arange(n) % 4).astype(np.int32),
        labels_gen=(np.arange(n) % 2).astype(np.int32),
        lengths=np.full(n, T, np.int32),
        global_data=np.zeros((n, 88), np.float32),
        speaker_ids=np.array(["s"] * n), datasets=np.array(["synthetic"] * n),
        utt_ids=np.array([f"u{i}" for i in range(n)]),
    )


def _run(cfg, resume_path=None):
    model = Conv2dBiRNN(hidden_size=8, pred="emotion", dropout_rate=0.0)
    tx = make_optimizer(cfg, steps_per_epoch=2)
    tr, va, te = _split(32, 0), _split(16, 1), _split(8, 2)
    b0 = {"spec": jnp.asarray(tr.windows[:16])[..., None],
          "labels_emo": jnp.asarray(tr.labels_emo[:16]),
          "labels_gen": jnp.asarray(tr.labels_gen[:16]),
          "global": jnp.zeros((16, 88)), "weight": jnp.ones(16)}
    state = init_state(model, tx, KEY, b0)
    return fit_device(state, model, tx, tr, va, te, cfg,
                      make_eval_logits_fn(model), verbose=False,
                      resume_path=resume_path)


def test_resume_reproduces_uninterrupted_run(tmp_path, monkeypatch):
    cfg4 = ExperimentConfig(optimizer="sgd", learning_rate=1e-3,
                            hidden_size=8, batch_size=16, win_len=T,
                            num_epochs=4, min_select_epoch=0,
                            weight_decay=0.0)
    ref = _run(cfg4)  # uninterrupted 4 epochs

    # "interrupt" after 2 epochs: run num_epochs=2 with the delete-on-finish
    # suppressed, leaving the mid-fold checkpoint behind
    from sept_tpu.train.midfold import MidFoldCheckpoint

    mid_dir = str(tmp_path / "mid")
    cfg2 = ExperimentConfig(optimizer="sgd", learning_rate=1e-3,
                            hidden_size=8, batch_size=16, win_len=T,
                            num_epochs=2, min_select_epoch=0,
                            weight_decay=0.0)
    monkeypatch.setattr(MidFoldCheckpoint, "delete", lambda self: None)
    _run(cfg2, resume_path=mid_dir)
    monkeypatch.undo()
    assert MidFoldCheckpoint(mid_dir).exists()

    # resume with the full epoch budget: must continue at epoch 2 and land
    # exactly where the uninterrupted run did
    res = _run(cfg4, resume_path=mid_dir)
    assert len(res.history) == len(ref.history) == 4
    for h_ref, h_res in zip(ref.history, res.history):
        assert h_res["train"]["loss"] == pytest.approx(
            h_ref["train"]["loss"], rel=1e-6
        )
        assert h_res["validate"]["loss"] == pytest.approx(
            h_ref["validate"]["loss"], rel=1e-6
        )
    assert res.final_test_acc == pytest.approx(ref.final_test_acc, abs=1e-9)
    assert res.best_epoch == ref.best_epoch
    # fold completed -> the mid checkpoint is gone
    assert not MidFoldCheckpoint(mid_dir).exists()


def test_crash_window_leaves_consistent_checkpoint(tmp_path, monkeypatch):
    """loop.json is the atomic commit point: a kill AFTER the new epoch's
    Orbax state is written but BEFORE loop.json is replaced must leave the
    previous epoch's checkpoint fully restorable (old scheme: state said
    epoch N+1 while loop.json said N -> the epoch trained twice)."""
    import os

    from sept_tpu.train.midfold import MidFoldCheckpoint
    from sept_tpu.train.steps import TrainState

    def mk_state(v):
        return TrainState(
            params={"w": jnp.full((3,), float(v))}, batch_stats={},
            opt_state=(), rng=jax.random.PRNGKey(0),
            step=jnp.asarray(v, jnp.int32),
        )

    mid = MidFoldCheckpoint(str(tmp_path / "mid"))
    mid.save(mk_state(0), None, {"epoch": 0, "tag": "e0"})

    # simulate the kill: fail the atomic loop.json replace for epoch 1
    real_replace = os.replace

    def boom(src, dst, *a, **k):
        if dst.endswith("loop.json"):
            raise RuntimeError("killed before commit")
        return real_replace(src, dst, *a, **k)

    monkeypatch.setattr(os, "replace", boom)
    with pytest.raises(RuntimeError):
        mid.save(mk_state(1), None, {"epoch": 1, "tag": "e1"})
    monkeypatch.undo()

    assert mid.exists()
    state, best, loop = mid.restore(like=mk_state(0))
    assert loop["epoch"] == 0 and loop["tag"] == "e0"
    np.testing.assert_allclose(np.asarray(state.params["w"]), 0.0)

    # a later successful save commits epoch 1 and cleans up epoch 0
    mid.save(mk_state(1), mk_state(1), {"epoch": 1, "tag": "e1"})
    state, best, loop = mid.restore(like=mk_state(0))
    assert loop["epoch"] == 1
    np.testing.assert_allclose(np.asarray(state.params["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(best.params["w"]), 1.0)
    dirs = {d for d in os.listdir(mid.path)
            if os.path.isdir(os.path.join(mid.path, d))}
    assert dirs == {"state_e1", "best_e1"}


def test_resume_under_mesh_reproduces_uninterrupted_run(tmp_path, monkeypatch):
    """Mid-fold resume composes with data parallelism: a replicated state
    Orbax-saved mid-fold restores device-agnostically and is re-replicated
    over the mesh, continuing the identical trajectory."""
    from sept_tpu.parallel import make_mesh
    from sept_tpu.train.midfold import MidFoldCheckpoint

    mesh = make_mesh(8)

    def run(cfg, resume_path=None):
        model = Conv2dBiRNN(hidden_size=8, pred="emotion", dropout_rate=0.0,
                            bn_axis_name="data")
        tx = make_optimizer(cfg, steps_per_epoch=2)
        tr, va, te = _split(32, 0), _split(16, 1), _split(8, 2)
        b0 = {"spec": jnp.asarray(tr.windows[:16])[..., None],
              "labels_emo": jnp.asarray(tr.labels_emo[:16]),
              "labels_gen": jnp.asarray(tr.labels_gen[:16]),
              "global": jnp.zeros((16, 88)), "weight": jnp.ones(16)}
        state = init_state(model, tx, KEY, b0)
        return fit_device(state, model, tx, tr, va, te, cfg,
                          make_eval_logits_fn(model), verbose=False,
                          mesh=mesh, resume_path=resume_path)

    kw = dict(optimizer="sgd", learning_rate=1e-3, hidden_size=8,
              batch_size=16, win_len=T, min_select_epoch=0, weight_decay=0.0)
    ref = run(ExperimentConfig(num_epochs=4, **kw))

    mid_dir = str(tmp_path / "mid_dp")
    monkeypatch.setattr(MidFoldCheckpoint, "delete", lambda self: None)
    run(ExperimentConfig(num_epochs=2, **kw), resume_path=mid_dir)
    monkeypatch.undo()
    assert MidFoldCheckpoint(mid_dir).exists()

    res = run(ExperimentConfig(num_epochs=4, **kw), resume_path=mid_dir)
    assert len(res.history) == 4
    for h_ref, h_res in zip(ref.history, res.history):
        assert h_res["train"]["loss"] == pytest.approx(
            h_ref["train"]["loss"], rel=1e-6
        )
    assert res.final_test_acc == pytest.approx(ref.final_test_acc, abs=1e-9)
    assert res.best_epoch == ref.best_epoch

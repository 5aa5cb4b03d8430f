"""Scanned whole-epoch runner must match the per-step loop numerically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sept_tpu.models import Conv2dBiRNN
from sept_tpu.train import (
    ExperimentConfig,
    init_state,
    make_baseline_step,
    make_epoch_runner,
    make_optimizer,
)

# multi-minute on one core: excluded from the default fast lane (pyproject addopts)
pytestmark = pytest.mark.slow

T, D, M, BATCH = 32, 16, 24, 8


def test_epoch_runner_matches_per_step_loop():
    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-2,
                           weight_decay=0.0, hidden_size=8)
    model = Conv2dBiRNN(hidden_size=8, pred="emotion", dropout_rate=0.0)
    tx = make_optimizer(cfg, steps_per_epoch=100)

    key = jax.random.PRNGKey(8)
    windows = jax.random.normal(key, (M, T, D))
    labels = jnp.asarray(np.arange(M) % 4, jnp.int32)
    weights = jnp.ones(M)
    order = jnp.asarray(np.random.default_rng(0).permutation(M))

    sample = {
        "spec": windows[:BATCH][..., None],
        "labels_emo": labels[:BATCH],
        "labels_gen": labels[:BATCH] % 2,
        "global": jnp.zeros((BATCH, 88)),
        "weight": weights[:BATCH],
    }
    state0 = init_state(model, tx, key, sample)

    # per-step loop (dropout_rate=0 so the rng path is irrelevant to math,
    # but thread the SAME rng sequence anyway)
    step = make_baseline_step(model, tx)
    s = state0
    losses_loop = []
    n_batches = M // BATCH
    for i in range(n_batches):
        idx = jax.lax.dynamic_slice_in_dim(order, i * BATCH, BATCH)
        batch = {
            "spec": windows[idx][..., None],
            "labels_emo": labels[idx],
            "labels_gen": labels[idx] % 2,
            "global": jnp.zeros((BATCH, 88)),
            "weight": weights[idx],
        }
        s, m = step(s, batch)
        losses_loop.append(float(m["loss"]))

    run = make_epoch_runner(model, tx)
    s2, losses_scan, correct, counts = run(
        state0, windows, labels, weights, order,
        n_batches=n_batches, batch_size=BATCH,
    )

    np.testing.assert_allclose(np.asarray(losses_scan), losses_loop, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(counts), BATCH)


def test_fit_device_learns_and_tracks_best():
    """Device-resident fit: runs, learns above chance, tracks best state."""
    from sept_tpu.data import FoldPlan, assemble_fold, make_corpus
    from sept_tpu.train import make_eval_logits_fn
    from sept_tpu.train.device_loop import fit_device

    corpus = make_corpus(n_speakers=6, utts_per_speaker=6, seed=8)
    rng = np.random.default_rng(0)
    store = {}
    for u in corpus.manifest:
        # label-correlated fake features so learning is possible
        base = rng.standard_normal((24, 100)).astype(np.float32)
        base[ord(u.label[0]) % 24] += 3.0
        store[u.utt_id] = {"mel1": base}
    spk = sorted({u.speaker_id for u in corpus.manifest})
    plan = FoldPlan(1, tuple(spk[:3]), (spk[3],), (spk[4],), (spk[4],), (spk[5],))
    fold = assemble_fold(corpus.manifest, store, plan, dataset="synthetic",
                         feature_len=24, win_len=40, aug="emotion")
    from sept_tpu.models import Conv2dBiRNN
    from sept_tpu.train import ExperimentConfig, init_state, make_optimizer

    cfg = ExperimentConfig(win_len=40, feature_len=24, batch_size=8,
                           num_epochs=6, hidden_size=8, learning_rate=5e-3,
                           min_select_epoch=0, weight_decay=0.0)
    model = Conv2dBiRNN(hidden_size=8, pred="emotion")
    tx = make_optimizer(cfg, 10)
    sample = {
        "spec": jnp.zeros((8, 40, 24, 1)), "labels_emo": jnp.zeros(8, jnp.int32),
        "labels_gen": jnp.zeros(8, jnp.int32), "global": jnp.zeros((8, 88)),
        "weight": jnp.ones(8),
    }
    state = init_state(model, tx, jax.random.PRNGKey(8), sample)
    result = fit_device(state, model, tx, fold.training, fold.validation,
                        fold.test, cfg, make_eval_logits_fn(model),
                        verbose=False)
    assert len(result.history) >= 1
    assert result.history[-1]["train"]["loss"] < result.history[0]["train"]["loss"]
    assert result.final_test_uar >= 0.25  # at least chance with best-tracking


def test_cloak_epoch_runner_moves_only_noise():
    """Scanned cloak epoch: noise params move, frozen backbone bit-exact."""
    from sept_tpu.models import CloakedModel
    from sept_tpu.train import ExperimentConfig, make_cloak_optimizer
    from sept_tpu.train.steps import TrainState, make_cloak_epoch_runner

    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-2,
                           scale_lambda=0.1, hidden_size=8)
    backbone = Conv2dBiRNN(hidden_size=8, pred="emotion")
    model = CloakedModel(backbone=backbone, win_len=T, n_feats=D)
    key = jax.random.PRNGKey(8)
    windows = jax.random.normal(key, (M, T, D))
    v = jax.jit(model.init)({"params": key, "noise": key}, windows[:BATCH][..., None])
    tx = make_cloak_optimizer(cfg, 10, v["params"], ("noise",))
    state = TrainState(params=v["params"], batch_stats=v["batch_stats"],
                       opt_state=tx.init(v["params"]), rng=key,
                       step=jnp.zeros((), jnp.int32))
    run = make_cloak_epoch_runner(model, tx, scale_lambda=0.1)
    labels = jnp.asarray(np.arange(M) % 4, jnp.int32)
    order = jnp.asarray(np.arange(M))
    s1, losses, correct, counts = run(
        state, windows, labels, labels % 2, jnp.ones(M), order, None,
        n_batches=M // BATCH, batch_size=BATCH,
    )
    assert np.isfinite(np.asarray(losses)).all()
    assert float(jnp.max(jnp.abs(
        s1.params["noise"]["locs"] - state.params["noise"]["locs"]))) > 0
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     state.params["backbone"], s1.params["backbone"])
    assert max(jax.tree.leaves(d)) == 0.0


def test_epoch_runner_global_feature_matches_per_step_loop():
    """use_global: the scanned epoch must gather the per-window 88-dim
    global rows and match the per-step path exactly
    (baseline_models.py:208,244-245 concat semantics)."""
    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-2,
                           weight_decay=0.0, hidden_size=8)
    model = Conv2dBiRNN(hidden_size=8, pred="emotion")
    tx = make_optimizer(cfg, steps_per_epoch=100)

    key = jax.random.PRNGKey(8)
    windows = jax.random.normal(key, (M, T, D))
    gdata = jax.random.normal(jax.random.PRNGKey(9), (M, 88))
    labels = jnp.asarray(np.arange(M) % 4, jnp.int32)
    weights = jnp.ones(M)
    order = jnp.asarray(np.random.default_rng(0).permutation(M))

    sample = {
        "spec": windows[:BATCH][..., None],
        "labels_emo": labels[:BATCH],
        "labels_gen": labels[:BATCH] % 2,
        "global": gdata[:BATCH],
        "weight": weights[:BATCH],
    }
    state0 = init_state(model, tx, key, sample, use_global=True)
    model_nodrop = Conv2dBiRNN(hidden_size=8, pred="emotion", dropout_rate=0.0)

    step = make_baseline_step(model_nodrop, tx, use_global=True)
    s = state0
    n_batches = M // BATCH
    for i in range(n_batches):
        idx = jax.lax.dynamic_slice_in_dim(order, i * BATCH, BATCH)
        s, _ = step(s, {
            "spec": windows[idx][..., None], "labels_emo": labels[idx],
            "labels_gen": labels[idx] % 2, "global": gdata[idx],
            "weight": weights[idx],
        })

    run = make_epoch_runner(model_nodrop, tx, use_global=True)
    s2, losses, correct, counts = run(
        state0, windows, labels, weights, order,
        n_batches=n_batches, batch_size=BATCH, globals_=gdata,
    )
    for a, b in zip(jax.tree.leaves(s.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def _cloak_grl_setup(use_global):
    """Shared fixture: a CloakedModelGRL + frozen-noise optimizer + data."""
    from sept_tpu.models import CloakedModelGRL
    from sept_tpu.train import ExperimentConfig, make_cloak_optimizer
    from sept_tpu.train.steps import TrainState

    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-2,
                           scale_lambda=0.1, hidden_size=8)
    emo = Conv2dBiRNN(hidden_size=8, pred="emotion", dropout_rate=0.0)
    gen = Conv2dBiRNN(hidden_size=8, pred="gender", dropout_rate=0.0)
    model = CloakedModelGRL(emotion_backbone=emo, gender_backbone=gen,
                            win_len=T, n_feats=D, grl_lambda=0.1)
    key = jax.random.PRNGKey(8)
    windows = jax.random.normal(key, (M, T, D))
    gdata = jax.random.normal(jax.random.PRNGKey(9), (M, 88))
    g0 = gdata[:BATCH] if use_global else None
    v = jax.jit(model.init, static_argnames=())(
        {"params": key, "noise": key, "dropout": key},
        windows[:BATCH][..., None], global_feature=g0)
    tx = make_cloak_optimizer(cfg, 10, v["params"],
                              ("noise", "gender_backbone"))
    state = TrainState(params=v["params"], batch_stats=v["batch_stats"],
                       opt_state=tx.init(v["params"]), rng=key,
                       step=jnp.zeros((), jnp.int32))
    labels = jnp.asarray(np.arange(M) % 4, jnp.int32)
    return model, tx, state, windows, gdata, labels


def test_cloak_grl_epoch_runner_global_matches_per_step():
    """Scanned cloak+GRL epoch with use_global must equal the per-step GRL
    loop bit-for-bit: both split rng 3-ways per batch, so the noise/dropout
    streams line up, and the 88-dim global rows must be gathered per batch
    into both frozen-emotion and GRL-gender branches
    (cloak_models.py:110-118 concat semantics)."""
    from sept_tpu.train.steps import (
        make_cloak_epoch_runner,
        make_cloak_grl_step,
    )

    model, tx, state0, windows, gdata, labels = _cloak_grl_setup(True)
    order = jnp.asarray(np.random.default_rng(0).permutation(M))
    n_batches = M // BATCH

    step = make_cloak_grl_step(model, tx, scale_lambda=0.1, use_global=True)
    s = state0
    for i in range(n_batches):
        idx = jax.lax.dynamic_slice_in_dim(order, i * BATCH, BATCH)
        s, _ = step(s, {
            "spec": windows[idx][..., None], "labels_emo": labels[idx],
            "labels_gen": labels[idx] % 2, "global": gdata[idx],
            "weight": jnp.ones(BATCH),
        })

    run = make_cloak_epoch_runner(model, tx, scale_lambda=0.1, grl=True,
                                  use_global=True)
    s2, losses, correct, counts = run(
        state0, windows, labels, labels % 2, jnp.ones(M), order, None,
        n_batches=n_batches, batch_size=BATCH, globals_=gdata,
    )
    assert np.isfinite(np.asarray(losses)).all()
    for a, b in zip(jax.tree.leaves(s.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_cloak_epoch_runner_global_is_consumed():
    """Non-GRL scanned cloak epoch with use_global: the global rows must
    actually reach the frozen backbone (different globals -> different
    losses) and only noise params move."""
    from sept_tpu.models import CloakedModel
    from sept_tpu.train import ExperimentConfig, make_cloak_optimizer
    from sept_tpu.train.steps import TrainState, make_cloak_epoch_runner

    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-2,
                           scale_lambda=0.1, hidden_size=8)
    backbone = Conv2dBiRNN(hidden_size=8, pred="emotion")
    model = CloakedModel(backbone=backbone, win_len=T, n_feats=D)
    key = jax.random.PRNGKey(8)
    windows = jax.random.normal(key, (M, T, D))
    gdata = jax.random.normal(jax.random.PRNGKey(9), (M, 88))
    v = jax.jit(model.init)({"params": key, "noise": key},
                            windows[:BATCH][..., None],
                            global_feature=gdata[:BATCH])
    tx = make_cloak_optimizer(cfg, 10, v["params"], ("noise",))
    state = TrainState(params=v["params"], batch_stats=v["batch_stats"],
                       opt_state=tx.init(v["params"]), rng=key,
                       step=jnp.zeros((), jnp.int32))
    run = make_cloak_epoch_runner(model, tx, scale_lambda=0.1,
                                  use_global=True)
    labels = jnp.asarray(np.arange(M) % 4, jnp.int32)
    order = jnp.asarray(np.arange(M))
    s1, losses1, _, _ = run(
        state, windows, labels, labels % 2, jnp.ones(M), order, None,
        n_batches=M // BATCH, batch_size=BATCH, globals_=gdata,
    )
    _, losses2, _, _ = run(
        state, windows, labels, labels % 2, jnp.ones(M), order, None,
        n_batches=M // BATCH, batch_size=BATCH, globals_=gdata * 3.0,
    )
    assert np.isfinite(np.asarray(losses1)).all()
    assert float(jnp.max(jnp.abs(losses1 - losses2))) > 0
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     state.params["backbone"], s1.params["backbone"])
    assert max(jax.tree.leaves(d)) == 0.0


def test_deep_model_pooling_consistent_train_eval():
    """Regression: the 'deep' model types flatten the RNN sequence
    (pooling=None, training_cloak.py:132).  Training steps and epoch
    runners must apply the SAME pooling as evaluation — with the old
    default-'mean' apply, a deep model trained fine but crashed (dense1
    width mismatch) at its first flatten-pooled evaluation."""
    from sept_tpu.models import DeepConv2dBiRNN
    from sept_tpu.train import make_eval_logits_fn

    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-3, hidden_size=8)
    model = DeepConv2dBiRNN(hidden_size=8, pred="emotion")
    tx = make_optimizer(cfg, 10)
    batch = {
        "spec": jnp.zeros((4, T, D, 1)),
        "labels_emo": jnp.zeros(4, jnp.int32),
        "labels_gen": jnp.zeros(4, jnp.int32),
        "global": jnp.zeros((4, 88)),
        "weight": jnp.ones(4),
    }
    state = init_state(model, tx, jax.random.PRNGKey(0), batch, pooling=None)
    step = make_baseline_step(model, tx, pooling=None)
    state, _ = step(state, batch)
    logits = make_eval_logits_fn(model, pooling=None)(
        state.params, state.batch_stats, batch["spec"]
    )
    assert logits.shape == (4, 4)

    run = make_epoch_runner(model, tx, pooling=None)
    state2, *_ = run(
        state, jnp.zeros((8, T, D)), jnp.zeros(8, jnp.int32), jnp.ones(8),
        jnp.arange(8), n_batches=2, batch_size=4,
    )
    assert jnp.isfinite(jax.tree.leaves(state2.params)[0]).all()


def test_epoch_runner_multitask_matches_per_step_loop():
    """pred='multitask': the scanned epoch must sum emotion + gender CE over
    both heads exactly like make_baseline_step (metrics track emotion)."""
    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-2,
                           weight_decay=0.0, hidden_size=8)
    model = Conv2dBiRNN(hidden_size=8, pred="multitask", dropout_rate=0.0)
    tx = make_optimizer(cfg, steps_per_epoch=100)

    key = jax.random.PRNGKey(8)
    windows = jax.random.normal(key, (M, T, D))
    labels = jnp.asarray(np.arange(M) % 4, jnp.int32)
    labels_gen = jnp.asarray(np.arange(M) % 2, jnp.int32)
    weights = jnp.ones(M)
    order = jnp.asarray(np.random.default_rng(0).permutation(M))

    sample = {
        "spec": windows[:BATCH][..., None], "labels_emo": labels[:BATCH],
        "labels_gen": labels_gen[:BATCH], "global": jnp.zeros((BATCH, 88)),
        "weight": weights[:BATCH],
    }
    state0 = init_state(model, tx, key, sample)

    step = make_baseline_step(model, tx)
    s = state0
    n_batches = M // BATCH
    for i in range(n_batches):
        idx = jax.lax.dynamic_slice_in_dim(order, i * BATCH, BATCH)
        s, _ = step(s, {
            "spec": windows[idx][..., None], "labels_emo": labels[idx],
            "labels_gen": labels_gen[idx], "global": jnp.zeros((BATCH, 88)),
            "weight": weights[idx],
        })

    run = make_epoch_runner(model, tx)
    s2, losses, correct, counts = run(
        state0, windows, labels, weights, order,
        n_batches=n_batches, batch_size=BATCH, labels_gen=labels_gen,
    )
    for a, b in zip(jax.tree.leaves(s.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

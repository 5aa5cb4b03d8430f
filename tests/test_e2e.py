"""End-to-end integration: synthetic corpus -> featurize -> fold -> train ->
cloak -> utility/privacy evaluation (SURVEY.md §4 "Integration").

Small but REAL: actual waveforms with learnable gender/emotion signal, the
actual featurizer, fold assembly, jitted training, sliding-window eval, and
the cloak+GRL game.  Sizes tuned so the whole file runs in a few minutes on
the 8-device virtual CPU backend.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sept_tpu.data import (
    FoldPlan,
    assemble_fold,
    batch_iterator,
    featurize_corpus,
    make_corpus,
)
from sept_tpu.models import CloakedModel, Conv2dBiRNN
from sept_tpu.train import (
    ExperimentConfig,
    init_state,
    make_baseline_step,
    make_cloak_optimizer,
    make_cloak_step,
    make_eval_logits_fn,
    make_optimizer,
)
from sept_tpu.train.loop import fit, run_test
from sept_tpu.train.steps import TrainState

# multi-minute on one core: excluded from the default fast lane (pyproject addopts)
pytestmark = pytest.mark.slow

WIN, D = 100, 64


@pytest.fixture(scope="module")
def fold_data():
    corpus = make_corpus(n_speakers=10, utts_per_speaker=10, seed=8,
                         min_dur_s=1.0, max_dur_s=2.0)
    store = featurize_corpus(corpus.waveforms, feature_type="mel_spec",
                             feature_len=D, include_gemaps=False)
    speakers = sorted({u.speaker_id for u in corpus.manifest})
    plan = FoldPlan(
        fold=1,
        train=tuple(speakers[:3]),
        validation=(speakers[3],),
        adv_train=tuple(speakers[4:7]),
        adv_validation=(speakers[7],),
        test=(speakers[8], speakers[9]),  # one F + one M: both genders in test
    )
    fold = assemble_fold(
        corpus.manifest, store, plan, dataset="synthetic",
        feature_len=D, win_len=WIN, norm="znorm", aug="emotion",
    )
    return fold


def small_cfg(**kw):
    base = dict(
        win_len=WIN, feature_len=D, batch_size=16, num_epochs=8,
        hidden_size=16, optimizer="sgd", learning_rate=2e-3,
        weight_decay=1e-4, min_select_epoch=1, early_stop_patience=20,
    )
    base.update(kw)
    return ExperimentConfig(**base)


def test_end_to_end_baseline_beats_chance(fold_data):
    """Train the SER baseline on synthetic features; must beat 4-class chance
    on held-out speakers (the corpus carries real emotion signal)."""
    fold = fold_data
    cfg = small_cfg(pred="emotion")
    model = Conv2dBiRNN(hidden_size=cfg.hidden_size, pred="emotion")
    steps_per_epoch = max(1, len(fold.training) // cfg.batch_size)
    tx = make_optimizer(cfg, steps_per_epoch)
    sample = next(batch_iterator(fold.training, cfg.batch_size, np.random.default_rng(0)))
    sample = {k: jnp.asarray(v) for k, v in sample.items()
              if k not in ("speaker_ids", "datasets")}
    state = init_state(model, tx, jax.random.PRNGKey(8), sample)
    step = make_baseline_step(model, tx)
    logits_fn = make_eval_logits_fn(model)
    result = fit(state, step, logits_fn, fold.training, fold.validation,
                 fold.test, cfg, verbose=False)
    assert result.final_test_uar > 0.3, result.final_test_uar  # chance = 0.25
    global _BASELINE  # reused by the cloak test
    _BASELINE = (model, result)


def test_end_to_end_gender_adversary_beats_chance(fold_data):
    fold = fold_data
    cfg = small_cfg(pred="gender", num_epochs=10, learning_rate=3e-3)
    model = Conv2dBiRNN(hidden_size=cfg.hidden_size, pred="gender")
    tx = make_optimizer(cfg, max(1, len(fold.adv_training) // cfg.batch_size))
    sample = next(batch_iterator(fold.adv_training, cfg.batch_size, np.random.default_rng(0)))
    sample = {k: jnp.asarray(v) for k, v in sample.items()
              if k not in ("speaker_ids", "datasets")}
    state = init_state(model, tx, jax.random.PRNGKey(8), sample)
    step = make_baseline_step(model, tx)
    logits_fn = make_eval_logits_fn(model)
    result = fit(state, step, logits_fn, fold.adv_training, fold.adv_validation,
                 fold.test, cfg, verbose=False)
    assert result.final_test_uar > 0.55, result.final_test_uar  # chance = 0.5


def test_end_to_end_cloak_training_runs(fold_data):
    """Cloak training on a frozen backbone: noise params move, scales respond
    to the sigma-maximizing regularizer, eval protocol runs."""
    fold = fold_data
    cfg = small_cfg(pred="emotion", num_epochs=2, scale_lambda=0.5,
                    learning_rate=5e-2)
    backbone = Conv2dBiRNN(hidden_size=cfg.hidden_size, pred="emotion")
    model = CloakedModel(backbone=backbone, win_len=WIN, n_feats=D)
    sample = next(batch_iterator(fold.training, cfg.batch_size, np.random.default_rng(0)))
    spec = jnp.asarray(sample["spec"])
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(8), "noise": jax.random.PRNGKey(1)}, spec)
    tx = make_cloak_optimizer(cfg, 10, variables["params"], ("noise",))
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]), rng=jax.random.PRNGKey(8),
        step=jnp.zeros((), jnp.int32),
    )
    step = make_cloak_step(model, tx, scale_lambda=cfg.scale_lambda)
    rng = np.random.default_rng(0)
    rho0 = np.asarray(state.params["noise"]["rhos"]).copy()
    for batch in batch_iterator(fold.training, cfg.batch_size, rng):
        db = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in ("speaker_ids", "datasets")}
        state, m = step(state, db)
    rho1 = np.asarray(state.params["noise"]["rhos"])
    assert np.abs(rho1 - rho0).max() > 0  # noise params learned
    # sigma-maximizing regularizer pushes mean rho UP
    assert rho1.mean() > rho0.mean()

    # eval protocol: cloaked logits via sliding vote
    logits_fn = make_eval_logits_fn(model.backbone)

    def cloaked_logits(params, batch_stats, spec, g=None):
        logits, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, spec,
            rngs={"noise": jax.random.PRNGKey(0)},
        )
        return logits

    test_m = run_test(
        jax.jit(cloaked_logits), state, fold.test, cfg
    )
    assert 0.0 <= test_m["acc"] <= 1.0

"""Training-stack tests: metrics, steps, freezing, early stopping, plateau.

Uses a small Conv2dBiRNN (T=40, D=32) so CPU jit stays fast.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sept_tpu.data.pipeline import SplitArrays
from sept_tpu.eval import accuracy, confusion, get_class_weight, uar
from sept_tpu.models import CloakedModel, CloakedModelGRL, Conv2dBiRNN
from sept_tpu.train import (
    EarlyStopping,
    ExperimentConfig,
    PlateauScheduler,
    init_state,
    make_baseline_step,
    make_cloak_grl_step,
    make_cloak_optimizer,
    make_cloak_step,
    make_eval_logits_fn,
    make_optimizer,
    weighted_ce,
)

T, D = 40, 32
KEY = jax.random.PRNGKey(8)


def small_cfg(**kw):
    base = dict(win_len=T, feature_len=D, batch_size=8, num_epochs=2,
                hidden_size=16, min_select_epoch=0)
    base.update(kw)
    return ExperimentConfig(**base)


def fake_batch(b=8):
    k1, k2 = jax.random.split(KEY)
    return {
        "spec": jax.random.normal(k1, (b, T, D, 1)),
        "labels_emo": jnp.asarray(np.arange(b) % 4, jnp.int32),
        "labels_gen": jnp.asarray(np.arange(b) % 2, jnp.int32),
        "global": jnp.zeros((b, 88)),
        "weight": jnp.ones(b),
    }


# ---------------------------------------------------------------------------
# metrics (training_tools.py:133-191)
# ---------------------------------------------------------------------------


def test_metrics_match_sklearn():
    from sklearn.metrics import accuracy_score, confusion_matrix, recall_score

    rng = np.random.default_rng(8)
    truth = rng.integers(0, 4, 200)
    pred = rng.integers(0, 4, 200)
    assert accuracy(truth, pred) == pytest.approx(accuracy_score(truth, pred))
    assert uar(truth, pred) == pytest.approx(
        recall_score(truth, pred, average="macro")
    )
    np.testing.assert_allclose(
        confusion(truth, pred),
        np.round(confusion_matrix(truth, pred, normalize="true") * 100, 2),
    )


def test_get_class_weight_doctest_values():
    assert get_class_weight({0: 633, 1: 898, 2: 641, 3: 699, 4: 799}) == {
        0: 1.0, 1: 1.0, 2: 1.0, 3: 1.0, 4: 1.0
    }
    out = get_class_weight({0: 5, 1: 78, 2: 2814, 3: 7914})
    assert out[0] == pytest.approx(7.366950709511269)
    assert out[3] == 1.0


def test_weighted_ce_ignores_zero_weight_rows():
    logits = jnp.asarray([[10.0, 0.0], [0.0, 10.0], [5.0, 5.0]])
    labels = jnp.asarray([0, 1, 0])
    full = weighted_ce(logits, labels, jnp.asarray([1.0, 1.0, 0.0]))
    sub = weighted_ce(logits[:2], labels[:2], jnp.ones(2))
    assert float(full) == pytest.approx(float(sub))


# ---------------------------------------------------------------------------
# baseline step
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def baseline_setup():
    cfg = small_cfg()
    model = Conv2dBiRNN(hidden_size=16, pred="emotion")
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = init_state(model, tx, KEY, fake_batch())
    return cfg, model, tx, state


@pytest.mark.slow
def test_baseline_step_updates_params_and_loss(baseline_setup):
    cfg, model, tx, state = baseline_setup
    step = make_baseline_step(model, tx)
    batch = fake_batch()
    s1, m1 = step(state, batch)
    assert float(m1["loss"]) > 0
    # params moved
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, s1.params)
    assert max(jax.tree.leaves(diff)) > 0


@pytest.mark.slow
def test_baseline_step_overfits_one_batch():
    # higher LR so 25 steps visibly reduce the loss on a fixed batch;
    # dropout off so the compared losses are deterministic (with the
    # reference-parity CHANNEL dropout, zeroed-channel draws add more
    # step-to-step loss noise than 25 steps of SGD remove)
    cfg = small_cfg(optimizer="sgd", learning_rate=5e-3, weight_decay=0.0)
    model = Conv2dBiRNN(hidden_size=16, pred="emotion", dropout_rate=0.0)
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    state = init_state(model, tx, KEY, fake_batch())
    step = make_baseline_step(model, tx)
    batch = fake_batch()
    _, m0 = step(state, batch)
    s = state
    for _ in range(25):
        s, m = step(s, batch)
    assert float(m["loss"]) < float(m0["loss"])


def test_baseline_step_batchnorm_stats_update(baseline_setup):
    _, model, tx, state = baseline_setup
    step = make_baseline_step(model, tx)
    s1, _ = step(state, fake_batch())
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.batch_stats, s1.batch_stats
    )
    assert max(jax.tree.leaves(d)) > 0


# ---------------------------------------------------------------------------
# cloak step: frozen backbone, scale regularizer
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_cloak_step_only_moves_noise_params():
    cfg = small_cfg(optimizer="sgd", learning_rate=1e-2, scale_lambda=0.1)
    backbone = Conv2dBiRNN(hidden_size=16, pred="emotion")
    model = CloakedModel(backbone=backbone, win_len=T, n_feats=D)
    sample = fake_batch()
    variables = jax.jit(model.init)({"params": KEY, "noise": KEY}, sample["spec"])
    tx = make_cloak_optimizer(cfg, 10, variables["params"], ("noise",))
    state = __import__("sept_tpu.train.steps", fromlist=["TrainState"]).TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        rng=KEY,
        step=jnp.zeros((), jnp.int32),
    )
    step = make_cloak_step(model, tx, scale_lambda=0.1)
    s1, m = step(state, fake_batch())
    # noise params moved
    assert float(jnp.max(jnp.abs(s1.params["noise"]["locs"] - state.params["noise"]["locs"]))) > 0
    assert float(jnp.max(jnp.abs(s1.params["noise"]["rhos"] - state.params["noise"]["rhos"]))) > 0
    # backbone frozen bit-exactly
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params["backbone"], s1.params["backbone"],
    )
    assert max(jax.tree.leaves(d)) == 0.0


@pytest.mark.slow
def test_cloak_grl_step_moves_noise_and_gender_not_emotion():
    cfg = small_cfg(optimizer="sgd", learning_rate=1e-2)
    emo = Conv2dBiRNN(hidden_size=16, pred="emotion")
    gen = Conv2dBiRNN(hidden_size=16, pred="gender")
    model = CloakedModelGRL(
        emotion_backbone=emo, gender_backbone=gen, grl_lambda=0.1, win_len=T, n_feats=D
    )
    sample = fake_batch()
    import functools

    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": KEY, "noise": KEY, "dropout": KEY}, sample["spec"]
    )
    tx = make_cloak_optimizer(
        cfg, 10, variables["params"], ("noise", "gender_backbone")
    )
    from sept_tpu.train.steps import TrainState

    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        rng=KEY,
        step=jnp.zeros((), jnp.int32),
    )
    step = make_cloak_grl_step(model, tx, scale_lambda=0.1, gender_lambda=0.1)
    s1, m = step(state, fake_batch())
    assert "gender_correct" in m
    assert float(jnp.max(jnp.abs(s1.params["noise"]["locs"] - state.params["noise"]["locs"]))) > 0
    d_gen = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params["gender_backbone"], s1.params["gender_backbone"],
    )
    assert max(jax.tree.leaves(d_gen)) > 0
    d_emo = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params["emotion_backbone"], s1.params["emotion_backbone"],
    )
    assert max(jax.tree.leaves(d_emo)) == 0.0


# ---------------------------------------------------------------------------
# schedulers
# ---------------------------------------------------------------------------


def test_early_stopping_patience():
    es = EarlyStopping(patience=3)
    assert not es(1.0)
    for loss in (1.1, 1.2, 1.1):
        stopped = es(loss)
    assert stopped
    es2 = EarlyStopping(patience=3)
    for loss in (1.0, 1.1, 0.9, 1.0, 1.1, 0.8):
        assert not es2(loss)


def test_plateau_scheduler_reduces_after_patience():
    p = PlateauScheduler(patience=2, factor=0.5)
    assert p.step(1.0) == 1.0
    assert p.step(1.1) == 1.0
    assert p.step(1.2) == 1.0
    assert p.step(1.3) == 0.5  # 3rd bad epoch > patience
    assert p.step(0.5) == 0.5  # improvement resets counter, keeps scale


def test_sgd_step_schedule_halves_lr():
    """StepLR reproduces the reference's per-trainer stepping rates.

    The baseline/cloak trainers call scheduler.step() after BOTH the train
    and validate pass (2 scheduler steps/epoch,
    training_adversary_baselines.py:210 at :443-444), the GRL trainer only
    on validate (1/epoch).  LR factor for training epoch e is
    gamma ** ((k*e) // step_size); constant within an epoch.
    """
    from sept_tpu.train.optim import make_schedule

    # default (double-step) mode: step_size 5, 5 steps/epoch
    cfg = small_cfg(optimizer="sgd", learning_rate=1e-3, lr_step_epochs=5)
    sched = make_schedule(cfg, steps_per_epoch=5)
    assert float(sched(0)) == pytest.approx(1e-3)      # epoch 0
    assert float(sched(14)) == pytest.approx(1e-3)     # epoch 2: floor(4/5)=0
    assert float(sched(15)) == pytest.approx(5e-4)     # epoch 3: floor(6/5)=1
    assert float(sched(25)) == pytest.approx(2.5e-4)   # epoch 5: floor(10/5)=2

    # GRL mode: one scheduler step per epoch
    cfg1 = small_cfg(optimizer="sgd", learning_rate=1e-3, lr_step_epochs=2,
                     lr_sched_steps_per_epoch=1)
    sched1 = make_schedule(cfg1, steps_per_epoch=5)
    assert float(sched1(9)) == pytest.approx(1e-3)     # epoch 1
    assert float(sched1(10)) == pytest.approx(5e-4)    # epoch 2
    assert float(sched1(20)) == pytest.approx(2.5e-4)  # epoch 4


def test_set_lr_scale_rewrites_injected_hyperparam():
    import optax
    from sept_tpu.train.optim import set_lr_scale

    cfg = small_cfg(optimizer="adam", learning_rate=1e-3, weight_decay=0.0)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    params = {"w": jnp.ones((4, 4))}
    opt_state = tx.init(params)
    grads = {"w": jnp.ones((4, 4))}

    up1, st1 = tx.update(grads, opt_state, params)
    scaled_state = set_lr_scale(st1, 0.25)
    up2, _ = tx.update(grads, scaled_state, params)
    # second update magnitude scaled by exactly 0.25 relative to a rerun at 1.0
    up_ref, _ = tx.update(grads, st1, params)
    np.testing.assert_allclose(
        np.asarray(up2["w"]), 0.25 * np.asarray(up_ref["w"]), rtol=1e-5
    )


def test_presets_mirror_reference_defaults():
    from sept_tpu.train import preset

    b = preset("baseline")
    assert (b.optimizer, b.learning_rate, b.lr_step_epochs, b.num_epochs) == (
        "sgd", 1e-4, 5, 100
    )
    c = preset("cloak")
    assert (c.learning_rate, c.lr_step_epochs) == (1e-3, 10)
    g = preset("cloak_grl", gender_lambda=0.2)
    assert g.grl and g.gender_lambda == 0.2 and g.grl_lambda == 0.1


def test_weighted_ce_divides_by_batch_size_not_weight_sum():
    """Combine-mode loss parity: ``sum_i(ce_i * w_i) / len(preds)``.

    The reference scales each sample's CE by its speaker weight and divides
    by the BATCH SIZE (training_adversary_baselines.py:175-179,
    training_cloak.py:137-143); dividing by sum(weights) instead shrank
    combine-mode gradients by the batch's mean weight.  Padding rows
    (weight 0) stay excluded from the count.
    """
    from sept_tpu.train.steps import weighted_ce

    logits = jax.random.normal(KEY, (5, 4))
    labels = jnp.asarray([0, 1, 2, 3, 0])
    w = jnp.asarray([3.0, 1.0, 1.0, 2.0, 0.0])  # last row = padding

    logp = jax.nn.log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    expect = float(jnp.sum(nll * w)) / 4.0  # 4 real rows
    assert float(weighted_ce(logits, labels, w)) == pytest.approx(expect, rel=1e-6)

    # unweighted batches are unchanged: mean over real rows
    w01 = jnp.asarray([1.0, 1.0, 1.0, 1.0, 0.0])
    expect01 = float(jnp.mean(nll[:4]))
    assert float(weighted_ce(logits, labels, w01)) == pytest.approx(expect01, rel=1e-6)


def test_plateau_relative_threshold():
    """torch ReduceLROnPlateau default: improvement only counts when the
    loss beats best * (1 - 1e-4); epsilon wiggles are bad epochs."""
    from sept_tpu.train.optim import PlateauScheduler

    p = PlateauScheduler(patience=1, factor=0.5)
    assert p.step(1.0) == 1.0
    assert p.step(1.0 - 5e-5) == 1.0   # within rel threshold: bad epoch 1
    assert p.step(1.0 - 6e-5) == 0.5   # bad epoch 2 > patience -> reduce
    assert p.step(0.9) == 0.5          # real improvement, scale kept

"""Tests for the sigma-shaping training extensions: antithetic noise pairs
and saliency-aligned scale shaping (the mechanisms behind the committed
utility/privacy tradeoff, benchmarks/privacy_demo.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sept_tpu.models import CloakedModelGRL, CloakNoise, Conv2dBiRNN
from sept_tpu.train import ExperimentConfig, make_cloak_optimizer
from sept_tpu.train.steps import (
    TrainState,
    make_cloak_grl_step,
    saliency_alignment_loss,
)

# multi-minute on one core: excluded from the default fast lane (pyproject addopts)
pytestmark = pytest.mark.slow

T, D = 40, 32
KEY = jax.random.PRNGKey(8)


def test_noise_sign_flips_epsilon_exactly():
    """sample_noise(sign=-1) mirrors the +1 draw around locs, so an
    antithetic pair averages to exactly locs (the first-order term cancels)."""
    noise = CloakNoise(win_len=T, n_feats=D)
    v = noise.init({"params": KEY, "noise": KEY}, jnp.zeros((2, T, D)))
    x = jnp.zeros((2, T, D))
    out_p = noise.apply(v, x, None, 1.0, rngs={"noise": jax.random.PRNGKey(3)})
    out_m = noise.apply(v, x, None, -1.0, rngs={"noise": jax.random.PRNGKey(3)})
    locs = v["params"]["locs"]
    np.testing.assert_allclose(
        np.asarray((out_p + out_m) / 2.0),
        np.broadcast_to(np.asarray(locs), (2, T, D)),
        atol=1e-6,
    )
    assert float(jnp.max(jnp.abs(out_p - out_m))) > 0.0


def _grl_setup(**cfg_kw):
    model = CloakedModelGRL(
        emotion_backbone=Conv2dBiRNN(hidden_size=8, pred="emotion",
                                     dropout_rate=0.0),
        gender_backbone=Conv2dBiRNN(hidden_size=8, pred="gender",
                                    dropout_rate=0.0),
        grl_lambda=0.5, win_len=T, n_feats=D,
    )
    x = jax.random.normal(KEY, (8, T, D, 1))
    v = jax.jit(functools.partial(model.init, train=True))(
        {"params": KEY, "noise": KEY, "dropout": KEY}, x
    )
    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-2, **cfg_kw)
    tx = make_cloak_optimizer(cfg, 10, v["params"], ("noise", "gender_backbone"))
    state = TrainState(params=v["params"], batch_stats=v["batch_stats"],
                       opt_state=tx.init(v["params"]), rng=KEY,
                       step=jnp.zeros((), jnp.int32))
    batch = {
        "spec": x,
        "labels_emo": (jnp.arange(8) % 4).astype(jnp.int32),
        "labels_gen": (jnp.arange(8) % 2).astype(jnp.int32),
        "global": jnp.zeros((8, 88)),
        "weight": jnp.ones(8),
    }
    return model, tx, state, batch


def test_antithetic_grl_step_runs_and_updates_noise():
    model, tx, state, batch = _grl_setup()
    step = make_cloak_grl_step(model, tx, scale_lambda=0.1, antithetic=True)
    s1, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(jnp.max(jnp.abs(
        s1.params["noise"]["locs"] - state.params["noise"]["locs"]))) > 0
    # frozen emotion backbone untouched
    for a, b in zip(jax.tree.leaves(state.params["emotion_backbone"]),
                    jax.tree.leaves(s1.params["emotion_backbone"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_saliency_alignment_gradient_direction():
    """The rho gradient of the alignment term must push scales UP on
    gender-salient cells and DOWN on emotion-salient cells."""
    model, tx, state, batch = _grl_setup()

    def loss(params):
        return saliency_alignment_loss(
            model, params, state.batch_stats, batch["spec"],
            batch["labels_emo"], batch["labels_gen"], batch["weight"],
        )

    val = loss(state.params)
    assert np.isfinite(float(val))
    g = jax.grad(loss)(state.params)
    g_rho = np.asarray(g["noise"]["rhos"])
    # only the noise params carry gradient (saliencies are stop-grad consts)
    for leaf in jax.tree.leaves(g["emotion_backbone"]):
        np.testing.assert_allclose(np.asarray(leaf), 0.0, atol=1e-9)
    for leaf in jax.tree.leaves(g["gender_backbone"]):
        np.testing.assert_allclose(np.asarray(leaf), 0.0, atol=1e-9)
    assert np.abs(g_rho).max() > 0

    # reconstruct the sign prediction: grad_rho ∝ (sal_emo - sal_gen) * c,
    # c > 0 -> descent RAISES rho exactly where gender saliency dominates
    from sept_tpu.train.steps import weighted_ce

    def branch_sal(backbone, sub, labels):
        def ce(xin):
            logits = backbone.apply(
                {"params": state.params[sub],
                 "batch_stats": state.batch_stats[sub]},
                xin, train=False, pooling="mean",
            )
            return weighted_ce(logits, labels, batch["weight"])

        sal = jnp.abs(jax.grad(ce)(batch["spec"])).mean(0)[..., 0]
        return np.asarray(sal / (jnp.mean(sal) + 1e-8))

    diff = branch_sal(model.emotion_backbone, "emotion_backbone",
                      batch["labels_emo"]) - branch_sal(
        model.gender_backbone, "gender_backbone", batch["labels_gen"])
    # same sign pattern cell-by-cell (up to the positive dsigma/drho factor)
    agree = np.mean(np.sign(g_rho) == np.sign(diff))
    assert agree > 0.99, agree


def test_hard_corpus_separable_subspace():
    """The benchmark corpus must carry emotion signal in high-frequency bins
    (AM-modulated noise floor) where gender is absent: high-bin energy
    modulation differs by emotion, high-bin mean energy similar by gender."""
    from sept_tpu.data.synthetic import make_hard_corpus
    from sept_tpu.ops.frontend import mel_spectrogram

    corpus = make_hard_corpus(n_speakers=4, utts_per_speaker=8, seed=8,
                              min_dur_s=1.5, max_dur_s=1.6)
    by_lab, by_gen = {}, {}
    for u in corpus.manifest:
        mel = np.asarray(mel_spectrogram(
            jnp.asarray(corpus.wave(u.utt_id)), n_fft=800, n_mels=96))
        hi = mel[64:]  # bins above every speaker's harmonics
        # temporal std of high-bin loudness = AM-rate/depth signature
        mod = float(np.std(hi.mean(axis=0)))
        by_lab.setdefault(u.label, []).append(mod)
        by_gen.setdefault(u.gender, []).append(float(hi.mean()))
    # emotion classes differ in high-bin temporal modulation
    lab_means = {k: np.mean(v) for k, v in by_lab.items()}
    assert max(lab_means.values()) > 1.5 * min(lab_means.values()), lab_means
    # genders do NOT differ much in high-bin mean energy
    gm = {k: np.mean(v) for k, v in by_gen.items()}
    assert abs(gm["F"] - gm["M"]) < 2.0, gm

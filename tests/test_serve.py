"""Serving API: waveform in, calibrated probabilities out."""

import jax
import jax.numpy as jnp
import numpy as np

from sept_tpu.models import Conv2dBiRNN
from sept_tpu.serve import CloakedPredictor, Predictor

D, WIN = 32, 60


def _trained_dummy():
    model = Conv2dBiRNN(hidden_size=8, pred="emotion")
    x = jnp.zeros((1, WIN, D, 1))
    v = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, x)
    return v["params"], v["batch_stats"]


def test_predictor_shapes_and_distribution(rng):
    params, stats = _trained_dummy()
    p = Predictor(params, stats, hidden_size=8, feature_len=D,
                  win_len=WIN, shift_len=15, n_fft=800)
    waves = [rng.standard_normal(12000 + 2000 * i).astype(np.float32)
             for i in range(3)]
    probs = p.predict(waves)
    assert probs.shape == (3, 4)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    assert (probs >= 0).all()


def test_cloaked_predictor_changes_output(rng):
    params, stats = _trained_dummy()
    noise_params = {
        "locs": jnp.full((WIN, D), 0.0),
        "rhos": jnp.full((WIN, D), 2.0),  # large scales -> strong noise
    }
    waves = [rng.standard_normal(12000).astype(np.float32)]
    clean = Predictor(params, stats, hidden_size=8, feature_len=D,
                      win_len=WIN, shift_len=15).predict(waves)
    cloaked = CloakedPredictor(
        params, stats, hidden_size=8, feature_len=D, win_len=WIN,
        shift_len=15, noise_params=noise_params, max_scale=5.0,
    ).predict(waves)
    assert cloaked.shape == clean.shape
    assert float(np.abs(cloaked - clean).max()) > 1e-4
    # deterministic under the same seed
    again = CloakedPredictor(
        params, stats, hidden_size=8, feature_len=D, win_len=WIN,
        shift_len=15, noise_params=noise_params, max_scale=5.0,
    ).predict(waves, seed=0)
    np.testing.assert_allclose(cloaked, again, atol=1e-6)


def test_deep_model_predictor_uses_flatten_pooling(rng):
    """Regression: a deep-model checkpoint is trained with pooling=None
    (flatten); the Predictor must apply the same pooling or dense1's width
    mismatches at inference."""
    from sept_tpu.models import DeepConv2dBiRNN

    model = DeepConv2dBiRNN(hidden_size=8, pred="emotion")
    x = jnp.zeros((1, WIN, D, 1))
    v = jax.jit(lambda a: model.init(
        {"params": jax.random.PRNGKey(0)}, a, pooling=None))(x)
    p = Predictor(v["params"], v["batch_stats"],
                  model_type="deep-2d-cnn-lstm", hidden_size=8,
                  feature_len=D, win_len=WIN, shift_len=15)
    waves = [rng.standard_normal(12000).astype(np.float32)]
    probs = p.predict(waves)
    assert probs.shape == (1, 4)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)

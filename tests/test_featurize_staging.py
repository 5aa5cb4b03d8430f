"""Unit tests for the staged (single-upload) featurize primitives.

The corpus featurizer uploads each wave chunk once and derives reflect
padding and np.gradient waveform derivatives on device
(sept_tpu/data/featurize.py); these pin the device primitives to their
NumPy oracles, including the short-utterance multi-reflection edge.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sept_tpu.data.featurize import (
    _padded_gradient,
    device_reflect_pad,
    featurize_corpus,
)


def _stage(waves, bucket_len):
    W = np.zeros((len(waves), bucket_len), np.float32)
    ns = np.zeros(len(waves), np.int32)
    for i, w in enumerate(waves):
        W[i, : len(w)] = w
        ns[i] = len(w)
    return jnp.asarray(W), jnp.asarray(ns)


@pytest.mark.parametrize("pad", [3, 200, 400])
def test_device_reflect_pad_matches_np_pad(pad):
    rng = np.random.default_rng(0)
    lengths = [pad + 1, pad + 7, 3 * pad, 4 * pad + 11]
    waves = [rng.standard_normal(n).astype(np.float32) for n in lengths]
    bucket = max(lengths)
    W, ns = _stage(waves, bucket)
    out = np.asarray(device_reflect_pad(W, ns, pad))
    for i, w in enumerate(waves):
        want = np.pad(w, (pad, pad), mode="reflect")
        got = out[i]
        np.testing.assert_array_equal(got[: len(want)], want)
        assert not got[len(want):].any(), "beyond true padded region must be 0"


def test_device_reflect_pad_short_utterance_multi_reflection():
    # n <= pad: np.pad keeps reflecting; the periodic fold must agree
    w = np.arange(1.0, 6.0, dtype=np.float32)  # n=5
    W, ns = _stage([w], 16)
    out = np.asarray(device_reflect_pad(W, ns, 9))
    want = np.pad(w, (9, 9), mode="reflect")
    np.testing.assert_array_equal(out[0, : len(want)], want)


def test_padded_gradient_matches_np_gradient():
    rng = np.random.default_rng(1)
    lengths = [5, 64, 200]
    waves = [rng.standard_normal(n).astype(np.float32) for n in lengths]
    W, ns = _stage(waves, max(lengths))
    for spacing in (1.0, 2.0):
        out = np.asarray(_padded_gradient(W, ns, spacing))
        for i, w in enumerate(waves):
            want = np.gradient(w, spacing).astype(np.float32)
            np.testing.assert_allclose(out[i, : len(w)], want, atol=1e-6)
            assert not out[i, len(w):].any()


def test_featurize_corpus_staged_matches_per_utterance_ops():
    # end-to-end: the staged bucket program equals the single-utterance op
    from sept_tpu.ops.frontend import mel_spectrogram, mfcc_with_deltas

    rng = np.random.default_rng(2)
    waves = {
        "a": rng.standard_normal(9000).astype(np.float32),
        "b": rng.standard_normal(16000).astype(np.float32),
    }
    store = featurize_corpus(waves, feature_type="mel_spec",
                             include_gemaps=False)
    for u, w in waves.items():
        want1 = np.asarray(mel_spectrogram(jnp.asarray(w), n_fft=800))
        np.testing.assert_allclose(store[u]["mel1"], want1, atol=2e-3)

    store = featurize_corpus(waves, feature_type="mfcc", include_gemaps=False)
    for u, w in waves.items():
        want = np.asarray(mfcc_with_deltas(jnp.asarray(w)))
        np.testing.assert_allclose(store[u]["mfcc"], want, atol=2e-2)

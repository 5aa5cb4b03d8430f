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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# int16 PCM staging: half the H2D bytes, bit-equal results
# ---------------------------------------------------------------------------


def _pcm16_corpus(seed=3, lengths=(9000, 16000, 4500)):
    rng = np.random.default_rng(seed)
    pcm = {
        f"u{i}": (rng.integers(-32768, 32768, n)).astype(np.int16)
        for i, n in enumerate(lengths)
    }
    as_float = {u: w.astype(np.float32) / 32768.0 for u, w in pcm.items()}
    return pcm, as_float


@pytest.mark.parametrize("feature_type", ["mel_spec", "mfcc"])
def test_featurize_corpus_int16_staging_bitwise_equal(feature_type):
    pcm, f32 = _pcm16_corpus()
    a = featurize_corpus(pcm, feature_type=feature_type, include_gemaps=False)
    b = featurize_corpus(f32, feature_type=feature_type, include_gemaps=False)
    for u in pcm:
        for k in a[u]:
            np.testing.assert_array_equal(a[u][k], b[u][k])


@pytest.mark.slow
def test_functionals_int16_staging_bitwise_equal():
    from sept_tpu.ops.emobase import combined_functionals_batch

    pcm, f32 = _pcm16_corpus(seed=4, lengths=(8000, 12000))
    g_a, e_a = combined_functionals_batch(pcm)
    g_b, e_b = combined_functionals_batch(f32)
    for u in pcm:
        np.testing.assert_array_equal(g_a[u], g_b[u])
        np.testing.assert_array_equal(e_a[u], e_b[u])


def test_device_ingest_int16_staging_bitwise_equal():
    from sept_tpu.data.device_pipeline import device_ingest

    pcm, f32 = _pcm16_corpus(seed=5, lengths=(40000, 40000, 40000, 40000))
    spk = np.array([0, 0, 1, 1], np.int32)
    emo = np.array([0, 1, 2, 3], np.int32)
    gen = emo % 2
    a = device_ingest(list(pcm.values()), spk, emo, gen)
    b = device_ingest(list(f32.values()), spk, emo, gen)
    np.testing.assert_array_equal(np.asarray(a.windows), np.asarray(b.windows))
    np.testing.assert_array_equal(np.asarray(a.weight), np.asarray(b.weight))


def test_mixed_dtype_corpus_falls_back_to_float32_staging():
    pcm, f32 = _pcm16_corpus(seed=6, lengths=(9000, 12000))
    mixed = {"u0": pcm["u0"], "u1": f32["u1"]}  # int16 + float32
    a = featurize_corpus(mixed, feature_type="mel_spec", include_gemaps=False)
    b = featurize_corpus(f32, feature_type="mel_spec", include_gemaps=False)
    for u in mixed:
        np.testing.assert_array_equal(a[u]["mel1"], b[u]["mel1"])


def test_narrow_pcm16_lossless_only():
    from sept_tpu.runtime import narrow_pcm16

    pcm = np.array([-32768, -1, 0, 1, 32767], np.int16)
    dec = pcm.astype(np.float32) / 32768.0  # what the decoders emit
    out = narrow_pcm16(dec)
    assert out.dtype == np.int16
    np.testing.assert_array_equal(out, pcm)
    # resampled-looking (non-representable) audio passes through untouched
    lossy = np.array([0.1, 0.2, 1 / 3], np.float32)
    assert narrow_pcm16(lossy) is lossy
    # values outside int16 range must not be narrowed
    hot = np.array([1.0, -1.5], np.float32)
    assert narrow_pcm16(hot) is hot


def test_prepare_waves_mixed_dtype_equal_length():
    """Equal-length fast path: a mixed int16+float32 batch must normalize
    the int16 rows on host (np.stack promotion alone would leave raw
    +/-32768-scale values in the float32 stack)."""
    from sept_tpu.data.device_pipeline import prepare_waves

    rng = np.random.default_rng(7)
    pcm = rng.integers(-32768, 32768, 9000).astype(np.int16)
    f32 = rng.standard_normal(9000).astype(np.float32)
    padded, frames = prepare_waves([pcm, f32])
    assert padded.dtype == np.float32
    want, _ = prepare_waves([pcm.astype(np.float32) / 32768.0, f32])
    np.testing.assert_array_equal(padded, want)
    # uniform int16 batches stay int16 (half the staged bytes)
    padded16, _ = prepare_waves([pcm, pcm[::-1].copy()])
    assert padded16.dtype == np.int16


def test_featurize_cli_chunked_decode_matches_single_pass(tmp_path):
    """The corpus decode path: size-sorted chunked decode (+prefetch) must
    produce the same feature store and manifest as one-shot decode."""
    import os

    from sept_tpu.cli import featurize as featurize_cli
    from sept_tpu.data.store import load_feature_store
    from sept_tpu.runtime import write_wav

    root = tmp_path / "crema"
    root.mkdir()
    rng = np.random.default_rng(5)
    lengths = [9000, 16000, 4500, 12000, 7000]
    names = ["1001_DFA_ANG_XX", "1001_IEO_HAP_HI", "1002_DFA_SAD_XX",
             "1002_IEO_NEU_LO", "1003_DFA_ANG_MD"]
    for name, n in zip(names, lengths):
        write_wav(str(root / f"{name}.wav"),
                  (0.2 * rng.standard_normal(n)).astype(np.float32), 16000)
    with open(root / "VideoDemographics.csv", "w") as f:
        f.write("ActorID,Age,Sex,Race,Ethnicity\n"
                "1001,30,Male,A,B\n1002,25,Female,A,B\n1003,40,Male,A,B\n")

    def run(work, chunk):
        featurize_cli.main([
            "--dataset", "crema-d", "--corpus_root", str(root),
            "--work_dir", str(work), "--functionals", "0",
            "--decode_chunk", str(chunk),
        ])
        return load_feature_store(
            os.path.join(str(work), "feature", "mel_spec", "crema-d",
                         "data_128.npz"))

    a = run(tmp_path / "w_chunked", 2)
    b = run(tmp_path / "w_single", 0)
    assert set(a) == set(b) and len(a) == len(names)
    for u in a:
        for k in a[u]:
            np.testing.assert_array_equal(a[u][k], b[u][k])

"""Golden-vector parity tests for the audio frontend.

torchaudio is not available in this environment, so the oracle re-derives
torchaudio's documented algorithm from its primitives: ``torch.stft`` (the
same C++ kernel torchaudio's Spectrogram calls) plus a numpy transcription of
``melscale_fbanks`` / ``create_dct`` / ``amplitude_to_DB``.  The reference
feature definitions live at
/root/reference/feature_extraction/audio_feature_extraction.py:15-46.
"""

import math
import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sept_tpu.ops import frontend as F


# ----------------------------------------------------------------------------
# Oracle: torchaudio semantics from torch.stft + numpy
# ----------------------------------------------------------------------------


def oracle_spectrogram(wave_np, n_fft, hop, power=2.0):
    wave = torch.from_numpy(wave_np.astype(np.float32))
    spec = torch.stft(
        wave,
        n_fft=n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=torch.hann_window(n_fft),
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    return (spec.abs() ** power).numpy()


def oracle_melscale_fbanks(n_freqs, f_min, f_max, n_mels, sr):
    # transcription of torchaudio.functional.melscale_fbanks (htk, norm=None)
    all_freqs = np.linspace(0, sr // 2, n_freqs)
    m_min = 2595.0 * np.log10(1.0 + f_min / 700.0)
    m_max = 2595.0 * np.log10(1.0 + f_max / 700.0)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return np.maximum(0.0, np.minimum(down, up))


def oracle_amplitude_to_db(x, top_db=None):
    db = 10.0 * np.log10(np.maximum(x, 1e-10))
    if top_db is not None:
        db = np.maximum(db, db.max() - top_db)
    return db


def oracle_create_dct(n_mfcc, n_mels):
    n = np.arange(n_mels)
    k = np.arange(n_mfcc)[:, None]
    dct = np.cos(math.pi / n_mels * (n + 0.5) * k)
    dct[0] *= 1.0 / math.sqrt(2.0)
    dct *= math.sqrt(2.0 / n_mels)
    return dct.T  # (n_mels, n_mfcc)


def oracle_mel_spectrogram(wave_np, n_fft, hop=160, n_mels=128, sr=16000, top_db=None):
    spec = oracle_spectrogram(wave_np, n_fft, hop)
    fb = oracle_melscale_fbanks(n_fft // 2 + 1, 0.0, sr / 2, n_mels, sr)
    mel = fb.T @ spec
    return oracle_amplitude_to_db(mel, top_db=top_db)


def oracle_mfcc(wave_np, n_mfcc=40):
    # torchaudio MFCC defaults: n_fft=400, hop=200, n_mels=128, top_db=80
    mel_db = oracle_mel_spectrogram(wave_np, n_fft=400, hop=200, top_db=80.0)
    dct = oracle_create_dct(n_mfcc, 128)
    return dct.T @ mel_db


def oracle_mfcc_with_deltas(wave_np):
    d1 = np.gradient(wave_np)
    d2 = np.gradient(wave_np, 2)
    return np.concatenate(
        [oracle_mfcc(wave_np), oracle_mfcc(d1), oracle_mfcc(d2)], axis=0
    )


# ----------------------------------------------------------------------------
# Tests
# ----------------------------------------------------------------------------


@pytest.fixture
def wave(rng):
    # ~0.7s of band-limited noise + tones, realistic dynamic range
    t = np.arange(11113) / 16000.0
    w = (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 1333 * t)
        + 0.05 * rng.standard_normal(t.shape)
    )
    return w.astype(np.float32)


def test_hann_window_matches_torch():
    ours = F.hann_window(400)
    theirs = torch.hann_window(400).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_melscale_fbanks_matches_oracle():
    ours = F.melscale_fbanks(201, 0.0, 8000.0, 128, 16000)
    theirs = oracle_melscale_fbanks(201, 0.0, 8000.0, 128, 16000)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_create_dct_matches_oracle():
    np.testing.assert_allclose(
        F.create_dct(40, 128, "ortho"), oracle_create_dct(40, 128), atol=1e-6
    )


@pytest.mark.parametrize("mode", ["fft", "matmul"])
@pytest.mark.parametrize("n_fft,hop", [(400, 200), (800, 160), (1600, 160)])
def test_stft_power_matches_torch(wave, n_fft, hop, mode):
    ours = np.asarray(F.stft_power(jnp.asarray(wave), n_fft, hop, mode=mode))
    theirs = oracle_spectrogram(wave, n_fft, hop)
    assert ours.shape == theirs.shape
    # absolute scale of power spectra spans ~1e4; compare relative to peak
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours / scale, theirs / scale, atol=2e-5)


@pytest.mark.parametrize("mode", ["fft", "matmul"])
@pytest.mark.parametrize("n_fft", [800, 1600])
def test_mel_spectrogram_matches_oracle(wave, n_fft, mode):
    ours = np.asarray(
        F.mel_spectrogram(jnp.asarray(wave), n_fft=n_fft, hop_length=160, mode=mode)
    )
    theirs = oracle_mel_spectrogram(wave, n_fft=n_fft)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-3)


@pytest.mark.parametrize("mode", ["fft", "matmul"])
def test_mfcc_matches_oracle(wave, mode):
    ours = np.asarray(F.mfcc(jnp.asarray(wave), mode=mode))
    theirs = oracle_mfcc(wave)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=5e-3)


def test_np_gradient_matches_numpy(rng):
    x = rng.standard_normal(257).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(F.np_gradient(jnp.asarray(x), 1.0)), np.gradient(x), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(F.np_gradient(jnp.asarray(x), 2.0)), np.gradient(x, 2), atol=1e-6
    )


def test_mfcc_with_deltas_matches_oracle(wave):
    ours = np.asarray(F.mfcc_with_deltas(jnp.asarray(wave)))
    theirs = oracle_mfcc_with_deltas(wave)
    assert ours.shape == theirs.shape == (120, 1 + len(wave) // 200)
    np.testing.assert_allclose(ours, theirs, atol=5e-3)


# ----------------------------------------------------------------------------
# Vendored golden vectors (tests/golden/frontend_golden.npz)
# ----------------------------------------------------------------------------
# Frozen on disk rather than recomputed, so a regression in EITHER this
# file's oracle transcription or torch's stft cannot silently move the
# goalposts.  The npz records its provenance: regenerated on a machine with
# real torchaudio it holds actual torchaudio outputs; in this environment
# (no torchaudio installed) it holds the torch.stft+transcription oracle's
# outputs (see tests/golden/gen_frontend_golden.py).

_GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                       "frontend_golden.npz")


@pytest.mark.parametrize("signal", ["tonal", "noisy", "quiet"])
def test_vendored_golden_vectors(signal):
    with np.load(_GOLDEN) as z:
        wave = jnp.asarray(z[f"{signal}|wave"])
        want_mfcc = z[f"{signal}|mfcc120"]
        want_mel1 = z[f"{signal}|mel1"]
        want_mel2 = z[f"{signal}|mel2"]
        assert str(z["source"]) in ("torchaudio",
                                    "torch.stft+transcription")
    np.testing.assert_allclose(np.asarray(F.mfcc_with_deltas(wave)),
                               want_mfcc, atol=5e-3)
    # 0.05 dB: the tone-dominated signal's deepest mel valleys sit near the
    # f32 rounding floor where log10 jitters by ~0.02 dB between precisions
    np.testing.assert_allclose(
        np.asarray(F.mel_spectrogram(wave, n_fft=800, hop_length=160)),
        want_mel1, atol=5e-2)
    np.testing.assert_allclose(
        np.asarray(F.mel_spectrogram(wave, n_fft=1600, hop_length=160)),
        want_mel2, atol=5e-2)


def test_amplitude_to_db_top_db_floor():
    x = jnp.asarray(np.array([[1.0, 1e-12], [1e-4, 1e2]], dtype=np.float32))
    db = np.asarray(F.amplitude_to_db(x, "power", top_db=80.0))
    assert db.max() == pytest.approx(20.0, abs=1e-3)
    assert db.min() == pytest.approx(-60.0, abs=1e-3)  # floored at max - 80

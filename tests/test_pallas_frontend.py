"""Pallas fused frontend parity vs the jnp reference path (interpret mode on
the CPU backend; the same kernel compiles via Mosaic on real TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sept_tpu.ops import frontend as F
from sept_tpu.ops.pallas_frontend import pallas_mel_spectrogram, pallas_mfcc


@pytest.fixture
def waves(rng):
    t = np.arange(20000) / 16000.0
    w1 = (0.4 * np.sin(2 * np.pi * 240 * t) + 0.03 * rng.standard_normal(t.shape))
    w2 = (0.2 * np.sin(2 * np.pi * 1100 * t) + 0.05 * rng.standard_normal(t.shape))
    return np.stack([w1, w2]).astype(np.float32)


@pytest.mark.parametrize("n_fft,hop", [(800, 160), (1600, 160), (400, 200)])
def test_pallas_mel_matches_jnp(waves, n_fft, hop):
    pad = n_fft // 2
    padded = np.stack([np.pad(w, (pad, pad), mode="reflect") for w in waves])
    out = np.asarray(
        pallas_mel_spectrogram(
            jnp.asarray(padded), n_fft=n_fft, hop=hop, n_mels=128,
            tile=32, interpret=True,
        )
    )
    t = 1 + waves.shape[1] // hop
    assert out.shape == (2, t, 128)
    for i in range(2):
        ref = np.asarray(
            F.mel_spectrogram(jnp.asarray(waves[i]), n_fft=n_fft,
                              hop_length=hop, n_mels=128)
        ).T  # (T, 128)
        np.testing.assert_allclose(out[i], ref, atol=2e-2)


def test_pallas_mfcc_matches_jnp(waves):
    pad = 200
    padded = np.stack([np.pad(w, (pad, pad), mode="reflect") for w in waves])
    out = np.asarray(
        pallas_mfcc(jnp.asarray(padded), tile=32, interpret=True)
    )
    t = 1 + waves.shape[1] // 200
    assert out.shape == (2, t, 40)
    for i in range(2):
        ref = np.asarray(F.mfcc(jnp.asarray(waves[i]))).T  # (T, 40)
        np.testing.assert_allclose(out[i], ref, atol=2e-2)


def test_pallas_mel_bf16_mode(waves):
    """Throughput mode: bf16 MXU GEMMs with f32 accumulation — finite, close
    to the f32 path in bulk (p99), documented to deviate at silence cells."""
    padded = np.stack([np.pad(w, (400, 400), mode="reflect") for w in waves])
    f32 = np.asarray(pallas_mel_spectrogram(jnp.asarray(padded), tile=32,
                                            interpret=True))
    b16 = np.asarray(pallas_mel_spectrogram(jnp.asarray(padded), tile=32,
                                            bf16=True, interpret=True))
    assert b16.dtype == np.float32 and np.all(np.isfinite(b16))
    # tonal fixtures have many near-silence cells where dB amplifies bf16
    # error; bulk (median) deviation must stay well under 0.1 dB
    assert np.median(np.abs(b16 - f32)) < 0.05
    assert np.percentile(np.abs(b16 - f32), 99) < 1.0


def test_pallas_mfcc_fused_floor_dct_matches_unfused(waves):
    """The second fused kernel (top_db floor + DCT in VMEM) must equal the
    plain XLA floor+dot formulation."""
    padded = np.stack([np.pad(w, (200, 200), mode="reflect") for w in waves])
    fused = np.asarray(pallas_mfcc(jnp.asarray(padded), tile=32,
                                   interpret=True))
    mel_db = np.asarray(pallas_mel_spectrogram(
        jnp.asarray(padded), n_fft=400, hop=200, tile=32, interpret=True))
    t = 1 + waves.shape[1] // 200
    mel_db = mel_db[:, :t, :]
    floor = mel_db.max(axis=(1, 2), keepdims=True) - 80.0
    dct = np.asarray(F.create_dct(40, 128, "ortho"))
    ref = np.maximum(mel_db, floor) @ dct
    np.testing.assert_allclose(fused, ref, atol=1e-4)


def test_pallas_mel_arbitrary_hop(waves):
    # framing is an XLA gather, so non-divisible n_fft/hop combos work too
    out = pallas_mel_spectrogram(jnp.asarray(np.pad(waves, ((0,0),(512,512)),
                                                    mode="reflect")),
                                 n_fft=1024, hop=160, tile=32, interpret=True)
    assert out.shape[0] == 2 and out.shape[2] == 128

"""On-device ingest parity vs the host pipeline primitives."""

import jax.numpy as jnp
import pytest
import numpy as np

from sept_tpu.data.device_pipeline import device_ingest, prepare_waves
from sept_tpu.data.normalize import SpeakerStats, apply_norm
from sept_tpu.data.windowing import window_utterance
from sept_tpu.ops import mel_spectrogram


def _mini_corpus(rng, n=6, sr=16000):
    waves, spk = [], []
    for i in range(n):
        dur = rng.uniform(1.0, 1.6)
        t = np.arange(int(dur * sr)) / sr
        waves.append(
            (0.3 * np.sin(2 * np.pi * (150 + 30 * (i % 2)) * t)
             + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
        )
        spk.append(i % 2)
    return waves, np.asarray(spk, np.int32)


@pytest.mark.slow
def test_device_ingest_matches_host_pipeline(rng):
    waves, spk = _mini_corpus(rng)
    emo = np.arange(len(waves), dtype=np.int32) % 4
    gen = spk.copy()
    win, shift, d = 60, 15, 32

    ds = device_ingest(waves, spk, emo, gen, n_fft=800, n_mels=d,
                       win_len=win, shift_len=shift)

    # host path: per-utterance mel -> per-speaker stats over VALID frames ->
    # znorm -> window
    feats = [np.asarray(mel_spectrogram(jnp.asarray(w), n_fft=800, n_mels=d)).T
             for w in waves]
    stats = {}
    for s in (0, 1):
        rows = np.concatenate([f for f, sp in zip(feats, spk) if sp == s])
        stats[s] = SpeakerStats.from_frames(rows)

    w_per_utt = (max(f.shape[0] for f in feats) - win) // shift + 1
    for i, f in enumerate(feats):
        normed = apply_norm(f, stats[spk[i]], "znorm")
        host_wins = window_utterance(normed, win, shift)
        dev_wins = np.asarray(ds.windows[i * w_per_utt : (i + 1) * w_per_utt])
        dev_valid = np.asarray(ds.weight[i * w_per_utt : (i + 1) * w_per_utt])
        n_valid = int(dev_valid.sum())
        assert n_valid == len(host_wins)
        np.testing.assert_allclose(
            dev_wins[:n_valid], host_wins, atol=2e-3
        )
        # labels replicated per window
        np.testing.assert_array_equal(
            np.asarray(ds.labels_emo[i * w_per_utt : (i + 1) * w_per_utt]),
            emo[i],
        )


def test_prepare_waves_reflect_padding(rng):
    w = rng.standard_normal(5000).astype(np.float32)
    padded, frames = prepare_waves([w], n_fft=800)
    assert frames[0] == 1 + 5000 // 160
    np.testing.assert_allclose(padded[0, 400:5400], w)
    np.testing.assert_allclose(padded[0, 399], w[1])  # reflect
    np.testing.assert_allclose(padded[0, 5400], w[-2])


def test_device_dataset_batch_slicing(rng):
    waves, spk = _mini_corpus(rng, n=4)
    ds = device_ingest(waves, spk, spk, spk, n_mels=16, win_len=40, shift_len=10)
    idx = jnp.asarray([0, 2, 1])
    b = ds.batch(idx)
    assert b["spec"].shape == (3, 40, 16, 1)
    np.testing.assert_array_equal(
        np.asarray(b["labels_emo"]), np.asarray(ds.labels_emo[idx])
    )

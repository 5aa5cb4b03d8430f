"""Inference / serving API: raw waveform -> emotion (and gender) predictions.

The reference has no inference path outside its evaluation scripts; serving a
trained model means re-running chunks of training_*.py.  This module packages
the deployment story: load checkpoints once, then a single jitted program per
utterance-batch runs

    waveform -> mel frontend (MXU GEMM chain) -> per-utterance znorm*
             -> sliding windows -> [optional cloak noise] -> backbone
             -> softmax-mean vote

(*) deployment note: training normalizes per SPEAKER over the training
corpus (preprocess_adversary_data.py:356-390); at serving time the speaker is
unknown, so the predictor normalizes per utterance — the standard deployment
approximation.  Pass ``norm_stats=(mean, std)`` to use fixed corpus
statistics instead.

Use :class:`CloakedPredictor` to serve the privacy-preserving path: the
stored noise parameters are applied to features before classification, so
the served representation is the noised one (what the paper's threat model
exposes to downstream consumers — adversary_cloak_evaluation.py:78-83).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sept_tpu.data.device_pipeline import prepare_waves
from sept_tpu.models import CloakNoise, build_backbone, pooling_for
from sept_tpu.ops import frontend as F

__all__ = ["Predictor", "CloakedPredictor"]


class Predictor:
    """Batch waveform -> class probabilities, fully jitted per bucket shape."""

    def __init__(
        self,
        params,
        batch_stats,
        model_type: str = "2d-cnn-lstm",
        pred: str = "emotion",
        hidden_size: int = 64,
        feature_len: int = 128,
        win_len: int = 200,
        shift_len: int = 50,
        n_fft: int = 800,
        norm_stats: Optional[tuple] = None,
    ):
        self.model = build_backbone(model_type, hidden_size=hidden_size, pred=pred)
        self.pooling = pooling_for(model_type)
        self.params = params
        self.batch_stats = batch_stats
        self.feature_len = feature_len
        self.win_len = win_len
        self.shift_len = shift_len
        self.n_fft = n_fft
        self.norm_stats = norm_stats

    def _features(self, padded, n_frames_max):
        def one(w):
            spec = F.stft_power(w, self.n_fft, 160, center=False)
            fb = jnp.asarray(
                F.melscale_fbanks(self.n_fft // 2 + 1, 0.0, 8000.0,
                                  self.feature_len, 16000)
            )
            mel = jnp.dot(spec.T, fb, precision=F.PARITY_PRECISION,
                          preferred_element_type=jnp.float32)
            return F.amplitude_to_db(mel.T, "power", None).T  # (T, D)

        return jax.vmap(one)(padded)[:, :n_frames_max]

    def _normalize(self, feats, frame_valid):
        if self.norm_stats is not None:
            mean, std = self.norm_stats
            return (feats - mean) / (std + 1e-5)
        m = frame_valid[..., None]
        count = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(feats * m, axis=1, keepdims=True) / count
        var = jnp.sum(((feats - mean) ** 2) * m, axis=1, keepdims=True) / count
        return ((feats - mean) / (jnp.sqrt(var) + 1e-5)) * m

    def _noise(self, windows, rng):  # hook for CloakedPredictor
        return windows

    @functools.partial(jax.jit, static_argnames=("self", "max_t"))
    def _predict(self, padded, n_frames, *, max_t, rng):
        b = padded.shape[0]
        feats = self._features(padded, max_t)  # (B, T, D)
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (b, max_t), 1) < n_frames[:, None]
        ).astype(jnp.float32)
        feats = self._normalize(feats, valid)
        if max_t < self.win_len:
            feats = jnp.pad(feats, ((0, 0), (0, self.win_len - max_t), (0, 0)))
        n_win = max(0, (feats.shape[1] - self.win_len) // self.shift_len) + 1
        starts = jnp.arange(n_win) * self.shift_len
        idx = starts[:, None] + jnp.arange(self.win_len)[None, :]
        wins = feats[:, idx, :]  # (B, W, win, D)
        wins = self._noise(wins, rng)
        flat = wins.reshape(b * n_win, self.win_len, self.feature_len, 1)
        logits = self.model.apply(
            {"params": self.params, "batch_stats": self.batch_stats}, flat,
            pooling=self.pooling,
        )
        probs = jax.nn.softmax(logits, -1).reshape(b, n_win, -1)
        n_valid = jnp.maximum((n_frames - self.win_len) // self.shift_len, 0) + 1
        wvalid = jnp.arange(n_win)[None, :] < n_valid[:, None]
        return jnp.sum(probs * wvalid[..., None], axis=1) / jnp.maximum(
            jnp.sum(wvalid, axis=1)[:, None], 1
        )

    def predict(self, waveforms: list[np.ndarray], seed: int = 0) -> np.ndarray:
        """list of 16 kHz float32 waveforms -> (B, n_classes) probabilities."""
        padded, n_frames = prepare_waves(waveforms, self.n_fft)
        return np.asarray(
            self._predict(
                jnp.asarray(padded),
                jnp.asarray(n_frames),
                max_t=int(n_frames.max()),
                rng=jax.random.PRNGKey(seed),
            )
        )


class CloakedPredictor(Predictor):
    """Predictor that applies trained cloak noise to features before the
    backbone — serving the privacy-preserving representation."""

    def __init__(self, *args, noise_params=None, mask=None,
                 max_scale: float = 5.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.noise = CloakNoise(
            win_len=self.win_len, n_feats=self.feature_len, max_scale=max_scale
        )
        self.noise_params = {"params": noise_params}
        self.mask = None if mask is None else jnp.asarray(mask)

    def _noise(self, windows, rng):
        b, w = windows.shape[:2]
        flat = windows.reshape(b * w, self.win_len, self.feature_len)
        out = self.noise.apply(
            self.noise_params, flat, self.mask, rngs={"noise": rng}
        )
        return out.reshape(windows.shape)

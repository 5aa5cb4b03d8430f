"""Cloak noise-injection models (the paper's core privacy mechanism).

Re-implements /root/reference/model/cloak_models.py as Flax modules:

- ``CloakNoise``        = ``cloak_noise``               (cloak_models.py:24-58)
- ``CloakedModel``      = ``two_d_cnn_lstm_syn``        (:61-130)
- ``CloakedModelGRL``   = ``two_d_cnn_lstm_syn_with_grl`` (:133-226)

Faithful behavioral details (SURVEY.md §2.6 item 7):

- noise scales: ``(1 + tanh(rho)) / 2 * (max - min) + min`` with rho init -2
  (``ones - 3``, cloak_models.py:33,41-43); min=0.01, max=10 at training,
  max=5 at evaluation (training drivers construct the module with these).
- epsilon is sampled from **N(0, 0.1)** — std 0.1, not 1 (:37) — so the
  effective noise std is ``0.1 * scales()``.
- with a suppression mask, the mask gates the input and epsilon but **not**
  the learned mean: ``x*mask + (locs + scales()*eps*mask)`` (:45-58).

Idiomatic divergences (documented; reference behavior was buggy):

- The reference's BatchNorm "freeze" never fires (isinstance check over
  ``parameters()``, :69-76), so the frozen backbone's BN running stats drift
  during cloak training.  Here the frozen backbone always runs with
  ``use_running_average=True`` (eval-mode BN), the correct freeze.
- Parameter freezing is expressed at the optimizer level
  (``optax.multi_transform`` partitions in sept_tpu.train.optim) rather than
  ``requires_grad`` mutation; gradients still flow *through* the frozen
  backbone into the noise parameters, exactly as in the reference.

Both composite models return the noised input ``noisy`` (stop-gradient'd,
= ``x.detach()`` at cloak_models.py:89) so evaluation can feed it to frozen
emotion / adversary models (adversary_cloak_evaluation.py:78-83).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sept_tpu.ops.grl import gradient_reversal

__all__ = ["CloakNoise", "CloakedModel", "CloakedModelGRL"]


class CloakNoise(nn.Module):
    """Learnable per-cell Gaussian noise layer, (win_len, n_feats).

    Parameters ``locs`` (mu, init 0) and ``rhos`` (init -2).  Sampling uses
    the 'noise' PRNG collection; pass ``rngs={'noise': key}`` when applying.
    """

    win_len: int = 200
    n_feats: int = 128
    min_scale: float = 0.01
    max_scale: float = 10.0
    eps_std: float = 0.1  # reference samples eps ~ N(0, 0.1) (cloak_models.py:37)

    def setup(self):
        shape = (self.win_len, self.n_feats)
        self.locs = self.param("locs", nn.initializers.zeros, shape)
        self.rhos = self.param(
            "rhos", lambda key, s: jnp.full(s, -2.0, dtype=jnp.float32), shape
        )

    def scales(self) -> jax.Array:
        """tanh-squashed noise scale in [min_scale, max_scale]."""
        return (1.0 + jnp.tanh(self.rhos)) / 2.0 * (
            self.max_scale - self.min_scale
        ) + self.min_scale

    def sample_noise(
        self, mask: Optional[jax.Array] = None, sign: float = 1.0
    ) -> jax.Array:
        """``sign`` flips the epsilon draw: evaluating the loss at both
        +eps and -eps from the SAME key (antithetic pair) cancels the
        first-order noise of the sigma gradient and leaves the curvature
        signal that actually differentiates the per-cell scales."""
        eps = sign * self.eps_std * jax.random.normal(
            self.make_rng("noise"), self.rhos.shape, dtype=jnp.float32
        )
        if mask is not None:
            eps = eps * mask
        return self.locs + self.scales() * eps

    def __call__(
        self, x: jax.Array, mask: Optional[jax.Array] = None,
        sign: float = 1.0,
    ) -> jax.Array:
        """x: (..., win_len, n_feats); one shared noise draw per call."""
        noise = self.sample_noise(mask, sign)
        if mask is None:
            return x + noise
        return x * mask + noise


class CloakedModel(nn.Module):
    """Noise layer prepended to a (frozen) backbone; returns (logits, noisy).

    = ``two_d_cnn_lstm_syn`` (cloak_models.py:61-130).  The backbone is any
    ``Conv2dBiRNN``-family module; its parameters live under the 'backbone'
    scope so the optimizer can freeze them by path (see
    sept_tpu.train.optim.partition_cloak_params).
    """

    backbone: nn.Module
    win_len: int = 200
    n_feats: int = 128
    min_scale: float = 0.01
    max_scale: float = 10.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, T, D, 1)
        global_feature: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        train: bool = False,
        pooling: Optional[str] = "mean",
        noise_sign: float = 1.0,
    ):
        noise = CloakNoise(
            win_len=self.win_len,
            n_feats=self.n_feats,
            min_scale=self.min_scale,
            max_scale=self.max_scale,
            name="noise",
        )
        noised = noise(x[..., 0], mask=mask, sign=noise_sign)[..., None]  # (B, T, D, 1)
        noisy = jax.lax.stop_gradient(noised)
        # frozen backbone: always eval-mode (BN running stats, no dropout);
        # gradients flow through to the noise parameters.
        logits = self.backbone(
            noised, global_feature=global_feature, train=False, pooling=pooling
        )
        return logits, noisy


class CloakedModelGRL(nn.Module):
    """Cloak + frozen emotion backbone + trainable GRL gender adversary.

    = ``two_d_cnn_lstm_syn_with_grl`` (cloak_models.py:133-226).  The gender
    branch sees the noised input through a gradient-reversal layer
    (lambda = ``grl_lambda``, :152), so in a single fused backward:

    - emotion loss  -> pushes noise params toward keeping SER utility,
    - gender loss   -> trains the gender adversary normally, while its
                       reversed gradient pushes noise params to *hurt*
                       gender inference.

    Returns ``(emotion_logits, gender_logits, noisy)``.
    """

    emotion_backbone: nn.Module
    gender_backbone: nn.Module
    grl_lambda: float = 0.1
    win_len: int = 200
    n_feats: int = 128
    min_scale: float = 0.01
    max_scale: float = 10.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        global_feature: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        train: bool = False,
        pooling: Optional[str] = "mean",
        noise_sign: float = 1.0,
    ):
        noise = CloakNoise(
            win_len=self.win_len,
            n_feats=self.n_feats,
            min_scale=self.min_scale,
            max_scale=self.max_scale,
            name="noise",
        )
        noised = noise(x[..., 0], mask=mask, sign=noise_sign)[..., None]
        noisy = jax.lax.stop_gradient(noised)

        emo_logits = self.emotion_backbone(
            noised, global_feature=global_feature, train=False, pooling=pooling
        )
        # GRL sits between the noised input and the (trainable) gender model
        # (cloak_models.py:152 wraps gender.conv in Sequential(GRL, conv)).
        reversed_in = gradient_reversal(noised, self.grl_lambda)
        gender_logits = self.gender_backbone(
            reversed_in, global_feature=global_feature, train=train, pooling=pooling
        )
        return emo_logits, gender_logits, noisy

"""Sliding-window softmax-vote inference, vmapped and jitted.

The reference's test-time protocol (batch size 1, a Python loop sliding a
win_len=200 window with stride 50 per utterance, softmax each window, mean
the probabilities, argmax — /root/reference/training/training_cloak.py:66-81,
training_adversary_baselines.py:69-85) becomes one jitted call per padded
utterance-batch:

- test utterances arrive padded to a shared max frame count with a
  ``lengths`` vector (sept_tpu.data.pipeline);
- ALL window positions are computed batched (windows x batch fused into one
  model forward), then windows whose start exceeds the utterance's valid
  range are masked out of the probability mean;
- valid count matches the reference formula (T - win)//shift + 1, with a
  minimum of one window (short utterances were zero-padded upstream).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sliding_vote", "make_sliding_vote_fn"]


def _window_starts(max_t: int, win_len: int, shift_len: int) -> np.ndarray:
    n = max(0, (max_t - win_len) // shift_len) + 1
    return np.arange(n) * shift_len


def make_sliding_vote_fn(
    logits_fn: Callable,
    win_len: int = 200,
    shift_len: int = 50,
):
    """Build a jitted sliding-vote evaluator around a logits function.

    ``logits_fn(spec_batch, global_batch) -> (N, C) logits`` where spec_batch
    is (N, win_len, D, 1).  Returns
    ``vote(specs (B, max_T, D), lengths (B,), global (B, 88)) ->
    (probs (B, C), n_valid (B,))``.
    """

    @functools.partial(jax.jit, static_argnames=("max_t",))
    def vote(specs, lengths, global_feature, *, max_t):
        starts = jnp.asarray(_window_starts(max_t, win_len, shift_len))
        n_win = starts.shape[0]
        b = specs.shape[0]

        # (B, n_win, win_len, D): gather windows
        idx = starts[:, None] + jnp.arange(win_len)[None, :]  # (n_win, win)
        wins = specs[:, idx, :]  # (B, n_win, win_len, D)
        wins = wins.reshape(b * n_win, win_len, specs.shape[-1], 1)
        g = (
            jnp.repeat(global_feature, n_win, axis=0)
            if global_feature is not None
            else None
        )
        logits = logits_fn(wins, g)  # (B*n_win, C)
        probs = jax.nn.softmax(logits, axis=-1).reshape(b, n_win, -1)

        # reference valid-window count: (T - win)//shift + 1, min 1
        n_valid = jnp.maximum((lengths - win_len) // shift_len, 0) + 1
        valid = jnp.arange(n_win)[None, :] < n_valid[:, None]  # (B, n_win)
        mean_probs = jnp.sum(probs * valid[..., None], axis=1) / jnp.maximum(
            jnp.sum(valid, axis=1)[:, None], 1
        )
        return mean_probs, n_valid

    def call(specs, lengths, global_feature=None):
        return vote(
            jnp.asarray(specs),
            jnp.asarray(lengths),
            None if global_feature is None else jnp.asarray(global_feature),
            max_t=int(specs.shape[1]),
        )

    return call


def sliding_vote(
    logits_fn: Callable,
    specs,
    lengths,
    global_feature=None,
    win_len: int = 200,
    shift_len: int = 50,
):
    """One-shot helper: returns (predictions (B,), mean_probs (B, C))."""
    fn = make_sliding_vote_fn(logits_fn, win_len, shift_len)
    probs, _ = fn(specs, lengths, global_feature)
    return np.asarray(jnp.argmax(probs, axis=-1)), np.asarray(probs)

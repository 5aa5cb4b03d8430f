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

Model parameters are explicit arguments of the jitted program (not closure
captures), so ONE compiled executable serves every epoch of a fold — a fresh
closure per epoch would retrace and recompile each time (compiles over a
tunneled chip cost minutes).

``head_sizes`` splits multi-head logits (e.g. (4, 2) for a joint
emotion+gender evaluator) and softmaxes each head separately before voting —
used by the utility-privacy sweep to run the noised windows through both
frozen models in one pass (adversary_cloak_evaluation.py:78-83).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sliding_vote", "make_sliding_vote_fn"]


def make_sliding_vote_fn(
    logits_fn: Callable,
    win_len: int = 200,
    shift_len: int = 50,
    head_sizes: Optional[Sequence[int]] = None,
):
    """Build a jitted sliding-vote evaluator around a logits function.

    ``logits_fn(params, batch_stats, spec_batch (N, win, D, 1), global)
    -> (N, C) logits`` (C = sum(head_sizes) when multi-head).  Returns
    ``vote(params, batch_stats, specs (B, max_T, D), lengths (B,),
    global (B, 88)) -> (probs (B, C), n_valid (B,))`` with per-head softmax.
    """
    heads = tuple(head_sizes) if head_sizes is not None else None

    @functools.partial(jax.jit, static_argnames=("max_t",))
    def vote(params, batch_stats, specs, lengths, global_feature, *, max_t):
        n_win = max(0, (max_t - win_len) // shift_len) + 1
        starts = jnp.arange(n_win) * shift_len
        b = specs.shape[0]

        idx = starts[:, None] + jnp.arange(win_len)[None, :]  # (n_win, win)
        wins = specs[:, idx, :]  # (B, n_win, win_len, D)
        wins = wins.reshape(b * n_win, win_len, specs.shape[-1], 1)
        g = (
            jnp.repeat(global_feature, n_win, axis=0)
            if global_feature is not None
            else None
        )
        logits = logits_fn(params, batch_stats, wins, g)  # (B*n_win, C)
        if heads is None:
            probs = jax.nn.softmax(logits, axis=-1)
        else:
            parts, off = [], 0
            for h in heads:
                parts.append(jax.nn.softmax(logits[:, off : off + h], axis=-1))
                off += h
            probs = jnp.concatenate(parts, axis=-1)
        probs = probs.reshape(b, n_win, -1)

        # reference valid-window count: (T - win)//shift + 1, min 1
        n_valid = jnp.maximum((lengths - win_len) // shift_len, 0) + 1
        valid = jnp.arange(n_win)[None, :] < n_valid[:, None]  # (B, n_win)
        mean_probs = jnp.sum(probs * valid[..., None], axis=1) / jnp.maximum(
            jnp.sum(valid, axis=1)[:, None], 1
        )
        return mean_probs, n_valid

    def call(params, batch_stats, specs, lengths, global_feature=None):
        return vote(
            params,
            batch_stats,
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
    """One-shot helper for a closure-style ``logits_fn(wins, g)``.

    Returns (predictions (B,), mean_probs (B, C)).
    """
    fn = make_sliding_vote_fn(
        lambda params, stats, wins, g: logits_fn(wins, g), win_len, shift_len
    )
    probs, _ = fn(None, None, specs, lengths, global_feature)
    return np.asarray(jnp.argmax(probs, axis=-1)), np.asarray(probs)

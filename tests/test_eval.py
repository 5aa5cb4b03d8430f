"""Eval tests: sliding-window vote semantics and suppression masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sept_tpu.eval.sliding import make_sliding_vote_fn
from sept_tpu.eval.sweep import eval_mask, train_mask


def test_sliding_vote_matches_reference_loop():
    """Vote must equal the reference's per-window softmax-mean
    (training_cloak.py:66-81) computed in a plain Python loop."""
    win, shift, d = 20, 5, 8
    rng = np.random.default_rng(8)
    w = rng.standard_normal((win * d, 3)).astype(np.float32)  # fake "model"

    def logits_fn(params, stats, wins, g):
        flat = wins[..., 0].reshape(wins.shape[0], -1)
        return jnp.asarray(flat) @ jnp.asarray(w)

    lengths = np.array([60, 35, 20, 23], dtype=np.int32)
    max_t = 60
    specs = np.zeros((4, max_t, d), dtype=np.float32)
    for i, t in enumerate(lengths):
        specs[i, :t] = rng.standard_normal((t, d))

    vote = make_sliding_vote_fn(logits_fn, win, shift)
    probs, n_valid = vote(None, None, specs, lengths, None)

    # reference loop
    for i, t in enumerate(lengths):
        n = max(0, (t - win) // shift) + 1
        assert int(n_valid[i]) == n
        ps = []
        for k in range(n):
            window = specs[i, k * shift : k * shift + win]
            logit = window.reshape(-1) @ w
            e = np.exp(logit - logit.max())
            ps.append(e / e.sum())
        np.testing.assert_allclose(np.asarray(probs)[i], np.mean(ps, 0), atol=1e-5)


def test_mask_directions_differ():
    """Reference quirk 8: train masks the TOP-ratio% noisiest cells; eval
    masks cells above percentile(ratio)."""
    scales = np.arange(100, dtype=np.float32).reshape(10, 10)
    tm = train_mask(scales, 20)  # zero top 20% -> 20 zeros
    em = eval_mask(scales, 20)  # zero above p20 -> ~80 zeros
    assert tm.sum() == pytest.approx(80, abs=1)
    assert em.sum() == pytest.approx(20, abs=1)
    assert train_mask(scales, 0) is None and eval_mask(scales, 0) is None
    # both zero the HIGHEST-scale cells
    assert tm[9, 9] == 0 and em[9, 9] == 0
    assert tm[0, 0] == 1 and em[0, 0] == 1


def test_mask_direction_flag_plumbs():
    """--mask_direction selects the training-mask convention (default =
    reference's train direction; 'eval' trains under the sweep's mask)."""
    import argparse

    from sept_tpu.cli.common import add_common_args, config_from_args

    p = argparse.ArgumentParser()
    add_common_args(p)
    cfg = config_from_args(p.parse_args(["--mask_direction", "eval"]))
    assert cfg.mask_direction == "eval"
    assert config_from_args(p.parse_args([])).mask_direction == "train"

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


def test_evaluate_cloaked_test_consumes_globals():
    """use_global: the sweep must hand each utterance's 88-dim vector to the
    frozen models (the reference's --global_feature eval path omits it and
    crashes on global-width models, adversary_cloak_evaluation.py:83-84 vs
    :216-236 — fixed idiomatically here)."""
    from sept_tpu.data.pipeline import SplitArrays
    from sept_tpu.eval.sweep import evaluate_cloaked_test

    rng = np.random.default_rng(0)
    m, t, d, win = 6, 24, 8, 12
    w = jnp.asarray(rng.standard_normal((d * win, 4)).astype(np.float32))
    wg = jnp.asarray(rng.standard_normal((88, 4)).astype(np.float32))

    def logits(wins, g):
        flat = wins[..., 0].reshape(wins.shape[0], -1) @ w
        return flat + (g @ wg if g is not None else 0.0)

    def split(gdata):
        return SplitArrays(
            windows=rng.standard_normal((m, t, d)).astype(np.float32),
            labels_emo=(np.arange(m) % 4).astype(np.int32),
            labels_gen=(np.arange(m) % 2).astype(np.int32),
            lengths=np.full(m, t, np.int32),
            global_data=gdata,
            speaker_ids=np.asarray([f"s{i}" for i in range(m)], object),
            datasets=np.asarray(["x"] * m, object),
            utt_ids=np.asarray([f"u{i}" for i in range(m)], object),
        )

    g1 = rng.standard_normal((m, 88)).astype(np.float32)
    test1, test2 = split(g1), split(g1 * 50.0)
    # identical windows; only the globals differ between the two splits
    test2.windows[:] = test1.windows

    kw = dict(win_len=win, shift_len=win // 2, batch_size=4, use_global=True)
    traces = {"n": 0}

    def joint(fn_params, wins, g, mask, key):
        # identity cloak: isolate the globals; fn_params carries the head
        traces["n"] += 1  # increments per TRACE, not per call
        out = logits(wins, g)
        return jnp.concatenate([out, out[:, :2]], axis=-1)

    b1, _ = evaluate_cloaked_test(joint, None, test1, None, **kw)
    b2, _ = evaluate_cloaked_test(joint, None, test2, None, **kw)
    # scaled globals must move the vote; identical call twice must not
    b1b, _ = evaluate_cloaked_test(joint, None, test1, None, **kw)
    # the whole sweep shares ONE compiled vote: same fn identity + shapes
    # must not retrace per call (the old closure-per-cell design recompiled
    # the full two-backbone forward for every (ratio, fold) pair)
    assert traces["n"] == 1, traces["n"]
    assert b1["acc"] == b1b["acc"] and b1["rec"] == b1b["rec"]
    np.testing.assert_array_equal(b1["conf"], b1b["conf"])
    assert not np.array_equal(b1["conf"], b2["conf"])


def test_uar_counts_pred_only_classes_like_sklearn():
    """sklearn macro recall averages over the UNION of truth and pred
    labels (the reference metric, training_tools.py:142): a class appearing
    only in predictions contributes recall 0.  Averaging over truth-present
    classes only inflated UAR for degenerate models."""
    from sklearn.metrics import recall_score

    from sept_tpu.eval import uar

    truth = np.asarray([0, 0, 1, 1])
    pred = np.asarray([0, 1, 1, 2])  # class 2 never occurs in truth
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        expect = recall_score(truth, pred, average="macro")
    assert uar(truth, pred) == pytest.approx(expect)  # (0.5+0.5+0)/3

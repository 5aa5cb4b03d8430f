"""Regression tests for code-review findings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sept_tpu.models import CloakedModel, Conv2dBiRNN, build_backbone
from sept_tpu.train import ExperimentConfig, make_cloak_optimizer, make_cloak_step
from sept_tpu.train.steps import TrainState

T, D = 40, 32
KEY = jax.random.PRNGKey(8)


@pytest.mark.slow
def test_suppression_freezes_rhos_but_not_locs():
    """Reference: suppression runs freeze rhos, train only locs
    (training_cloak.py:367)."""
    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-2)
    backbone = Conv2dBiRNN(hidden_size=8, pred="emotion")
    model = CloakedModel(backbone=backbone, win_len=T, n_feats=D)
    x = jax.random.normal(KEY, (8, T, D, 1))
    v = jax.jit(model.init)({"params": KEY, "noise": KEY}, x)
    tx = make_cloak_optimizer(cfg, 10, v["params"], ("noise",), freeze_rhos=True)
    state = TrainState(params=v["params"], batch_stats=v["batch_stats"],
                       opt_state=tx.init(v["params"]), rng=KEY,
                       step=jnp.zeros((), jnp.int32))
    step = make_cloak_step(model, tx, scale_lambda=0.0, apply_scale_reg=False)
    batch = {
        "spec": x, "labels_emo": jnp.zeros(8, jnp.int32),
        "labels_gen": jnp.zeros(8, jnp.int32), "global": jnp.zeros((8, 88)),
        "weight": jnp.ones(8),
    }
    mask = jnp.ones((T, D))
    s1, _ = step(state, batch, mask)
    assert float(jnp.max(jnp.abs(
        s1.params["noise"]["rhos"] - state.params["noise"]["rhos"]))) == 0.0
    assert float(jnp.max(jnp.abs(
        s1.params["noise"]["locs"] - state.params["noise"]["locs"]))) > 0.0


@pytest.mark.slow
def test_build_backbone_2d_cnn_with_cli_kwargs():
    """The CLI always passes attention_size; 2d-cnn must not crash."""
    m = build_backbone("2d-cnn", hidden_size=64, pred="emotion", att=None,
                       attention_size=128)
    x = jax.random.normal(KEY, (2, T, D, 1))
    v = jax.jit(m.init)({"params": KEY}, x)
    out = m.apply(v, x)
    assert out.shape == (2, 4)


def test_min_scale_plumbed_through_cloak():
    from sept_tpu.train.steps import cloak_scales

    backbone = Conv2dBiRNN(hidden_size=8, pred="emotion")
    model = CloakedModel(backbone=backbone, win_len=T, n_feats=D,
                         min_scale=0.5, max_scale=2.0)
    x = jnp.zeros((1, T, D, 1))
    v = jax.jit(model.init)({"params": KEY, "noise": KEY}, x)
    scales = np.asarray(cloak_scales(model, v["params"]))
    expect = (1 + np.tanh(-2.0)) / 2 * (2.0 - 0.5) + 0.5
    np.testing.assert_allclose(scales, expect, rtol=1e-3)
    assert scales.min() >= 0.5


def test_short_test_utterance_pad_rows_are_normalized():
    """Reference pads test windows BEFORE normalization, so pad rows become
    (0 - mean)/std, not raw zeros (preprocess_adversary_data.py:29-34,373-385)."""
    from sept_tpu.data import FoldPlan, assemble_fold, make_corpus

    corpus = make_corpus(n_speakers=6, utts_per_speaker=3, seed=8)
    rng = np.random.default_rng(0)
    # short utterances for the test speaker, with non-zero mean features
    store = {
        u.utt_id: {"mel1": (rng.standard_normal((16, 30)) + 5.0).astype(np.float32)}
        for u in corpus.manifest
    }
    spk = sorted({u.speaker_id for u in corpus.manifest})
    plan = FoldPlan(1, tuple(spk[:2]), (spk[2],), (spk[3],), (spk[4],), (spk[5],))
    fold = assemble_fold(corpus.manifest, store, plan, dataset="synthetic",
                         feature_len=16, win_len=60, norm="znorm", aug=None)
    # test utterances have 30 < win_len frames; rows 30.. must be normalized
    # zeros = (0 - mean)/(std + 1e-5), strongly negative for mean≈5 features
    assert fold.test.windows.shape[1] == 60
    pad_region = fold.test.windows[0, 30:]
    assert np.all(pad_region < -1.0), pad_region.mean()


def test_vote_cache_pins_logits_fn_against_id_reuse():
    """The vote cache is keyed on id(logits_fn); the entry must hold a strong
    reference to logits_fn so CPython cannot recycle the id for a new
    function while the compiled program is cached (round-1 review finding)."""
    import gc
    import weakref

    from sept_tpu.train import loop as L

    def make_fn():
        def logits_fn(params, batch_stats, wins, g):
            return jnp.zeros((wins.shape[0], 4))

        return logits_fn

    fn = make_fn()
    vote = L._cached_vote(fn, 20, 5)
    ref = weakref.ref(fn)
    key = (id(fn), 20, 5)
    del fn
    gc.collect()
    # still alive: pinned by the cache entry, so the id cannot be reused
    assert ref() is not None
    assert L._VOTE_CACHE[key][0] is ref()
    # same fn + geometry returns the same compiled program
    assert L._cached_vote(ref(), 20, 5) is vote
    # a DIFFERENT fn landing on the same key (simulated id collision) must
    # not be handed the stale program
    other = make_fn()
    entry = L._VOTE_CACHE.pop(key)
    L._VOTE_CACHE[(id(other), 20, 5)] = entry  # poison: stale fn under other's id
    assert L._cached_vote(other, 20, 5) is not vote
    L._VOTE_CACHE.clear()


@pytest.mark.slow
def test_scanned_val_pass_matches_single_forward():
    """make_val_pass must reproduce the MEAN-OF-PER-BATCH-MEANS loss (what
    the per-step path and the reference's np.mean(train_loss_list) feed to
    plateau/early-stop — training_adversary_baselines.py:205) and the
    predictions of one whole-split forward.  n=21, batch 8: the short last
    batch weighs 1/3, not 5/21, distinguishing this from a global mean."""
    from sept_tpu.data.pipeline import SplitArrays
    from sept_tpu.train.device_loop import DeviceSplit, make_val_pass
    from sept_tpu.train.steps import weighted_ce

    model = Conv2dBiRNN(hidden_size=8, pred="emotion")
    n, bsz = 21, 8  # pads to 24 = 3 batches
    rng = np.random.default_rng(0)
    windows = rng.standard_normal((n, T, D)).astype(np.float32)
    labels = (np.arange(n) % 4).astype(np.int32)
    split = SplitArrays(
        windows=windows, labels_emo=labels,
        labels_gen=(np.arange(n) % 2).astype(np.int32),
        lengths=np.full(n, T, np.int32),
        global_data=np.zeros((n, 88), np.float32),
        speaker_ids=np.array(["s"] * n), datasets=np.array(["synthetic"] * n),
        utt_ids=np.array([f"u{i}" for i in range(n)]),
    )
    ds = DeviceSplit(split, "labels_emo", bsz)
    v = jax.jit(model.init)({"params": KEY}, jnp.asarray(windows[:2])[..., None])

    def apply_logits(p, bs, x, g=None):
        return model.apply({"params": p, "batch_stats": bs}, x[..., None])

    val = make_val_pass(apply_logits)
    loss_b, preds_b = val(v["params"], v["batch_stats"], ds.windows, ds.labels,
                          ds.weights, n_batches=ds.n_batches,
                          batch_size=ds.batch_size)
    logits = apply_logits(v["params"], v["batch_stats"], ds.windows)
    batch_losses = [
        float(weighted_ce(logits[lo:lo + bsz], ds.labels[lo:lo + bsz],
                          ds.weights[lo:lo + bsz]))
        for lo in range(0, ds.n_batches * bsz, bsz)
    ]
    assert float(loss_b) == pytest.approx(np.mean(batch_losses), rel=1e-5)
    # and it must NOT be the global weighted mean (they differ on the
    # 21-row split — that difference shifted LR schedules between drivers)
    loss_global = float(weighted_ce(logits, ds.labels, ds.weights))
    assert abs(float(loss_b) - loss_global) > 1e-7
    np.testing.assert_array_equal(
        np.asarray(preds_b), np.asarray(jnp.argmax(logits, -1))
    )


def test_manifest_saved_per_fold(tmp_path):
    from sept_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path))
    params = {"w": jnp.ones(3)}
    ckpt.save("baseline_emotion", 1, params, manifest={"fold": 1})
    ckpt.save("baseline_emotion", 2, params, manifest={"fold": 2})
    import json, os

    base = os.path.join(str(tmp_path), "baseline_emotion")
    m1 = json.load(open(os.path.join(base, "manifest_fold1.json")))
    m2 = json.load(open(os.path.join(base, "manifest_fold2.json")))
    assert m1["fold"] == 1 and m2["fold"] == 2


def _toy_split(n, speakers, datasets):
    from sept_tpu.data.pipeline import SplitArrays

    rng = np.random.default_rng(1)
    return SplitArrays(
        windows=rng.standard_normal((n, T, D)).astype(np.float32),
        labels_emo=(np.arange(n) % 4).astype(np.int32),
        labels_gen=(np.arange(n) % 2).astype(np.int32),
        lengths=np.full(n, T, np.int32),
        global_data=np.zeros((n, 88), np.float32),
        speaker_ids=np.asarray(speakers, object),
        datasets=np.asarray(datasets, object),
        utt_ids=np.asarray([f"u{i}" for i in range(n)], object),
    )


def test_eval_epoch_weights_combine_validation_like_reference():
    """Combine-mode VALIDATION loss must be sum(ce_i*w_i)/len(preds) per
    batch — the reference's loss block (training_adversary_baselines.py:
    175-179) runs in validate mode too, so plateau/early-stop see the
    speaker-weighted statistic.  Previously run_eval_epoch ignored
    spk_weights entirely and divided by sum(w)."""
    from sept_tpu.train import ExperimentConfig, run_eval_epoch
    from sept_tpu.train.steps import TrainState

    n, bsz = 6, 4  # one full batch + one padded (2 real rows)
    split = _toy_split(n, ["a", "a", "b", "b", "c", "c"], ["iemocap"] * n)
    spk_w = {"a_iemocap": 2.0, "b_iemocap": 0.25, "c_iemocap": 1.5}
    proj = np.random.default_rng(2).standard_normal((D, 4)).astype(np.float32)

    def logits_fn(params, batch_stats, spec, g=None):
        return jnp.mean(spec[..., 0], axis=1) @ jnp.asarray(proj)

    cfg = ExperimentConfig(batch_size=bsz, pred="emotion")
    state = TrainState(params={}, batch_stats={}, opt_state=None,
                       rng=KEY, step=jnp.zeros((), jnp.int32))
    m = run_eval_epoch(logits_fn, state, split, cfg, spk_weights=spk_w)

    logits = np.asarray(split.windows.mean(axis=1) @ proj)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits)))
    nll = -logp[np.arange(n), split.labels_emo]
    w = np.array([2.0, 2.0, 0.25, 0.25, 1.5, 1.5])
    expected = np.mean([np.sum(nll[:4] * w[:4]) / 4.0,
                        np.sum(nll[4:] * w[4:]) / 2.0])
    assert m["loss"] == pytest.approx(expected, rel=1e-5)
    # the old statistics it must NOT be
    wrong_sum_w = np.mean([np.sum(nll[:4] * w[:4]) / np.sum(w[:4]),
                           np.sum(nll[4:] * w[4:]) / np.sum(w[4:])])
    unweighted = np.mean([np.mean(nll[:4]), np.mean(nll[4:])])
    assert abs(m["loss"] - wrong_sum_w) > 1e-6
    assert abs(m["loss"] - unweighted) > 1e-6


def test_device_val_pass_weights_combine_validation():
    """fit_device's validation epoch must apply the same combine-mode
    speaker weights as the host path (and divide by the REAL row count,
    not sum(w)) — previously the val DeviceSplit was built without the
    weight vector, silently diverging from fit()."""
    from sept_tpu.train.device_loop import (
        DeviceSplit,
        _spk_weight_vec,
        make_val_pass,
    )

    n, bsz = 6, 4
    split = _toy_split(n, ["a", "a", "b", "b", "c", "c"], ["iemocap"] * n)
    spk_w = {"a_iemocap": 2.0, "b_iemocap": 0.25, "c_iemocap": 1.5}
    ds = DeviceSplit(split, "labels_emo", bsz,
                     _spk_weight_vec(split, spk_w))
    proj = np.random.default_rng(2).standard_normal((D, 4)).astype(np.float32)

    def apply_logits(p, bs, x, g=None):
        return x.mean(axis=1) @ jnp.asarray(proj)

    val = make_val_pass(apply_logits)
    loss, _ = val({}, {}, ds.windows, ds.labels, ds.weights,
                  n_batches=ds.n_batches, batch_size=ds.batch_size)

    logits = np.asarray(split.windows.mean(axis=1) @ proj)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits)))
    nll = -logp[np.arange(n), split.labels_emo]
    w = np.array([2.0, 2.0, 0.25, 0.25, 1.5, 1.5])
    expected = np.mean([np.sum(nll[:4] * w[:4]) / 4.0,
                        np.sum(nll[4:] * w[4:]) / 2.0])
    assert float(loss) == pytest.approx(expected, rel=1e-5)


def test_setup_seed_distributed_is_an_explicit_opt_in(monkeypatch):
    """A single-process CLI (featurize/predict/serve) run in a shell that
    still exports the multi-host env must NOT block in
    jax.distributed.initialize waiting for peers; only the mesh-consuming
    CLIs opt in via distributed=True.  A PARTIAL env (coordinator set,
    process vars missing) is a misconfigured multi-host launch and fails
    loudly — silently running each host as an independent full job would
    duplicate work and clobber shared outputs."""
    from sept_tpu.cli.common import setup_seed

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda *a: calls.append(a)
    )
    monkeypatch.setenv("SEPT_COORDINATOR", "head:9999")
    monkeypatch.setenv("SEPT_NUM_PROCESSES", "4")
    monkeypatch.setenv("SEPT_PROCESS_ID", "2")
    setup_seed()  # default: non-mesh CLI — must not touch DCN
    assert calls == []
    setup_seed(distributed=True)
    assert calls == [("head:9999", 4, 2)]
    calls.clear()
    monkeypatch.delenv("SEPT_NUM_PROCESSES")
    monkeypatch.delenv("SEPT_PROCESS_ID")
    with pytest.raises(SystemExit, match="SEPT_NUM_PROCESSES"):
        setup_seed(distributed=True)  # partial env: loud misconfig error
    assert calls == []

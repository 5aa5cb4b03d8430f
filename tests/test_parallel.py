"""Data-parallel sharding tests on the 8-device virtual CPU mesh.

The standard JAX fake-backend pattern (SURVEY.md §4 "Distributed"): assert
that the SAME jitted train step, run with batch-sharded inputs + replicated
params over an 8-device mesh, produces numerically equivalent updates to the
single-device step — XLA inserts the gradient all-reduce from shardings alone.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sept_tpu.models import Conv2dBiRNN
from sept_tpu.parallel import (
    batch_sharding,
    make_mesh,
    pad_batch_to_multiple,
    replicate_state,
    shard_batch,
)
from sept_tpu.train import (
    ExperimentConfig,
    init_state,
    make_baseline_step,
    make_optimizer,
)

# multi-minute on one core: excluded from the default fast lane (pyproject addopts)
pytestmark = pytest.mark.slow

T, D = 40, 32
KEY = jax.random.PRNGKey(8)


def batch(b=16):
    k = jax.random.PRNGKey(3)
    return {
        "spec": np.asarray(jax.random.normal(k, (b, T, D, 1))),
        "labels_emo": np.arange(b, dtype=np.int32) % 4,
        "labels_gen": np.arange(b, dtype=np.int32) % 2,
        "global": np.zeros((b, 88), np.float32),
        "weight": np.ones(b, np.float32),
    }


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_dp_step_matches_single_device():
    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-3, hidden_size=16,
                           weight_decay=0.0)
    model = Conv2dBiRNN(hidden_size=16, pred="emotion")
    tx = make_optimizer(cfg, steps_per_epoch=10)
    b = batch(16)
    state = init_state(model, tx, KEY, {k: jnp.asarray(v) for k, v in b.items()})
    step = make_baseline_step(model, tx)

    # single device
    s_single, m_single = step(state, {k: jnp.asarray(v) for k, v in b.items()})

    # 8-device mesh: replicated state, batch-sharded inputs
    mesh = make_mesh()
    state_rep = replicate_state(state, mesh)
    db = shard_batch(b, mesh)
    assert db["spec"].sharding == batch_sharding(mesh)
    s_dp, m_dp = step(state_rep, db)

    assert float(m_dp["loss"]) == pytest.approx(float(m_single["loss"]), rel=1e-5)
    flat_a = jax.tree.leaves(s_single.params)
    flat_b = jax.tree.leaves(s_dp.params)
    for a, c in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-6)


def test_dp_padding_mask_keeps_loss_exact():
    """Padding the batch to a device multiple must not change the loss."""
    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-3, hidden_size=16,
                           weight_decay=0.0)
    model = Conv2dBiRNN(hidden_size=16, pred="emotion")
    tx = make_optimizer(cfg, steps_per_epoch=10)
    b13 = batch(13)  # not divisible by 8
    state = init_state(
        model, tx, KEY, {k: jnp.asarray(v) for k, v in pad_batch_to_multiple(b13, 8).items()}
    )
    step = make_baseline_step(model, tx)

    padded = pad_batch_to_multiple(b13, 8)
    assert len(padded["weight"]) == 16
    assert padded["weight"].sum() == 13

    mesh = make_mesh()
    s_dp, m_dp = step(replicate_state(state, mesh), shard_batch(padded, mesh))

    # reference: unpadded single-device loss (weight-normalized) — compute
    # with a batch padded by zero-weight rows on one device instead
    s_1, m_1 = step(state, {k: jnp.asarray(v) for k, v in padded.items()})
    assert float(m_dp["loss"]) == pytest.approx(float(m_1["loss"]), rel=1e-5)
    assert float(m_dp["count"]) == 13.0


def _split_arrays(m=32):
    rng = np.random.default_rng(5)
    return (
        rng.standard_normal((m, T, D)).astype(np.float32),
        (np.arange(m) % 4).astype(np.int32),
        (np.arange(m) % 2).astype(np.int32),
        np.where(np.arange(m) < m - 3, 1.0, 0.0).astype(np.float32),
    )


def test_dp_scanned_epoch_matches_single_device():
    """make_epoch_runner_dp (shard_map + psum over the 8-device mesh) must
    reproduce the single-device scanned epoch: same params, losses, counts
    (dropout off, sync-BN on the DP model)."""
    from sept_tpu.parallel.epoch_dp import make_epoch_runner_dp
    from sept_tpu.train.steps import make_epoch_runner

    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-3, hidden_size=16,
                           weight_decay=0.0)
    model = Conv2dBiRNN(hidden_size=16, pred="emotion", dropout_rate=0.0)
    model_sync = Conv2dBiRNN(hidden_size=16, pred="emotion", dropout_rate=0.0,
                             bn_axis_name="data")
    tx = make_optimizer(cfg, steps_per_epoch=10)
    windows, labels, _, weights = _split_arrays(32)
    b0 = {"spec": jnp.asarray(windows[:16])[..., None],
          "labels_emo": jnp.asarray(labels[:16]),
          "labels_gen": jnp.zeros(16, jnp.int32),
          "global": jnp.zeros((16, 88)), "weight": jnp.ones(16)}
    state = init_state(model, tx, KEY, b0)
    order = np.random.default_rng(0).permutation(32)

    run1 = make_epoch_runner(model, tx)
    s1, l1, c1, n1 = run1(
        state, jnp.asarray(windows), jnp.asarray(labels), jnp.asarray(weights),
        jnp.asarray(order), n_batches=2, batch_size=16,
    )

    mesh = make_mesh()
    run8 = make_epoch_runner_dp(model_sync, tx, mesh)
    s8, l8, c8, n8 = run8(
        state, jnp.asarray(windows), jnp.asarray(labels), jnp.asarray(weights),
        jnp.asarray(order), n_batches=2, batch_size=16,
    )

    np.testing.assert_allclose(np.asarray(l8), np.asarray(l1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c8), np.asarray(c1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(n8), np.asarray(n1), atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)
    # batch_stats tolerance is looser than params: sync-BN under DP computes
    # per-shard moments then pmeans them, a different f32 summation order
    # than the single-device one-pass moments; the epsilon depends on the
    # host's XLA:CPU vectorization (measured 4.4e-6 on one host, <3e-6 on
    # another, values O(1)).
    for a, b in zip(jax.tree.leaves(s1.batch_stats), jax.tree.leaves(s8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.parametrize("use_global", [False, True])
def test_dp_cloak_grl_epoch_matches_single_device(use_global):
    """The cloak+GRL minimax scanned epoch under DP == single device
    (shared noise keys broadcast the same (T, D) draw on every shard);
    with use_global the 88-dim rows are gathered per shard batch."""
    from sept_tpu.models import CloakedModelGRL
    from sept_tpu.parallel.epoch_dp import make_cloak_epoch_runner_dp
    from sept_tpu.train import make_cloak_optimizer
    from sept_tpu.train.steps import TrainState, make_cloak_epoch_runner

    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-2, hidden_size=8,
                           weight_decay=0.0)

    def build(sync):
        kw = dict(hidden_size=8, dropout_rate=0.0,
                  bn_axis_name="data" if sync else None)
        return CloakedModelGRL(
            emotion_backbone=Conv2dBiRNN(pred="emotion", **kw),
            gender_backbone=Conv2dBiRNN(pred="gender", **kw),
            grl_lambda=0.5, win_len=T, n_feats=D,
        )

    model, model_sync = build(False), build(True)
    windows, le, lg, weights = _split_arrays(32)
    gdata = (jax.random.normal(jax.random.PRNGKey(5), (32, 88))
             if use_global else None)
    x0 = jnp.asarray(windows[:16])[..., None]
    import functools

    v = jax.jit(functools.partial(model.init, train=True))(
        {"params": KEY, "noise": KEY, "dropout": KEY}, x0,
        global_feature=None if gdata is None else gdata[:16],
    )
    tx = make_cloak_optimizer(cfg, 10, v["params"], ("noise", "gender_backbone"))
    state = TrainState(params=v["params"], batch_stats=v["batch_stats"],
                       opt_state=tx.init(v["params"]), rng=KEY,
                       step=jnp.zeros((), jnp.int32))
    order = np.random.default_rng(1).permutation(32)
    opts = dict(scale_lambda=0.1, gender_lambda=0.3, grl=True,
                apply_scale_reg=True, use_global=use_global)
    gkw = {"globals_": gdata} if use_global else {}

    run1 = make_cloak_epoch_runner(model, tx, **opts)
    s1, l1, c1, n1 = run1(
        state, jnp.asarray(windows), jnp.asarray(le), jnp.asarray(lg),
        jnp.asarray(weights), jnp.asarray(order), None,
        n_batches=2, batch_size=16, **gkw,
    )

    mesh = make_mesh()
    run8 = make_cloak_epoch_runner_dp(model_sync, tx, mesh, **opts)
    s8, l8, c8, n8 = run8(
        state, jnp.asarray(windows), jnp.asarray(le), jnp.asarray(lg),
        jnp.asarray(weights), jnp.asarray(order), None,
        n_batches=2, batch_size=16, **gkw,
    )

    np.testing.assert_allclose(np.asarray(l8), np.asarray(l1), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(c8), np.asarray(c1), atol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)
    # the frozen emotion backbone must not have moved in either path
    for a, b in zip(jax.tree.leaves(state.params["emotion_backbone"]),
                    jax.tree.leaves(s8.params["emotion_backbone"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_device_dp_matches_single_device(tmp_path):
    """fit_device(mesh=8-device) reproduces fit_device(single) epoch-for-epoch
    on a real tiny fold (dropout 0, sync-BN), and the CLI mesh resolver
    drives the same path end-to-end."""
    from sept_tpu.data import FoldPlan, assemble_fold, featurize_corpus, make_corpus
    from sept_tpu.train import init_state, make_eval_logits_fn
    from sept_tpu.train.device_loop import fit_device

    WIN, FD = 50, 32
    corpus = make_corpus(n_speakers=6, utts_per_speaker=4, seed=8,
                         min_dur_s=1.0, max_dur_s=1.5)
    store = featurize_corpus(corpus.waveforms, feature_type="mel_spec",
                             feature_len=FD, include_gemaps=False)
    spk = sorted({u.speaker_id for u in corpus.manifest})
    plan = FoldPlan(1, tuple(spk[:2]), (spk[2],), (spk[3],), (spk[4],), (spk[5],))
    fold = assemble_fold(corpus.manifest, store, plan, dataset="synthetic",
                         feature_len=FD, win_len=WIN, norm="znorm", aug=None)

    cfg = ExperimentConfig(win_len=WIN, feature_len=FD, batch_size=16,
                           num_epochs=2, hidden_size=8, optimizer="sgd",
                           learning_rate=1e-3, weight_decay=0.0,
                           min_select_epoch=0, pred="emotion")
    tx = make_optimizer(cfg, steps_per_epoch=4)

    def run(mesh, model):
        b0 = {
            "spec": jnp.asarray(fold.training.windows[:16])[..., None],
            "labels_emo": jnp.asarray(fold.training.labels_emo[:16]),
            "labels_gen": jnp.asarray(fold.training.labels_gen[:16]),
            "global": jnp.zeros((16, 88)), "weight": jnp.ones(16),
        }
        state = init_state(model, tx, KEY, b0)
        return fit_device(state, model, tx, fold.training, fold.validation,
                          fold.test, cfg, make_eval_logits_fn(model),
                          verbose=False, mesh=mesh)

    r1 = run(None, Conv2dBiRNN(hidden_size=8, pred="emotion", dropout_rate=0.0))
    r8 = run(make_mesh(), Conv2dBiRNN(hidden_size=8, pred="emotion",
                                      dropout_rate=0.0, bn_axis_name="data"))
    for h1, h8 in zip(r1.history, r8.history):
        assert h8["train"]["loss"] == pytest.approx(h1["train"]["loss"], rel=1e-4)
        assert h8["validate"]["loss"] == pytest.approx(h1["validate"]["loss"], rel=1e-4)
    assert r8.final_test_acc == pytest.approx(r1.final_test_acc, abs=1e-6)


def test_dp_epoch_rejects_indivisible_batch():
    from sept_tpu.parallel.epoch_dp import make_epoch_runner_dp

    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-3, hidden_size=16)
    model = Conv2dBiRNN(hidden_size=16, pred="emotion")
    tx = make_optimizer(cfg, steps_per_epoch=10)
    run = make_epoch_runner_dp(model, tx, make_mesh())
    with pytest.raises(ValueError, match="not divisible"):
        run(None, None, None, None, jnp.arange(12), n_batches=1, batch_size=12)


def test_init_distributed_plumbs_to_jax(monkeypatch):
    """Multi-host DCN init forwards coordinator/process args to
    jax.distributed.initialize and no-ops for single-process runs."""
    from sept_tpu.parallel import init_distributed

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda coordinator_address, num_processes, process_id: calls.append(
            (coordinator_address, num_processes, process_id)
        ),
    )
    init_distributed("10.0.0.1:1234", 4, 2)
    assert calls == [("10.0.0.1:1234", 4, 2)]
    init_distributed(None, 1, 0)  # single process: no-op
    init_distributed()
    assert len(calls) == 1


def test_resolve_mesh_dcn_env(monkeypatch):
    """The CLI mesh resolver initializes DCN from SEPT_COORDINATOR env."""
    import argparse

    from sept_tpu.cli.common import resolve_mesh

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda *a: calls.append(a),
    )
    monkeypatch.setenv("SEPT_COORDINATOR", "head:9999")
    monkeypatch.setenv("SEPT_NUM_PROCESSES", "2")
    monkeypatch.setenv("SEPT_PROCESS_ID", "0")
    args = argparse.Namespace(n_devices=8, batch_size=32)
    mesh = resolve_mesh(args)
    assert calls == [("head:9999", 2, 0)]
    assert mesh is not None and mesh.devices.size == 8


def test_resolve_mesh_auto_is_single_on_cpu():
    import argparse

    from sept_tpu.cli.common import resolve_mesh

    assert resolve_mesh(argparse.Namespace(n_devices=0, batch_size=32)) is None
    with pytest.raises(SystemExit, match="divisible"):
        resolve_mesh(argparse.Namespace(n_devices=8, batch_size=12))


def test_resolve_mesh_auto_falls_back_to_dividing_count(monkeypatch):
    """Auto mode (--n_devices 0) must never fail a previously-working
    command: on a topology whose device count doesn't divide the batch, it
    drops to the largest dividing count instead of exiting."""
    import argparse

    import jax

    from sept_tpu.cli import common

    # resolve_mesh imports jax lazily -> patching the module global works
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # 8 virtual devices, batch 12 -> 8 and 7 don't divide, 6 does
    mesh = common.resolve_mesh(
        argparse.Namespace(n_devices=0, batch_size=12)
    )
    assert mesh is not None and mesh.devices.size == 6
    # prime batch 13 -> no count in 2..8 divides -> single-device (None)
    assert common.resolve_mesh(
        argparse.Namespace(n_devices=0, batch_size=13)
    ) is None


def test_shard_map_dp_matches_single_device():
    """Explicit psum/pmean formulation == single-device step (dropout off)."""
    from sept_tpu.parallel.shard_map_dp import make_shard_map_dp_step

    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-3, hidden_size=16,
                           weight_decay=0.0)
    model = Conv2dBiRNN(hidden_size=16, pred="emotion", dropout_rate=0.0)
    # sync-BN variant for the sharded run: batch stats all-reduced over the
    # mesh axis so train-mode BN sees the GLOBAL batch, like single-device
    model_sync = Conv2dBiRNN(hidden_size=16, pred="emotion", dropout_rate=0.0,
                             bn_axis_name="data")
    tx = make_optimizer(cfg, steps_per_epoch=10)
    b = batch(16)
    b["weight"][13:] = 0.0  # exercise the weighted-denominator psum
    state = init_state(model, tx, KEY, {k: jnp.asarray(v) for k, v in b.items()})
    step = make_baseline_step(model, tx)
    s_ref, m_ref = step(state, {k: jnp.asarray(v) for k, v in b.items()})

    mesh = make_mesh()
    dp_step = make_shard_map_dp_step(model_sync, tx, mesh)
    s_dp, m_dp = dp_step(replicate_state(state, mesh), shard_batch(b, mesh))

    assert float(m_dp["loss"]) == pytest.approx(float(m_ref["loss"]), rel=1e-5)
    assert float(m_dp["count"]) == 13.0
    for a, c in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-6)


def test_dp_evaluation_sweep_matches_single_device():
    """evaluate_cloaked_test under the 8-device mesh must produce the same
    metrics as single-device: the vote is a pure map, so batch sharding +
    replicated closure weights is numerically invisible."""
    from sept_tpu.data.pipeline import SplitArrays
    from sept_tpu.eval.sweep import evaluate_cloaked_test
    from sept_tpu.models import CloakNoise
    from sept_tpu.train import make_eval_logits_fn

    win, maxt, n = 20, 60, 12
    model = Conv2dBiRNN(hidden_size=8, pred="emotion")
    adv = Conv2dBiRNN(hidden_size=8, pred="gender")
    x0 = jnp.zeros((1, win, D, 1))
    vm = jax.jit(model.init)({"params": KEY}, x0)
    va = jax.jit(adv.init)({"params": jax.random.PRNGKey(1)}, x0)
    emo_fn = make_eval_logits_fn(model, pooling="mean")
    adv_fn = make_eval_logits_fn(adv, pooling="mean")

    noise = CloakNoise(win_len=win, n_feats=D, max_scale=5.0)
    nparams = {"params": {
        "locs": jnp.zeros((win, D)),
        "rhos": jnp.linspace(-2, 2, win * D).reshape(win, D),
    }}

    def joint(fn_params, wins, g, m, rng):
        nvars, mv, av = fn_params
        noised = noise.apply(nvars, wins[..., 0], m,
                             rngs={"noise": rng})[..., None]
        return jnp.concatenate([
            emo_fn(mv["params"], mv["batch_stats"], noised, g),
            adv_fn(av["params"], av["batch_stats"], noised, g),
        ], axis=-1)

    rng = np.random.default_rng(0)
    test = SplitArrays(
        windows=rng.standard_normal((n, maxt, D)).astype(np.float32),
        labels_emo=(np.arange(n) % 4).astype(np.int32),
        labels_gen=(np.arange(n) % 2).astype(np.int32),
        lengths=np.linspace(win, maxt, n).astype(np.int32),
        global_data=np.zeros((n, 88), np.float32),
        speaker_ids=np.asarray([f"s{i}" for i in range(n)], object),
        datasets=np.asarray(["synthetic"] * n, object),
        utt_ids=np.asarray([f"u{i}" for i in range(n)], object),
    )
    mask = jnp.asarray((np.arange(win * D).reshape(win, D) % 3 == 0)
                       .astype(np.float32))

    def run(mesh, batch_size=8):
        return evaluate_cloaked_test(
            joint, (nparams, vm, va),
            test, mask, win_len=win, shift_len=5, batch_size=batch_size,
            mesh=mesh,
        )
    b1, a1 = run(None)
    b8, a8 = run(make_mesh(8))
    assert b1["acc"] == b8["acc"] and b1["rec"] == b8["rec"]
    assert a1["acc"] == a8["acc"] and a1["rec"] == a8["rec"]
    np.testing.assert_array_equal(b1["conf"], b8["conf"])

    # mesh size NOT dividing batch_size: batch boundaries stay at
    # batch_size and only zero pad rows are appended, so every real row
    # sees the same program as single-device
    b1, a1 = run(None, batch_size=5)
    b8, a8 = run(make_mesh(8), batch_size=5)
    assert b1["acc"] == b8["acc"] and b1["rec"] == b8["rec"]
    assert a1["acc"] == a8["acc"] and a1["rec"] == a8["rec"]


def test_mesh_and_global_misuse_raise():
    """Misconfiguration fails loudly: an over-sized explicit mesh request
    (slicing would silently run at the wrong scale) and a use_global cloak
    runner invoked without globals_ (the (1,1) dummy would gather-clip to
    all-zero global features and train silently wrong)."""
    import jax
    import jax.numpy as jnp

    from sept_tpu.models import CloakedModelGRL, Conv2dBiRNN
    from sept_tpu.parallel import make_cloak_epoch_runner_dp, make_mesh
    from sept_tpu.train import ExperimentConfig, make_optimizer

    with pytest.raises(ValueError, match="device"):
        make_mesh(n_devices=len(jax.devices()) + 1)

    mesh = make_mesh(2)
    bb = Conv2dBiRNN(hidden_size=8, pred="emotion")
    gb = Conv2dBiRNN(hidden_size=8, pred="gender", bn_axis_name="data")
    model = CloakedModelGRL(emotion_backbone=bb, gender_backbone=gb,
                            win_len=20, n_feats=8)
    tx = make_optimizer(ExperimentConfig(optimizer="adam"), 1)
    run = make_cloak_epoch_runner_dp(model, tx, mesh, use_global=True)
    with pytest.raises(ValueError, match="globals_"):
        run(None, jnp.zeros((4, 20, 8, 1)), jnp.zeros(4, jnp.int32),
            jnp.zeros(4, jnp.int32), jnp.ones(4), jnp.arange(4),
            None, n_batches=2, batch_size=2)

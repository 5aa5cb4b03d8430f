"""Oracle parity: imported reference checkpoints vs the reference's own forward.

These tests import the ACTUAL reference modules (/root/reference/model) as
the numerical oracle: build a reference model, snapshot its state_dict, map
it through sept_tpu.compat.torch_import, and require the Flax forward to
reproduce the torch forward on the same input (eval mode, f32).  This is
the end-to-end proof that a migrating user's trained ``model.pt`` behaves
identically here — covering the conv/BN mapping, the torch-GRU/LSTM ->
Flax-cell gate surgery, channel-major flattening, attention pooling, the
global-feature concat, and the cloak noise parameters.

Skipped wholesale when the reference checkout or torch is unavailable
(the repo stands alone; the oracle is an optional dev-time asset).
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
REF = "/root/reference/model"
if not os.path.isdir(REF):
    pytest.skip("reference checkout unavailable", allow_module_level=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sept_tpu.compat import (  # noqa: E402
    import_backbone,
    import_cloak_noise,
    split_reference_state_dict,
)


@pytest.fixture(scope="module")
def refmod():
    sys.path.insert(0, REF)
    import baseline_models
    import cloak_models

    return baseline_models, cloak_models


def numpy_sd(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def warm_bn(model, x):
    """Run train-mode forwards so BN running stats move off init (the
    import must carry real statistics, not zeros/ones)."""
    model.train()
    with torch.no_grad():
        for _ in range(3):
            model(*x)
    model.eval()


def jax_vars(imported):
    return {
        "params": jax.tree.map(jnp.asarray, imported["params"]),
        "batch_stats": jax.tree.map(jnp.asarray, imported["batch_stats"]),
    }


def test_workhorse_forward_parity(refmod):
    """two_d_cnn_lstm (GRU, mean-pool, emotion) == imported Conv2dBiRNN."""
    baseline_models, _ = refmod
    from sept_tpu.models import Conv2dBiRNN

    torch.manual_seed(0)
    ref = baseline_models.two_d_cnn_lstm(
        input_channel=1, input_spec_size=32, cnn_filter_size=64,
        lstm_hidden_size=8, pred="emotion", global_feature=0, att=None)
    x_t = torch.randn(2, 1, 48, 32)
    warm_bn(ref, (x_t,))
    with torch.no_grad():
        want = ref(x_t).numpy()

    ours = Conv2dBiRNN(hidden_size=8, pred="emotion")
    v = jax_vars(import_backbone(numpy_sd(ref), pred="emotion"))
    got = np.asarray(ours.apply(
        v, jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 1)))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_multitask_attention_global_parity(refmod):
    """self_att pooling + 88-dim global concat + both heads."""
    baseline_models, _ = refmod
    from sept_tpu.models import Conv2dBiRNN

    torch.manual_seed(1)
    ref = baseline_models.two_d_cnn_lstm(
        input_channel=1, input_spec_size=32, cnn_filter_size=64,
        lstm_hidden_size=8, pred="multitask", global_feature=1,
        att="self_att", attention_size=16)
    x_t = torch.randn(2, 1, 48, 32)
    g_t = torch.randn(2, 88)
    warm_bn(ref, (x_t, g_t))
    with torch.no_grad():
        want_emo, want_gen = (t.numpy() for t in ref(x_t, g_t))

    ours = Conv2dBiRNN(hidden_size=8, pred="multitask", att="self_att",
                       attention_size=16)
    v = jax_vars(import_backbone(numpy_sd(ref), pred="multitask",
                                 att="self_att"))
    got_emo, got_gen = ours.apply(
        v, jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 1))),
        global_feature=jnp.asarray(g_t.numpy()))
    np.testing.assert_allclose(np.asarray(got_emo), want_emo,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gen), want_gen,
                               rtol=1e-4, atol=1e-5)


def test_deep_lstm_flatten_parity(refmod):
    """deep_two_d_cnn_lstm_tmp (4 conv blocks, LSTM, flatten pooling).

    The reference hardcodes dense1's input to 2H*25 (baseline_models.py),
    so T must be 200 (-> T/8 = 25)."""
    baseline_models, _ = refmod
    from sept_tpu.models import DeepConv2dBiRNN

    torch.manual_seed(2)
    ref = baseline_models.deep_two_d_cnn_lstm_tmp(
        input_channel=1, input_spec_size=32, cnn_filter_size=64,
        lstm_hidden_size=8, pred="emotion", global_feature=0, att=None)
    x_t = torch.randn(2, 1, 200, 32)
    warm_bn(ref, (x_t,))
    with torch.no_grad():
        want = ref(x_t).numpy()

    ours = DeepConv2dBiRNN(hidden_size=8, pred="emotion", rnn_cell="lstm")
    v = jax_vars(import_backbone(numpy_sd(ref), pred="emotion",
                                 rnn_cell="lstm"))
    got = np.asarray(ours.apply(
        v, jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 1))),
        pooling=None))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cloak_noise_scales_parity(refmod):
    """cloak_noise scales() == imported CloakNoise scales()."""
    _, cloak_models = refmod
    from sept_tpu.models import CloakNoise

    torch.manual_seed(3)
    ref = cloak_models.cloak_noise(
        torch.zeros(1, 50, 32), torch.ones(1, 50, 32), 0.01, 10, "cpu")
    with torch.no_grad():
        ref.rhos.data = torch.randn(1, 50, 32)
        ref.locs.data = torch.randn(1, 50, 32)
        want = ref.scales().numpy()[0]

    noise = CloakNoise(win_len=50, n_feats=32)
    params = import_cloak_noise(numpy_sd(ref))
    got = np.asarray(noise.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        method=CloakNoise.scales))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(params["locs"], ref.locs.detach().numpy()[0])


def test_grl_wrapper_split_and_gender_branch_parity(refmod):
    """A full two_d_cnn_lstm_syn_with_grl state_dict splits into
    noise/backbone/gender parts; the imported gender branch reproduces the
    reference gender model's forward (GRL is identity in forward)."""
    baseline_models, cloak_models = refmod
    from sept_tpu.models import CloakedModelGRL, Conv2dBiRNN

    torch.manual_seed(4)
    emo = baseline_models.two_d_cnn_lstm(
        input_channel=1, input_spec_size=32, cnn_filter_size=64,
        lstm_hidden_size=8, pred="emotion", global_feature=0, att=None)
    gen = baseline_models.two_d_cnn_lstm(
        input_channel=1, input_spec_size=32, cnn_filter_size=64,
        lstm_hidden_size=8, pred="gender", global_feature=0, att=None)
    x_t = torch.randn(2, 1, 48, 32)
    warm_bn(emo, (x_t,))
    warm_bn(gen, (x_t,))
    noise = cloak_models.cloak_noise(
        torch.zeros(1, 48, 32), torch.ones(1, 48, 32), 0.01, 10, "cpu")
    wrapper = cloak_models.two_d_cnn_lstm_syn_with_grl(emo, gen, noise, 0.1)
    with torch.no_grad():
        want_gen = gen(x_t).numpy()

    backbone_sd, cloak_sd, gender_sd = split_reference_state_dict(
        numpy_sd(wrapper))
    assert cloak_sd is not None and gender_sd is not None

    ours_gen = Conv2dBiRNN(hidden_size=8, pred="gender")
    vg = jax_vars(import_backbone(gender_sd, pred="gender"))
    got_gen = np.asarray(ours_gen.apply(
        vg, jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 1)))))
    np.testing.assert_allclose(got_gen, want_gen, rtol=1e-4, atol=1e-5)

    # the assembled GRL cloak applies cleanly in our composite module
    vb = jax_vars(import_backbone(backbone_sd, pred="emotion"))
    model = CloakedModelGRL(
        emotion_backbone=Conv2dBiRNN(hidden_size=8, pred="emotion"),
        gender_backbone=Conv2dBiRNN(hidden_size=8, pred="gender"),
        win_len=48, n_feats=32)
    variables = {
        "params": {
            "noise": jax.tree.map(jnp.asarray, import_cloak_noise(cloak_sd)),
            "emotion_backbone": vb["params"],
            "gender_backbone": vg["params"],
        },
        "batch_stats": {
            "emotion_backbone": vb["batch_stats"],
            "gender_backbone": vg["batch_stats"],
        },
    }
    e_log, g_log, noisy = model.apply(
        variables, jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 1))),
        rngs={"noise": jax.random.PRNGKey(0)})
    assert e_log.shape == (2, 4) and g_log.shape == (2, 2)
    assert noisy.shape == (2, 48, 32, 1)


def test_export_cli_wrapper_artifacts_strict_load(refmod, tmp_path):
    """The export CLI's cloak and cloak+GRL branches (intermed./
    original_model./gender_model.conv.1. assembly) strict-load into the
    reference wrapper constructors and preserve the frozen emotion branch.

    Route: reference wrapper -> model.pt -> cli.import_torch ->
    cli.export_torch -> load_state_dict(strict) into a FRESH wrapper ->
    forward parity of its original_model against the source model."""
    baseline_models, cloak_models = refmod
    from sept_tpu.cli import export_torch, import_torch

    def make(pred, seed):
        torch.manual_seed(seed)
        m = baseline_models.two_d_cnn_lstm(
            input_channel=1, input_spec_size=32, cnn_filter_size=64,
            lstm_hidden_size=8, pred=pred, global_feature=0, att=None)
        warm_bn(m, (torch.randn(2, 1, 48, 32),))
        return m

    x_t = torch.randn(2, 1, 48, 32)
    out = str(tmp_path / "out")

    # --- non-GRL syn wrapper ---
    emo = make("emotion", 10)
    noise = cloak_models.cloak_noise(
        torch.zeros(1, 48, 32), torch.ones(1, 48, 32), 0.01, 10, "cpu")
    wrapper = cloak_models.two_d_cnn_lstm_syn(emo, noise)
    pt = str(tmp_path / "syn.pt")
    torch.save(wrapper.state_dict(), pt)
    assert import_torch.main([
        "--checkpoint", pt, "--output_dir", out,
        "--artifact", "cloak_syn", "--fold", "1"]) == 0
    back = str(tmp_path / "syn_back.pt")
    assert export_torch.main([
        "--output_dir", out, "--artifact", "cloak_syn", "--fold", "1",
        "--out", back]) == 0
    emo2 = make("emotion", 11)
    fresh = cloak_models.two_d_cnn_lstm_syn(
        emo2, cloak_models.cloak_noise(
            torch.zeros(1, 48, 32), torch.ones(1, 48, 32), 0.01, 10, "cpu"))
    fresh.load_state_dict(torch.load(back, weights_only=True))  # strict
    fresh.eval()
    with torch.no_grad():
        np.testing.assert_allclose(
            fresh.original_model(x_t).numpy(), emo(x_t).numpy(),
            rtol=1e-5, atol=1e-6)

    # --- GRL wrapper (gender conv nested under Sequential(GRL, conv)) ---
    emo_g, gen_g = make("emotion", 12), make("gender", 13)
    wrapper_g = cloak_models.two_d_cnn_lstm_syn_with_grl(
        emo_g, gen_g,
        cloak_models.cloak_noise(
            torch.zeros(1, 48, 32), torch.ones(1, 48, 32), 0.01, 10, "cpu"),
        0.1)
    pt_g = str(tmp_path / "grl.pt")
    torch.save(wrapper_g.state_dict(), pt_g)
    assert import_torch.main([
        "--checkpoint", pt_g, "--output_dir", out,
        "--artifact", "cloak_grl_test", "--fold", "1"]) == 0
    back_g = str(tmp_path / "grl_back.pt")
    assert export_torch.main([
        "--output_dir", out, "--artifact", "cloak_grl_test", "--fold", "1",
        "--out", back_g]) == 0
    fresh_g = cloak_models.two_d_cnn_lstm_syn_with_grl(
        make("emotion", 14), make("gender", 15),
        cloak_models.cloak_noise(
            torch.zeros(1, 48, 32), torch.ones(1, 48, 32), 0.01, 10, "cpu"),
        0.1)
    fresh_g.load_state_dict(torch.load(back_g, weights_only=True))  # strict
    fresh_g.eval()
    with torch.no_grad():
        np.testing.assert_allclose(
            fresh_g.original_model(x_t).numpy(), emo_g(x_t).numpy(),
            rtol=1e-5, atol=1e-6)
        # the GRL-nested gender branch round-tripped too
        np.testing.assert_allclose(
            fresh_g.gender_model(x_t).numpy(), gen_g(x_t).numpy(),
            rtol=1e-5, atol=1e-6)


def test_imported_artifacts_drive_evaluation_sweep(refmod, tmp_path):
    """The full migration promise: reference-trained checkpoints (baseline,
    adversary, cloak+GRL wrapper) imported via cli.import_torch drive our
    cli.evaluate utility/privacy sweep end to end and produce the reference
    CSV schema with finite numbers."""
    baseline_models, cloak_models = refmod
    from sept_tpu.cli import evaluate, featurize, import_torch, preprocess

    WINL, DD, HH = 48, 32, 8
    work, out = str(tmp_path / "work"), str(tmp_path / "out")
    base = ["--dataset", "synthetic", "--work_dir", work,
            "--output_dir", out, "--win_len", str(WINL),
            "--input_spec_size", str(DD), "--hidden_size", str(HH),
            "--seed", "8"]
    featurize.main(base + ["--n_speakers", "6", "--utts_per_speaker", "2",
                           "--functionals", "0"])
    preprocess.main(base + ["--folds", "1"])

    def make(pred, seed):
        torch.manual_seed(seed)
        m = baseline_models.two_d_cnn_lstm(
            input_channel=1, input_spec_size=DD, cnn_filter_size=64,
            lstm_hidden_size=HH, pred=pred, global_feature=0, att=None)
        warm_bn(m, (torch.randn(2, 1, WINL, DD),))
        return m

    emo, gen = make("emotion", 20), make("gender", 21)
    torch.save(emo.state_dict(), str(tmp_path / "emo.pt"))
    torch.save(gen.state_dict(), str(tmp_path / "gen.pt"))
    wrapper = cloak_models.two_d_cnn_lstm_syn_with_grl(
        emo, gen, cloak_models.cloak_noise(
            torch.zeros(1, WINL, DD), torch.ones(1, WINL, DD),
            0.01, 10, "cpu"), 0.1)
    torch.save(wrapper.state_dict(), str(tmp_path / "cloak.pt"))

    for ckpt_file, artifact, pred in (
        ("emo.pt", "baseline_emotion", "emotion"),
        ("gen.pt", "adv_baseline_gender", "gender"),
        # the sweep loads a ratio-MATCHED cloak per ratio (cli/evaluate.py)
        ("cloak.pt", "cloak_grl_lamda1.0_supp0", "emotion"),
        ("cloak.pt", "cloak_grl_lamda1.0_supp40", "emotion"),
    ):
        assert import_torch.main([
            "--checkpoint", str(tmp_path / ckpt_file), "--output_dir", out,
            "--artifact", artifact, "--fold", "1", "--pred", pred]) == 0

    evaluate.main(base + ["--grl", "1", "--scale_lamda", "1.0",
                          "--ratios", "0", "40", "--folds", "1"])

    import csv

    with open(os.path.join(out, "grl-1.0.csv")) as f:
        rows = {r[""]: r for r in csv.DictReader(f)}
    assert set(rows) == {"suppression_ratio_0_synthetic",
                         "suppression_ratio_40_synthetic"}
    for r in rows.values():
        for col in ("baseline_acc", "baseline_rec", "adv_acc", "adv_rec"):
            v = float(r[col])
            assert np.isfinite(v) and 0.0 <= v <= 1.0, (col, v)


def test_export_roundtrip_parity(refmod):
    """Our model -> export_backbone -> strict-load into the reference
    constructor -> identical forward (the reverse migration direction)."""
    baseline_models, _ = refmod
    from sept_tpu.compat import export_backbone
    from sept_tpu.models import Conv2dBiRNN

    m = Conv2dBiRNN(hidden_size=8, pred="multitask")
    x_np = np.random.default_rng(5).standard_normal(
        (2, 48, 32, 1)).astype(np.float32)
    x_j = jnp.asarray(x_np)
    v = m.init({"params": jax.random.PRNGKey(7)}, x_j)
    # move BN running stats off init so the export carries real statistics
    _, upd = m.apply(v, x_j, train=True, mutable=["batch_stats"],
                     rngs={"dropout": jax.random.PRNGKey(8)})
    v = {"params": v["params"], "batch_stats": upd["batch_stats"]}
    want_emo, want_gen = (np.asarray(t) for t in m.apply(v, x_j))

    sd = export_backbone({
        "params": jax.tree.map(np.asarray, v["params"]),
        "batch_stats": jax.tree.map(np.asarray, v["batch_stats"]),
    })
    ref = baseline_models.two_d_cnn_lstm(
        input_channel=1, input_spec_size=32, cnn_filter_size=64,
        lstm_hidden_size=8, pred="multitask", global_feature=0, att=None)
    ref.load_state_dict(  # strict: every reference tensor must be present
        {k: torch.from_numpy(np.asarray(t)) for k, t in sd.items()})
    ref.eval()
    with torch.no_grad():
        got_emo, got_gen = (
            t.numpy()
            for t in ref(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2)))))
    np.testing.assert_allclose(got_emo, want_emo, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_gen, want_gen, rtol=1e-4, atol=1e-5)

"""CLI roundtrip for the torch-checkpoint importer (reference-independent).

Synthesizes a ``model.pt`` with the reference's exact state_dict key layout
(shapes for hidden=4, input_spec_size=16), runs ``cli.import_torch``, and
restores the written Orbax artifact.  Numerical parity against the real
reference forward is covered separately by tests/test_torch_oracle.py
(slow, needs the reference checkout); this lane proves the tooling.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

H, D = 4, 16
RNN_IN = 128 * D // 8


def _bare_backbone_sd():
    """Reference two_d_cnn_lstm state_dict skeleton (random values)."""
    g = torch.Generator().manual_seed(0)
    t = lambda *s: torch.randn(*s, generator=g)  # noqa: E731
    sd = {}
    for b, (ci, co) in enumerate(((1, 32), (32, 64), (64, 128))):
        conv, bn = {0: (0, 1), 1: (5, 6), 2: (10, 11)}[b]
        sd[f"conv.{conv}.weight"] = t(co, ci, 5, 5)
        sd[f"conv.{conv}.bias"] = t(co)
        sd[f"conv.{bn}.weight"] = t(co)
        sd[f"conv.{bn}.bias"] = t(co)
        sd[f"conv.{bn}.running_mean"] = t(co)
        sd[f"conv.{bn}.running_var"] = t(co).abs() + 0.5
        sd[f"conv.{bn}.num_batches_tracked"] = torch.tensor(7)
    for layer, nin in ((0, RNN_IN), (1, 2 * H)):
        for suf in ("", "_reverse"):
            sd[f"rnn.weight_ih_l{layer}{suf}"] = t(3 * H, nin)
            sd[f"rnn.weight_hh_l{layer}{suf}"] = t(3 * H, H)
            sd[f"rnn.bias_ih_l{layer}{suf}"] = t(3 * H)
            sd[f"rnn.bias_hh_l{layer}{suf}"] = t(3 * H)
    sd["dense1.weight"] = t(128, 2 * H)
    sd["dense1.bias"] = t(128)
    sd["dense2.weight"] = t(64, 128)  # dead layer, must be ignored
    sd["dense2.bias"] = t(64)
    sd["att_linear1.weight"] = t(16, 2 * H)
    sd["att_linear2.weight"] = t(16, 16)
    sd["att_mat1"] = t(16, 2 * H)
    sd["att_mat2"] = t(16, 16)
    sd["pred_emotion_layer.weight"] = t(4, 128)
    sd["pred_emotion_layer.bias"] = t(4)
    sd["pred_gender_layer.weight"] = t(2, 128)
    sd["pred_gender_layer.bias"] = t(2)
    return sd


def test_import_backbone_cli_roundtrip(tmp_path):
    from sept_tpu.cli import import_torch
    from sept_tpu.train.checkpoint import CheckpointManager

    pt = tmp_path / "model.pt"
    torch.save(_bare_backbone_sd(), str(pt))
    rc = import_torch.main([
        "--checkpoint", str(pt), "--output_dir", str(tmp_path / "out"),
        "--artifact", "baseline_emotion", "--fold", "2", "--pred", "emotion",
    ])
    assert rc == 0

    ckpt = CheckpointManager(str(tmp_path / "out"))
    assert ckpt.exists("baseline_emotion", 2)
    got = ckpt.restore("baseline_emotion", 2)
    p, s = got["params"], got["batch_stats"]
    assert p["conv0"]["kernel"].shape == (5, 5, 1, 32)
    assert p["rnn"]["GRUCell_0"]["ir"]["kernel"].shape == (RNN_IN, H)
    assert p["rnn"]["GRUCell_3"]["in"]["kernel"].shape == (2 * H, H)
    assert p["heads"]["dense1"]["kernel"].shape == (2 * H, 128)
    assert "pred_gender" not in p["heads"]  # emotion-only head emitted
    assert "dense2" not in p["heads"]
    assert s["bn2"]["var"].shape == (128,)

    # the manifest carries the inferred architecture under "config" — the
    # key predict/serve read (serve.py::load_predictor), so the imported
    # artifact builds the right model without flag re-entry
    import json

    with open(tmp_path / "out" / "baseline_emotion"
              / "manifest_fold2.json") as f:
        cfg = json.load(f)["config"]
    assert cfg["hidden_size"] == H
    assert cfg["feature_len"] == D
    assert cfg["model_type"] == "2d-cnn-lstm"
    assert cfg["pred"] == "emotion" and cfg["global_feature"] is False


def test_import_grl_cloak_cli_roundtrip(tmp_path):
    """Wrapper state_dict (intermed + original_model + GRL-nested gender)."""
    from sept_tpu.cli import import_torch
    from sept_tpu.train.checkpoint import CheckpointManager

    bare = _bare_backbone_sd()
    sd = {}
    sd["intermed.locs"] = torch.zeros(1, 48, D)
    sd["intermed.rhos"] = torch.full((1, 48, D), -2.0)
    for k, v in bare.items():
        sd[f"original_model.{k}"] = v
        # the GRL wrap nests the gender conv one level deeper
        # (Sequential(GradientReversal, conv) -> conv.1.<i>)
        gk = k.replace("conv.", "conv.1.") if k.startswith("conv.") else k
        sd[f"gender_model.{gk}"] = v
    pt = tmp_path / "cloak.pt"
    torch.save(sd, str(pt))
    rc = import_torch.main([
        "--checkpoint", str(pt), "--output_dir", str(tmp_path / "out"),
        "--artifact", "cloak_grl_lamda1.0_supp0", "--fold", "1",
    ])
    assert rc == 0

    ckpt = CheckpointManager(str(tmp_path / "out"))
    got = ckpt.restore("cloak_grl_lamda1.0_supp0", 1)
    p = got["params"]
    # the evaluation sweep reads params/noise/{locs,rhos} (cli/evaluate.py)
    assert p["noise"]["locs"].shape == (48, D)
    assert np.allclose(np.asarray(p["noise"]["rhos"]), -2.0)
    assert p["emotion_backbone"]["conv0"]["kernel"].shape == (5, 5, 1, 32)
    assert p["gender_backbone"]["heads"]["pred_gender"]["kernel"].shape == (128, 2)
    assert got["batch_stats"]["gender_backbone"]["bn0"]["mean"].shape == (32,)


def test_import_export_roundtrip_preserves_live_tensors():
    """export(import(sd)) reproduces every live tensor; the GRU r/z bias
    pair is a gauge (only the sum enters the recurrence) and must be
    sum-preserved."""
    from sept_tpu.compat import export_backbone, import_backbone

    sd = {k: v.numpy() for k, v in _bare_backbone_sd().items()}
    back = export_backbone(import_backbone(sd, pred="multitask"))
    dead = {"dense2.weight", "dense2.bias", "att_linear1.weight",
            "att_linear2.weight", "att_mat1", "att_mat2"}
    for k, v in sd.items():
        if k in dead or k.endswith("num_batches_tracked"):
            continue
        if "bias_ih" in k or "bias_hh" in k:
            continue  # checked as sums below
        np.testing.assert_array_equal(back[k], v, err_msg=k)
    for layer in (0, 1):
        for suf in ("", "_reverse"):
            want = sd[f"rnn.bias_ih_l{layer}{suf}"] + sd[f"rnn.bias_hh_l{layer}{suf}"]
            got = back[f"rnn.bias_ih_l{layer}{suf}"] + back[f"rnn.bias_hh_l{layer}{suf}"]
            np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_import_torch_help_exits_zero(capsys):
    from sept_tpu.cli import import_torch

    with pytest.raises(SystemExit) as e:
        import_torch.main(["--help"])
    assert e.value.code == 0
    assert "--checkpoint" in capsys.readouterr().out


def test_export_torch_help_exits_zero(capsys):
    from sept_tpu.cli import export_torch

    with pytest.raises(SystemExit) as e:
        export_torch.main(["--help"])
    assert e.value.code == 0
    assert "--artifact" in capsys.readouterr().out

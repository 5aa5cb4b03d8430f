"""CLI wiring smoke tests: every entry point parses --help."""

import pytest

from sept_tpu.cli import (
    evaluate,
    featurize,
    preprocess,
    run_all,
    serve,
    train_baseline,
    train_cloak,
)


@pytest.mark.parametrize(
    "mod", [featurize, preprocess, train_baseline, train_cloak, evaluate, run_all]
)
def test_help_exits_zero(mod, capsys):
    with pytest.raises(SystemExit) as e:
        mod.main(["--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "--dataset" in out


def test_serve_help_exits_zero(capsys):
    with pytest.raises(SystemExit) as e:
        serve.main(["--help"])
    assert e.value.code == 0
    assert "--artifact" in capsys.readouterr().out


def test_featurize_functionals_flag(tmp_path):
    """--functionals 0 skips the gemaps/emobase extraction; preprocess still
    assembles folds (global features fall back to zeros,
    data/pipeline.py:142)."""
    import numpy as np

    from sept_tpu.data.store import load_feature_store

    args = ["--dataset", "synthetic", "--work_dir", str(tmp_path),
            "--input_spec_size", "32", "--seed", "8"]
    featurize.main(args + ["--n_speakers", "4", "--utts_per_speaker", "2",
                           "--functionals", "0"])
    store = load_feature_store(
        str(tmp_path / "feature" / "mel_spec" / "synthetic" / "data_32.npz")
    )
    utt = next(iter(store.values()))
    assert "mel1" in utt and "gemaps" not in utt and "emobase" not in utt

    preprocess.main(args + ["--win_len", "50", "--input_spec_size", "32"])
    from sept_tpu.data.store import load_fold

    fold = load_fold(str(tmp_path / "folds" / "synthetic" / "fold1.npz"))
    assert np.all(fold.training.global_data == 0.0)


def test_cloak_artifact_encodes_training_regime():
    """Cloaks trained under different extension regimes must not collide on
    one checkpoint name (silent --resume / evaluate mixups)."""
    from sept_tpu.cli.train_cloak import cloak_artifact
    from sept_tpu.train.config import ExperimentConfig

    base = ExperimentConfig(grl=True, scale_lambda=1.0, suppression_ratio=40)
    assert cloak_artifact(base) == "cloak_grl_lamda1.0_supp40"
    ext = ExperimentConfig(grl=True, scale_lambda=1.0, suppression_ratio=40,
                           antithetic_noise=True, saliency_align=5.0,
                           mask_direction="eval")
    assert cloak_artifact(ext) == "cloak_grl_lamda1.0_supp40_anti_sal5_mdeval"
    assert cloak_artifact(base) != cloak_artifact(ext)
    # suppression-0 cloaks are direction-agnostic and shared
    s0 = ExperimentConfig(grl=True, scale_lambda=1.0, suppression_ratio=0,
                          mask_direction="eval")
    assert cloak_artifact(s0) == "cloak_grl_lamda1.0_supp0"
    # non-default training numerics are identity too (bf16-trained cloaks
    # and baselines never collide with f32 ones)
    from sept_tpu.cli.train_baseline import artifact_name

    bf = ExperimentConfig(grl=True, scale_lambda=1.0, suppression_ratio=0,
                          compute_dtype="bfloat16")
    assert cloak_artifact(bf) == "cloak_grl_lamda1.0_supp0_bf16"
    assert artifact_name(ExperimentConfig(compute_dtype="bfloat16")) == \
        "baseline_emotion_bf16"
    assert artifact_name(ExperimentConfig()) == "baseline_emotion"


def test_compute_dtype_flag_plumbs():
    """--compute_dtype reaches the model build (bf16 conv/RNN compute with
    f32 params — the TPU mixed-precision analog)."""
    import jax.numpy as jnp

    from sept_tpu.models import build_backbone, compute_dtype
    from sept_tpu.train.config import ExperimentConfig

    assert compute_dtype("float32") is None
    assert compute_dtype("bfloat16") == jnp.bfloat16
    cfg = ExperimentConfig(compute_dtype="bfloat16")
    m = build_backbone(cfg.model_type, dtype=compute_dtype(cfg.compute_dtype))
    assert m.dtype == jnp.bfloat16
    # f32-only variants silently drop the knob instead of crashing
    m1d = build_backbone("1d-cnn-lstm-att", dtype=jnp.bfloat16)
    assert not hasattr(m1d, "dtype") or m1d.dtype in (None, jnp.float32)

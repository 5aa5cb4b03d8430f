"""Offline batch inference CLI: WAV directory in, prediction CSV out."""

import csv
import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

from sept_tpu.models import Conv2dBiRNN
from sept_tpu.runtime import write_wav
from sept_tpu.train.checkpoint import CheckpointManager

# multi-minute on one core: excluded from the default fast lane (pyproject addopts)
pytestmark = pytest.mark.slow

D, WIN = 32, 60


def _save_artifact(out_dir):
    import json

    model = Conv2dBiRNN(hidden_size=8, pred="emotion")
    v = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                            jnp.zeros((1, WIN, D, 1)))
    ckpt = CheckpointManager(str(out_dir))
    ckpt.save("baseline_emotion", 1, v["params"], v["batch_stats"])
    os.makedirs(out_dir / "baseline_emotion", exist_ok=True)
    with open(out_dir / "baseline_emotion" / "manifest_fold1.json", "w") as f:
        json.dump({"config": {"model_type": "2d-cnn-lstm", "pred": "emotion",
                              "hidden_size": 8, "feature_len": D,
                              "win_len": WIN, "att": None,
                              "global_feature": False}}, f)
    return v


def test_predict_cli_wav_dir(rng, tmp_path):
    from sept_tpu.cli import predict
    from sept_tpu.serve import Predictor

    v = _save_artifact(tmp_path)
    wav_dir = tmp_path / "clips"
    (wav_dir / "sub").mkdir(parents=True)
    waves = {}
    for name in ("a", "sub/b", "c"):
        w = (0.3 * rng.standard_normal(12000)).astype(np.float32)
        waves[name] = w
        write_wav(str(wav_dir / f"{name}.wav"), w, 16000)

    out_csv = tmp_path / "preds.csv"
    predict.main(["--output_dir", str(tmp_path), "--wav_dir", str(wav_dir),
                  "--out", str(out_csv), "--batch_size", "2"])

    with open(out_csv) as f:
        rows = {r["utt_id"]: r for r in csv.DictReader(f)}
    assert set(rows) == {"a", os.path.join("sub", "b"), "c"}

    # probabilities match the in-process predictor over the decoded audio
    p = Predictor(v["params"], v["batch_stats"], hidden_size=8,
                  feature_len=D, win_len=WIN, shift_len=WIN // 4)
    from sept_tpu.runtime import decode_wav

    for name in ("a", "c"):
        dec, _ = decode_wav(str(wav_dir / f"{name}.wav"), target_sr=16000)
        want = p.predict([dec])[0]
        got = np.asarray([float(rows[name][f"p_{c}"])
                          for c in ("neu", "hap", "sad", "ang")])
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert rows[name]["label"] == ("neu", "hap", "sad", "ang")[want.argmax()]


def test_predict_cli_requires_a_source(tmp_path):
    import pytest

    from sept_tpu.cli import predict

    with pytest.raises(SystemExit):
        predict.main(["--output_dir", str(tmp_path)])

"""Utils tests: PRNG discipline, step timer, run manifest, checkpoints."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from sept_tpu.train.checkpoint import CheckpointManager
from sept_tpu.utils import KeySeq, MetricsLogger, RunManifest, StepTimer, fold_in_name


def test_keyseq_deterministic_and_distinct():
    a = KeySeq(8)
    b = KeySeq(8)
    k1, k2 = a(), a()
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(b()))
    assert not np.array_equal(np.asarray(k1), np.asarray(k2))
    # named derivation is stable and name-dependent
    base = jax.random.PRNGKey(0)
    assert np.array_equal(
        np.asarray(fold_in_name(base, "noise")), np.asarray(fold_in_name(base, "noise"))
    )
    assert not np.array_equal(
        np.asarray(fold_in_name(base, "noise")),
        np.asarray(fold_in_name(base, "dropout")),
    )


def test_step_timer_summary():
    t = StepTimer()
    for _ in range(5):
        with t:
            pass
    s = t.summary()
    assert s["n"] == 4 and s["mean_s"] >= 0


def test_run_manifest_and_metrics(tmp_path):
    m = RunManifest(str(tmp_path / "run.json"), config={"lr": 1e-3})
    m.record(acc=np.float32(0.5), conf=np.eye(2))
    path = m.write()
    data = json.load(open(path))
    assert data["config"]["lr"] == 1e-3
    assert data["results"]["acc"] == 0.5

    log = MetricsLogger(str(tmp_path / "metrics.jsonl"))
    log.log(epoch=0, loss=1.5)
    log.log(epoch=1, loss=jnp.asarray(1.2))
    log.close()
    lines = open(tmp_path / "metrics.jsonl").read().strip().split("\n")
    assert len(lines) == 2
    assert abs(json.loads(lines[1])["loss"] - 1.2) < 1e-6


def test_checkpoint_roundtrip(tmp_path):
    ckpt = CheckpointManager(str(tmp_path))
    params = {"dense": {"kernel": jnp.ones((3, 2)), "bias": jnp.zeros(2)}}
    stats = {"bn": {"mean": jnp.full((2,), 0.5)}}
    ckpt.save("baseline_emotion", 1, params, stats, manifest={"acc": 0.9})
    assert ckpt.exists("baseline_emotion", 1)
    assert not ckpt.exists("baseline_emotion", 2)
    restored = ckpt.restore("baseline_emotion", 1)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["dense"]["kernel"]), np.ones((3, 2))
    )
    np.testing.assert_array_equal(
        np.asarray(restored["batch_stats"]["bn"]["mean"]), np.full(2, 0.5)
    )
    manifest = json.load(
        open(os.path.join(str(tmp_path), "baseline_emotion", "manifest_fold1.json"))
    )
    assert manifest["acc"] == 0.9

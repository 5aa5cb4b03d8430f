"""Utility-privacy validation on the synthetic corpus.

Runs the complete paper protocol end-to-end (featurize -> folds -> baseline
SER -> gender adversary -> cloak+GRL -> evaluation sweep) on the synthetic
labeled corpus and reports the tradeoff the cloak is supposed to produce:

- CLEAN:   emotion UAR and adversary (gender) UAR on un-noised test features
- CLOAKED: the same two metrics on the noised features

Success direction: adversary UAR drops toward chance (0.5) while emotion UAR
retains most of its clean value (the ICASSP 2022 result, SURVEY.md intro).

Writes benchmarks/privacy_demo.json.  Run time: ~15-30 min on one chip.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from sept_tpu.cli import featurize, preprocess, train_baseline, train_cloak
    from sept_tpu.cli.train_cloak import cloak_artifact
    from sept_tpu.cli.common import config_from_args
    from sept_tpu.data.store import load_fold
    from sept_tpu.eval.sweep import evaluate_cloaked_test
    from sept_tpu.models import CloakNoise, build_backbone
    from sept_tpu.train import make_eval_logits_fn
    from sept_tpu.train.checkpoint import CheckpointManager
    from sept_tpu.train.loop import run_test

    work, out = "/tmp/privacy_demo/work", "/tmp/privacy_demo/results"
    os.makedirs(work, exist_ok=True)

    base = [
        "--dataset", "synthetic", "--work_dir", work, "--output_dir", out,
        "--folds", "1", "--win_len", "150", "--input_spec_size", "96",
        "--hidden_size", "32", "--batch_size", "32", "--seed", "8",
    ]
    print("== featurize ==", flush=True)
    featurize.main(base + ["--n_speakers", "14", "--utts_per_speaker", "14"])
    print("== preprocess ==", flush=True)
    preprocess.main(base)
    print("== baseline ==", flush=True)
    train_baseline.main(base + ["--pred", "emotion", "--num_epochs", "25",
                                "--learning_rate", "2e-3"])
    print("== adversary ==", flush=True)
    train_baseline.main(base + ["--pred", "gender", "--adv", "1",
                                "--num_epochs", "25", "--learning_rate", "2e-3"])
    cloak_args = ["--grl", "1", "--scale_lamda", "0.3",
                  "--num_epochs", "30", "--learning_rate", "1e-1",
                  "--grl_lambda", "1.0", "--gender_lambda", "1.0"]
    print("== cloak+GRL ==", flush=True)
    train_cloak.main(base + cloak_args)
    print("== cloak+GRL suppression 60 ==", flush=True)
    train_cloak.main(base + cloak_args + ["--suppression_ratio", "60"])

    # ---- evaluation: clean vs cloaked ----
    import argparse

    p = argparse.ArgumentParser()
    from sept_tpu.cli.common import add_common_args

    add_common_args(p)
    args = p.parse_args(base + ["--grl_lambda", "1.0", "--gender_lambda", "1.0",
                                "--scale_lamda", "0.3"])
    cfg = config_from_args(args, grl=True)
    cfg.noise_max_scale = 5.0

    fold = load_fold(os.path.join(work, "folds", "synthetic", "fold1.npz"))
    ckpt = CheckpointManager(out)
    emo_m = build_backbone("2d-cnn-lstm", hidden_size=32, pred="emotion")
    adv_m = build_backbone("2d-cnn-lstm", hidden_size=32, pred="gender")
    emo_fn = make_eval_logits_fn(emo_m)
    adv_fn = make_eval_logits_fn(adv_m)
    base_ck = ckpt.restore("baseline_emotion", 1)
    adv_ck = ckpt.restore("adv_baseline_gender", 1)
    cloak_ck = ckpt.restore(cloak_artifact(cfg), 1)

    class S:  # tiny state shims for run_test
        def __init__(self, ck):
            self.params = ck["params"]
            self.batch_stats = ck.get("batch_stats", {})

    clean_emo = run_test(emo_fn, S(base_ck), fold.test, cfg, "labels_emo")
    clean_adv = run_test(adv_fn, S(adv_ck), fold.test, cfg, "labels_gen")

    noise = CloakNoise(win_len=cfg.win_len, n_feats=cfg.feature_len, max_scale=5.0)
    noise_params = {"params": cloak_ck["params"]["noise"]}

    def noise_apply(wins, m, rng):
        return noise.apply(noise_params, wins[..., 0], m, rngs={"noise": rng})[..., None]

    def emo_logits(w, g):
        return emo_fn(base_ck["params"], base_ck.get("batch_stats", {}), w, g)

    def adv_logits(w, g):
        return adv_fn(adv_ck["params"], adv_ck.get("batch_stats", {}), w, g)

    from sept_tpu.eval.sweep import eval_mask
    from sept_tpu.train.steps import cloak_scales

    result = {
        "clean": {"emotion_uar": clean_emo["uar"], "adversary_uar": clean_adv["uar"],
                  "emotion_acc": clean_emo["acc"], "adversary_acc": clean_adv["acc"]},
        "sweep": {},
    }
    # suppression sweep: eval ratio r keeps only the bottom-r%-noisy cells
    # (adversary_cloak_evaluation.py:262-267); ratio 0 = no mask
    for ratio, art_ratio in [(0, 0), (80, 60), (40, 60), (20, 60)]:
        art_cfg = type(cfg)(**{**cfg.__dict__, "suppression_ratio": art_ratio})
        ck2 = ckpt.restore(cloak_artifact(art_cfg), 1)
        np_params = {"params": ck2["params"]["noise"]}
        scales = np.asarray(
            noise.apply(np_params, method=type(noise).scales)
        )
        m = eval_mask(scales, ratio)
        m_j = None if m is None else jnp.asarray(m)

        def napply(wins, mm, rng, np_params=np_params):
            return noise.apply(np_params, wins[..., 0], mm,
                               rngs={"noise": rng})[..., None]

        ce, ca = evaluate_cloaked_test(
            napply, emo_logits, adv_logits, fold.test, m_j,
            win_len=cfg.win_len, shift_len=cfg.shift_len,
        )
        result["sweep"][f"ratio_{ratio}"] = {
            "emotion_uar": ce["rec"], "adversary_uar": ca["rec"],
            "emotion_acc": ce["acc"], "adversary_acc": ca["acc"],
            "kept_cells_frac": float(m.mean()) if m is not None else 1.0,
        }
    r0 = result["sweep"]["ratio_0"]
    result["privacy_gain_uar"] = clean_adv["uar"] - min(
        v["adversary_uar"] for v in result["sweep"].values()
    )
    result["utility_cost_uar"] = clean_emo["uar"] - r0["emotion_uar"]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "privacy_demo.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()

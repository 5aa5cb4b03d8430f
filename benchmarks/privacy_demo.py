"""Utility-privacy validation: the paper's headline protocol, end to end.

Runs the COMPLETE reference evaluation protocol
(/root/reference/training/adversary_cloak_evaluation.py:113-299) on the hard
synthetic benchmark corpus (sept_tpu.data.synthetic.make_hard_corpus — gender
and emotion cues share the harmonic band, a gender-free emotion channel lives
in the AM-modulated noise floor):

1. featurize + 5 speaker-disjoint folds;
2. per fold: SER baseline, gender adversary, cloak+GRL at suppression 0,
   then RATIO-MATCHED suppression cloaks {20, 40, 60, 80} (each loads the
   suppression-0 cloak, freezes rhos, retrains locs under the
   training-direction mask — training_cloak.py:364-371);
3. the cli.evaluate sweep: for each ratio x fold, load the cloak TRAINED AT
   THAT RATIO (:243-251), apply the evaluation-direction mask (:262-267),
   feed the noised windows to both frozen models, sliding-vote, aggregate
   fold means into the reference CSV schema.

Cloak training uses the framework's variance-reduction extensions
(--antithetic, --saliency_align; sept_tpu.train.steps) — the reference's
single-draw sigma estimator leaves the scales uniform at this problem size,
so its percentile masks would be random cell deletion — and trains the
ratio-matched cloaks under the evaluation-direction mask
(--mask_direction eval) so the locs are optimized for exactly the cells the
sweep replaces.  The EVALUATION protocol is the reference's, unmodified.

Success direction: adversary (gender) UAR driven to chance (0.5) at some
ratio while emotion UAR retains most of its clean value.

Reading the sweep: the evaluation mask zeroes cells whose trained scale
exceeds percentile(ratio) (adversary_cloak_evaluation.py:262-267), so a
LOWER ratio suppresses MORE cells — ratio 20 replaces ~80% of feature
cells with the learned locs, ratio 80 only ~20%, and ratio 0 applies no
mask at all (full noise, features intact).  Adversary UAR therefore rises
with ratio (fewer cells replaced -> more gender information survives)
while the ratio-matched locs keep emotion UAR near clean everywhere —
suppression, not the Gaussian noise alone, is what destroys the
adversary, which is exactly the paper's mechanism.

Writes benchmarks/privacy_demo.json + benchmarks/privacy_sweep.csv.
Run time: ~45-75 min on one chip (5 folds x 7 trainings + sweep).
"""

import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RATIOS = [0, 20, 40, 60, 80]
HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    from sept_tpu.cli import evaluate, featurize, preprocess, train_baseline, train_cloak

    work, out = "/tmp/privacy_demo/work", "/tmp/privacy_demo/results"
    os.makedirs(work, exist_ok=True)

    base = [
        "--dataset", "synthetic_hard", "--work_dir", work, "--output_dir", out,
        "--win_len", "150", "--input_spec_size", "96",
        "--hidden_size", "32", "--batch_size", "32", "--seed", "8",
    ]
    cloak_args = [
        "--grl", "1", "--scale_lamda", "1.0", "--num_epochs", "60",
        "--optimizer", "adam", "--learning_rate", "1e-2",
        "--grl_lambda", "1.0", "--gender_lambda", "1.0",
        "--antithetic", "1", "--saliency_align", "5.0",
        # train the ratio-matched cloaks under the SAME percentile mask the
        # evaluation sweep applies (the reference trains top-r% but evaluates
        # top-(100-r)%, quirk 8 — its locs are untrained in most of the cells
        # the sweep replaces); evaluation itself stays reference-exact
        "--mask_direction", "eval",
        # the sigma map needs the full epoch budget to differentiate; val-loss
        # early stopping (tuned for classifier training) cuts it short on
        # some folds and collapses the suppression masks toward random
        "--early_stop_patience", "100",
    ]
    # the sweep resolves cloak artifacts by name, which encodes the training
    # extensions (cli.train_cloak.cloak_artifact) — pass the same knobs
    eval_args = ["--grl", "1", "--scale_lamda", "1.0",
                 "--grl_lambda", "1.0", "--gender_lambda", "1.0",
                 "--antithetic", "1", "--saliency_align", "5.0",
                 "--mask_direction", "eval"]

    print("== featurize ==", flush=True)
    # --functionals 0: the demo trains with global_feature=0, so skip the
    # gemaps/emobase extraction (each bucket shape costs a minutes-long
    # compile over the tunneled chip)
    featurize.main(base + ["--n_speakers", "20", "--utts_per_speaker", "16",
                           "--functionals", "0"])
    print("== preprocess (5 folds) ==", flush=True)
    preprocess.main(base)
    print("== SER baseline (5 folds) ==", flush=True)
    train_baseline.main(base + ["--pred", "emotion", "--num_epochs", "25",
                                "--learning_rate", "2e-3", "--resume"])
    print("== gender adversary (5 folds) ==", flush=True)
    train_baseline.main(base + ["--pred", "gender", "--adv", "1",
                                "--num_epochs", "25", "--learning_rate", "2e-3",
                                "--resume"])
    for ratio in RATIOS:
        print(f"== cloak+GRL suppression {ratio} (5 folds) ==", flush=True)
        train_cloak.main(
            base + cloak_args + ["--suppression_ratio", str(ratio), "--resume"]
        )

    print("== evaluation sweep (ratio-matched cloaks, 5 folds) ==", flush=True)
    evaluate.main(base + eval_args)

    # ---- aggregate: clean per-fold means + the sweep CSV -> demo json ----
    sweep_csv = os.path.join(out, "grl-1.0.csv")
    rows = {}
    with open(sweep_csv) as f:
        for row in csv.DictReader(f):
            key = row[""]
            ratio = int(key.split("_")[2])
            rows[ratio] = {
                "emotion_acc": float(row["baseline_acc"]),
                "emotion_uar": float(row["baseline_rec"]),
                "adversary_acc": float(row["adv_acc"]),
                "adversary_uar": float(row["adv_rec"]),
            }

    # clean = the frozen models on UN-noised features (per-fold manifests)
    def mean_manifest(art, key):
        vals = []
        for k in range(1, 6):
            path = os.path.join(out, art, f"manifest_fold{k}.json")
            vals.append(json.load(open(path))[key])
        return float(np.mean(vals))

    clean = {
        "emotion_uar": mean_manifest("baseline_emotion", "test_uar"),
        "emotion_acc": mean_manifest("baseline_emotion", "test_acc"),
        "adversary_uar": mean_manifest("adv_baseline_gender", "test_uar"),
        "adversary_acc": mean_manifest("adv_baseline_gender", "test_acc"),
    }

    best_ratio = min(
        (r for r in RATIOS if r > 0), key=lambda r: rows[r]["adversary_uar"]
    )
    result = {
        "protocol": "adversary_cloak_evaluation.py:113-299 (ratio-matched "
                    "cloaks, eval-direction masks, 5 folds)",
        "corpus": "synthetic_hard (make_hard_corpus: 20 speakers x 16 utts)",
        "clean": clean,
        "sweep": {f"ratio_{r}": rows[r] for r in RATIOS},
        "best_privacy_point": {
            "ratio": best_ratio,
            "adversary_uar": rows[best_ratio]["adversary_uar"],
            "emotion_uar": rows[best_ratio]["emotion_uar"],
            "emotion_retention_vs_clean":
                rows[best_ratio]["emotion_uar"] / clean["emotion_uar"],
        },
        "privacy_gain_uar": clean["adversary_uar"]
        - min(rows[r]["adversary_uar"] for r in RATIOS if r > 0),
    }
    with open(os.path.join(HERE, "privacy_demo.json"), "w") as f:
        json.dump(result, f, indent=2)
    with open(sweep_csv) as src, open(
        os.path.join(HERE, "privacy_sweep.csv"), "w"
    ) as dst:
        dst.write(src.read())
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()

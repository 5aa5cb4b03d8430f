"""CLI: full pipeline orchestration (the reference's shell scripts
feature_extraction.sh + training_data_preprocess.sh + the four training
drivers, as one in-process run — no os.system process spawning).

    python -m sept_tpu.cli.run_all --dataset synthetic --num_epochs 15 \
        --folds 1 --scale_lamda 0.1

Stages: featurize -> preprocess -> baseline -> adversary -> cloak ->
cloak+GRL (optional) -> evaluation sweep.
"""

from __future__ import annotations

import argparse

from sept_tpu.cli import (
    evaluate,
    featurize,
    preprocess,
    train_baseline,
    train_cloak,
)
from sept_tpu.cli.common import add_common_args


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--grl", type=int, default=0)
    p.add_argument("--ratios", type=int, nargs="*", default=[0])
    p.add_argument("--n_speakers", type=int, default=10)
    p.add_argument("--utts_per_speaker", type=int, default=12)
    p.add_argument("--skip_featurize", action="store_true")
    args = p.parse_args(argv)

    def fwd(extra=()):
        out = []
        skip = ("grl", "ratios", "skip_featurize", "folds",
                "n_speakers", "utts_per_speaker")
        for k, v in vars(args).items():
            if k in skip or v is None:
                continue
            out += [f"--{k}", str(v)]
        if args.folds:
            out += ["--folds"] + [str(f) for f in args.folds]
        return out + list(extra)

    if not args.skip_featurize:
        print("== featurize ==")
        featurize.main(fwd([
            "--n_speakers", str(args.n_speakers),
            "--utts_per_speaker", str(args.utts_per_speaker),
        ]))
    print("== preprocess ==")
    preprocess.main(fwd())
    print("== baseline (emotion) ==")
    train_baseline.main(fwd(["--pred", "emotion", "--adv", "0"]))
    print("== adversary (gender) ==")
    train_baseline.main(fwd(["--pred", "gender", "--adv", "1"]))
    print("== cloak ==")
    train_cloak.main(fwd(["--grl", str(args.grl)]))
    for ratio in args.ratios:
        if ratio == 0:
            continue
        print(f"== cloak suppression {ratio} ==")
        train_cloak.main(
            fwd(["--grl", str(args.grl), "--suppression_ratio", str(ratio)])
        )
    print("== evaluation sweep ==")
    evaluate.main(
        fwd(["--grl", str(args.grl), "--ratios"] + [str(r) for r in args.ratios])
    )


if __name__ == "__main__":
    main()

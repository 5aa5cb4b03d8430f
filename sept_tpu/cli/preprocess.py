"""CLI: fold planning + split assembly (mirrors
/root/reference/preprocess_data/adversary_data_preprocess.py +
preprocess_adversary_data.py, without the os.system process spawning).

    python -m sept_tpu.cli.preprocess --dataset synthetic --work_dir work

Reads the feature store written by cli.featurize, computes the 5
speaker-disjoint folds, assembles windowed/normalized/augmented splits, and
writes ``<work_dir>/folds/<dataset>/fold<k>.npz``.
"""

from __future__ import annotations

import argparse
import os

from sept_tpu.cli.common import add_common_args, setup_seed


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    args = p.parse_args(argv)
    setup_seed(args.seed, getattr(args, "prng_impl", None))

    if args.dataset in ("combine", "combine_two"):
        return _combine(args)

    from sept_tpu.data.pipeline import assemble_fold
    from sept_tpu.data.splits import FoldPlan, plan_folds
    from sept_tpu.data.store import (
        load_feature_store,
        load_manifest,
        save_fold,
    )

    feat_dir = os.path.join(args.work_dir, "feature", args.feature_type, args.dataset)
    store = load_feature_store(
        os.path.join(feat_dir, f"data_{args.input_spec_size}.npz")
    )
    manifest = load_manifest(os.path.join(feat_dir, "manifest.json"))

    if args.dataset in ("iemocap", "crema-d", "msp-improv"):
        plans = plan_folds(args.dataset)
    else:
        # synthetic / custom corpora: round-robin speaker folds with the same
        # 40/40/20 economics as the reference planner
        speakers = sorted({u.speaker_id for u in manifest})
        n = len(speakers)
        plans = []
        for k in range(5):
            test = [speakers[i] for i in range(n) if i % 5 == k]
            rest = [s for s in speakers if s not in test]
            half = len(rest) // 2
            adv, base = rest[:half], rest[half:]
            vb = max(1, round(len(base) * 0.2))
            va = max(1, round(len(adv) * 0.2))
            plans.append(
                FoldPlan(
                    fold=k + 1,
                    train=tuple(base[vb:]),
                    validation=tuple(base[:vb]),
                    adv_train=tuple(adv[va:]),
                    adv_validation=tuple(adv[:va]),
                    test=tuple(test),
                )
            )

    out_dir = os.path.join(args.work_dir, "folds", args.dataset)
    os.makedirs(out_dir, exist_ok=True)
    fold_nums = args.folds or [pl.fold for pl in plans]
    for plan in plans:
        if plan.fold not in fold_nums:
            continue
        fold = assemble_fold(
            manifest,
            store,
            plan,
            dataset=args.dataset,
            feature_type=args.feature_type,
            feature_len=args.input_spec_size,
            win_len=args.win_len,
            norm=args.norm,
            aug=args.aug or None,
            seed=args.seed,
            shift=bool(args.shift),
        )
        path = os.path.join(out_dir, f"fold{plan.fold}.npz")
        save_fold(path, fold)
        print(
            f"fold{plan.fold}: train {len(fold.training)} / val "
            f"{len(fold.validation)} / adv_train {len(fold.adv_training)} / "
            f"adv_val {len(fold.adv_validation)} / test {len(fold.test)} -> {path}"
        )


def _combine(args):
    """--dataset combine | combine_two: merge the corpora's assembled folds
    (preprocess_adversary_data.py:86-104).  ``combine`` merges all three
    corpora; ``combine_two`` merges iemocap + crema-d only
    (training_adversary_baselines.py:53,148)."""
    import os

    from sept_tpu.data.combine import combine_folds
    from sept_tpu.data.store import load_fold, save_fold

    corpora = ("iemocap", "crema-d", "msp-improv")
    if args.dataset == "combine_two":
        corpora = ("iemocap", "crema-d")
    out_dir = os.path.join(args.work_dir, "folds", args.dataset)
    os.makedirs(out_dir, exist_ok=True)
    for k in args.folds or range(1, 6):
        folds = []
        for ds in corpora:
            path = os.path.join(args.work_dir, "folds", ds, f"fold{k}.npz")
            folds.append(load_fold(path))
        merged = combine_folds(folds)
        path = os.path.join(out_dir, f"fold{k}.npz")
        save_fold(path, merged)
        print(f"{args.dataset} fold{k}: train {len(merged.training)} test "
              f"{len(merged.test)} -> {path}")


if __name__ == "__main__":
    main()

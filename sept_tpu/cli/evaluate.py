"""CLI: utility-privacy evaluation sweep (mirrors
/root/reference/training/adversary_cloak_evaluation.py).

    python -m sept_tpu.cli.evaluate --dataset synthetic --scale_lamda 0.1

For each suppression ratio in {0, 20, 40, 60, 80} x fold: load the trained
cloak, the frozen emotion baseline, and the frozen gender adversary; run test
utterances through the cloak (max_scale=5 at evaluation,
adversary_cloak_evaluation.py:205), feed the NOISED features to both frozen
models with the sliding-window vote, aggregate fold means, and write the
reference CSV schema to ``<output_dir>/(non-)grl-<scale_lamda>.csv``.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from sept_tpu.cli.common import (
    add_common_args,
    config_from_args,
    resolve_mesh,
    setup_seed,
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--grl", type=int, default=0)
    p.add_argument("--ratios", type=int, nargs="*", default=[0, 20, 40, 60, 80])
    args = p.parse_args(argv)
    setup_seed(args.seed, getattr(args, "prng_impl", None), distributed=True)
    mesh = resolve_mesh(args)  # --n_devices: shard test batches over a mesh
    cfg = config_from_args(args, grl=bool(args.grl))
    cfg.noise_max_scale = 5.0  # eval-time max scale (:205)

    from sept_tpu.cli.train_baseline import artifact_name as baseline_artifact
    from sept_tpu.cli.train_cloak import cloak_artifact
    from sept_tpu.data.store import load_fold
    from sept_tpu.eval.sweep import (
        eval_mask,
        evaluate_cloaked_test,
        rows_to_csv,
        sweep_to_rows,
    )
    from sept_tpu.models import CloakNoise, build_backbone, pooling_for
    from sept_tpu.train import make_eval_logits_fn
    from sept_tpu.train.checkpoint import CheckpointManager

    fold_dir = os.path.join(args.work_dir, "folds", args.dataset)
    ckpt = CheckpointManager(cfg.output_dir)

    noise = CloakNoise(win_len=cfg.win_len, n_feats=cfg.feature_len,
                       max_scale=cfg.noise_max_scale)
    emotion = build_backbone(cfg.model_type, hidden_size=cfg.hidden_size,
                             pred="emotion", att=cfg.att,
                             attention_size=cfg.attention_size)
    adversary = build_backbone(cfg.model_type, hidden_size=cfg.hidden_size,
                               pred="gender", att=cfg.att,
                               attention_size=cfg.attention_size)
    pooling = pooling_for(cfg.model_type)
    # use_global: the frozen models were trained with the 88-dim concat and
    # must see it at eval too (the reference's --global_feature eval path is
    # a latent crash — it omits the global arg, see eval/sweep.py)
    emo_fn = make_eval_logits_fn(emotion, pooling=pooling,
                                 use_global=cfg.global_feature)
    adv_fn = make_eval_logits_fn(adversary, pooling=pooling,
                                 use_global=cfg.global_feature)

    # ONE joint function for the whole sweep: the cloak variables, frozen
    # weights, mask, and noise key all arrive as ARGUMENTS, so every
    # (ratio, fold) cell reuses the same compiled vote program (the old
    # per-cell closures recompiled the two-backbone forward 25 times —
    # multi-minute compiles each over a tunneled chip)
    def joint_logits(fn_params, wins, g, m, rng):
        # wins (N, T, D, 1) -> noised once per call (protocol of
        # two_d_cnn_lstm_syn.forward returning x.detach()), then both
        # frozen heads (adversary_cloak_evaluation.py:78-83)
        noise_vars, base_p, adv_p = fn_params
        noised = noise.apply(noise_vars, wins[..., 0], m,
                             rngs={"noise": rng})[..., None]
        return jnp.concatenate([
            emo_fn(base_p["params"], base_p.get("batch_stats", {}),
                   noised, g),
            adv_fn(adv_p["params"], adv_p.get("batch_stats", {}),
                   noised, g),
        ], axis=-1)

    per_ratio = {}
    for ratio in args.ratios:
        fold_results = []
        for k in args.folds or range(1, cfg.n_folds + 1):
            fold = load_fold(os.path.join(fold_dir, f"fold{k}.npz"))
            supp_cfg = type(cfg)(**{**cfg.__dict__, "suppression_ratio": ratio})
            cloak = ckpt.restore(cloak_artifact(supp_cfg), k)
            emo_cfg = type(cfg)(**{**cfg.__dict__, "adv": False,
                                   "pred": "emotion"})
            adv_cfg = type(cfg)(**{**cfg.__dict__, "adv": True,
                                   "pred": "gender"})
            base = ckpt.restore(baseline_artifact(emo_cfg), k)
            adv = ckpt.restore(baseline_artifact(adv_cfg), k)

            noise_params = {"params": {
                "locs": jnp.asarray(cloak["params"]["noise"]["locs"]),
                "rhos": jnp.asarray(cloak["params"]["noise"]["rhos"]),
            }}
            scales = np.asarray(
                noise.apply(noise_params, method=CloakNoise.scales)
            )
            mask = eval_mask(scales, ratio)

            b, a = evaluate_cloaked_test(
                joint_logits, (noise_params, base, adv), fold.test, mask,
                win_len=cfg.win_len, shift_len=cfg.shift_len,
                noise_seed=cfg.seed, mesh=mesh,
                use_global=cfg.global_feature,
            )
            fold_results.append((b, a))
            print(
                f"ratio {ratio} fold{k}: baseline acc {b['acc']:.3f} "
                f"uar {b['rec']:.3f} | adversary acc {a['acc']:.3f} "
                f"uar {a['rec']:.3f}"
            )
        per_ratio[ratio] = fold_results

    rows = sweep_to_rows(per_ratio, cfg.dataset)
    name = ("grl-" if cfg.grl else "non-grl-") + str(cfg.scale_lambda)
    out_csv = os.path.join(cfg.output_dir, f"{name}.csv")
    os.makedirs(cfg.output_dir, exist_ok=True)
    rows_to_csv(rows, out_csv)
    print(f"wrote {out_csv}")
    for r in rows:
        print(
            f"  {r.index}: baseline {r.baseline_acc:.3f}/{r.baseline_rec:.3f} "
            f"adversary {r.adv_acc:.3f}/{r.adv_rec:.3f}"
        )


if __name__ == "__main__":
    main()

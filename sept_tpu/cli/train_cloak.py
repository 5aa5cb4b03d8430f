"""CLI: cloak noise-injection training (mirrors
/root/reference/training/training_cloak.py and, with --grl 1,
training_cloak_with_grl.py).

    python -m sept_tpu.cli.train_cloak --dataset synthetic --scale_lamda 0.1
    python -m sept_tpu.cli.train_cloak --dataset synthetic --grl 1

Loads the frozen pretrained baseline (trained by cli.train_baseline), wraps
it with the CloakNoise layer (and, for GRL, a fresh trainable gender
adversary), and trains ONLY the cloak-trainable partition.  Suppression runs
(--suppression_ratio > 0) load the suppression_0 cloak, freeze rhos, and
apply the training-direction percentile mask (training_cloak.py:364-371);
--mask_direction eval trains under the evaluation sweep's mask instead
(fixes the reference's quirk-8 train/eval mismatch — see
sept_tpu.eval.sweep.train_mask/eval_mask).
Artifacts: ``cloak[_grl]_<scale_lamda>_supp<r>[_anti][_sal<w>][_mdeval][_bf16]/
fold<k>`` (training-extension knobs are part of the artifact identity —
see :func:`cloak_artifact`).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from sept_tpu.cli.common import add_common_args, config_from_args, setup_seed


def cloak_artifact(cfg) -> str:
    """Checkpoint directory name for a cloak training configuration.

    Encodes every knob that changes WHAT the trained cloak is — including
    the framework's training extensions — so cloaks trained under different
    regimes can never collide on one artifact (an eval-direction /
    saliency-shaped cloak silently resumed or swept as a reference-protocol
    one).  Mirrors the reference's hyperparameters-in-directory-names scheme
    (training_cloak.py:277-280).
    """
    tag = "cloak_grl" if cfg.grl else "cloak"
    name = f"{tag}_lamda{cfg.scale_lambda}_supp{cfg.suppression_ratio}"
    if cfg.antithetic_noise:
        name += "_anti"
    if cfg.saliency_align:
        name += f"_sal{cfg.saliency_align:g}"
    # the mask direction only shapes ratio-matched (suppressed) training;
    # suppression-0 cloaks are shared between directions
    if cfg.suppression_ratio and cfg.mask_direction == "eval":
        name += "_mdeval"
    if cfg.compute_dtype != "float32":
        name += "_bf16"
    return name


def run_fold(cfg, fold, ckpt, verbose=True, mesh=None, resume_path=None):
    from sept_tpu.data.pipeline import batch_iterator
    from sept_tpu.eval.sweep import eval_mask, train_mask
    from sept_tpu.models import (
        CloakedModel,
        CloakedModelGRL,
        build_backbone,
        compute_dtype,
        pooling_for,
    )
    from sept_tpu.train import (
        TrainState,
        make_cloak_grl_step,
        make_cloak_optimizer,
        make_cloak_step,
    )
    from sept_tpu.train.loop import fit, speaker_weights
    from sept_tpu.train.steps import cloak_scales

    backbone = build_backbone(
        cfg.model_type, hidden_size=cfg.hidden_size, pred="emotion",
        att=cfg.att, attention_size=cfg.attention_size,
        dtype=compute_dtype(cfg.compute_dtype),
        # the frozen backbone runs eval-mode BN; fused_block1_eval still
        # carries gradients through to the upstream noise parameters
        conv_backend=cfg.resolved_conv_backend(),
        remat=cfg.remat,
    )
    from sept_tpu.cli.train_baseline import artifact_name as baseline_artifact

    base_cfg = type(cfg)(**{**cfg.__dict__, "adv": False, "pred": "emotion"})
    pretrained = ckpt.restore(baseline_artifact(base_cfg), fold.fold)

    if cfg.grl:
        gender = build_backbone(
            cfg.model_type, hidden_size=cfg.hidden_size, pred="gender",
            att=cfg.att, attention_size=cfg.attention_size,
            # the gender adversary trains (BN updates): sync-BN under DP;
            # the frozen emotion backbone runs eval-mode BN and needs none
            bn_axis_name="data" if mesh is not None else None,
            dtype=compute_dtype(cfg.compute_dtype),
            conv_backend=cfg.resolved_conv_backend(),
            remat=cfg.remat,
        )
        model = CloakedModelGRL(
            emotion_backbone=backbone, gender_backbone=gender,
            grl_lambda=cfg.grl_lambda, win_len=cfg.win_len,
            n_feats=cfg.feature_len, min_scale=cfg.noise_min_scale,
            max_scale=cfg.noise_max_scale,
        )
        trainable = ("noise", "gender_backbone")
    else:
        model = CloakedModel(
            backbone=backbone, win_len=cfg.win_len, n_feats=cfg.feature_len,
            min_scale=cfg.noise_min_scale, max_scale=cfg.noise_max_scale,
        )
        trainable = ("noise",)

    sample = next(
        batch_iterator(fold.training, cfg.batch_size, np.random.default_rng(0))
    )
    spec = jnp.asarray(sample["spec"])
    import functools

    # init must see the global feature when configured: the (fresh) gender
    # adversary's dense1 takes 2*hidden + 88 inputs with it (the reference
    # concats globals into BOTH branches, cloak_models.py:187-224)
    g0 = jnp.asarray(sample["global"]) if cfg.global_feature else None
    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.PRNGKey(cfg.seed),
         "noise": jax.random.PRNGKey(cfg.seed + 1),
         "dropout": jax.random.PRNGKey(cfg.seed + 2)},
        spec, global_feature=g0,
    )
    params = dict(variables["params"])
    # graft the pretrained frozen backbone weights in
    bk = "emotion_backbone" if cfg.grl else "backbone"
    params[bk] = pretrained["params"]
    batch_stats = dict(variables.get("batch_stats", {}))
    if pretrained.get("batch_stats"):
        batch_stats[bk] = pretrained["batch_stats"]

    mask = None
    if cfg.suppression_ratio:
        base_art = cloak_artifact(
            type(cfg)(**{**cfg.__dict__, "suppression_ratio": 0})
        )
        supp0 = ckpt.restore(base_art, fold.fold)
        params["noise"] = supp0["params"]["noise"]
        scales = np.asarray(cloak_scales(model, params))
        mask_fn = eval_mask if cfg.mask_direction == "eval" else train_mask
        mask = jnp.asarray(mask_fn(scales, cfg.suppression_ratio))

    # ceil — see train_baseline.py: both drivers execute the padded partial
    # batch, so floor would make the schedule overcount epochs
    steps_per_epoch = max(1, -(-len(fold.training) // cfg.batch_size))
    tx = make_cloak_optimizer(
        cfg, steps_per_epoch, params, trainable,
        freeze_rhos=bool(cfg.suppression_ratio),
    )
    state = TrainState(
        params=params, batch_stats=batch_stats, opt_state=tx.init(params),
        rng=jax.random.PRNGKey(cfg.seed), step=jnp.zeros((), jnp.int32),
    )
    pooling = pooling_for(cfg.model_type)
    apply_reg = cfg.suppression_ratio == 0

    def make_step():
        # per-step host-loop jitted step — only the fit() branch uses it
        # (fit_device_cloak compiles its own scanned epoch)
        if cfg.grl:
            return make_cloak_grl_step(
                model, tx, scale_lambda=cfg.scale_lambda,
                gender_lambda=cfg.gender_lambda, use_global=cfg.global_feature,
                apply_scale_reg=apply_reg, pooling=pooling,
                antithetic=cfg.antithetic_noise,
                saliency_align=cfg.saliency_align,
            )
        return make_cloak_step(
            model, tx, scale_lambda=cfg.scale_lambda,
            use_global=cfg.global_feature, apply_scale_reg=apply_reg,
            pooling=pooling, antithetic=cfg.antithetic_noise,
        )

    # eval logits: cloak forward (emotion head), fixed noise key per eval
    def eval_logits(params_, batch_stats_, spec_, g=None):
        out = model.apply(
            {"params": params_, "batch_stats": batch_stats_}, spec_,
            global_feature=g if cfg.global_feature else None,
            mask=mask, pooling=pooling,
            rngs={"noise": jax.random.PRNGKey(0)},
        )
        return out[0]

    spk_w = speaker_weights(fold.training) if "combine" in cfg.dataset else None

    def sigma_stats(st):
        # per-epoch sigma observables — the reference prints these every
        # epoch (training_cloak.py:429-438); kept in history so parity
        # harnesses can overlay optimization dynamics, not just endpoints
        s = np.asarray(cloak_scales(model, st.params))
        return {"sigma_log_mean": float(np.log(s.mean())),
                "sigma_mean": float(s.mean()), "sigma_max": float(s.max())}

    if jax.default_backend() != "cpu" or mesh is not None:
        from sept_tpu.train.device_loop import fit_device_cloak

        result = fit_device_cloak(
            state, model, tx, fold.training, fold.validation, fold.test, cfg,
            jax.jit(eval_logits), mask=mask, spk_weights=spk_w, verbose=verbose,
            mesh=mesh, resume_path=resume_path, epoch_callback=sigma_stats,
        )
    else:
        result = fit(
            state, make_step(), jax.jit(eval_logits), fold.training,
            fold.validation, fold.test, cfg, spk_weights=spk_w, mask=mask,
            verbose=verbose, epoch_callback=sigma_stats,
        )

    scales = np.asarray(cloak_scales(model, result.best_state.params))
    ckpt.save(
        cloak_artifact(cfg), fold.fold,
        result.best_state.params, result.best_state.batch_stats,
        manifest={
            "config": cfg,
            "best_epoch": result.best_epoch,
            "test_acc": result.final_test_acc,
            "test_uar": result.final_test_uar,
            "scales_mean": float(scales.mean()),
            "scales_max": float(scales.max()),
            "scales_min": float(scales.min()),
            "sigma_log_mean_trajectory": [
                h.get("sigma_log_mean") for h in result.history
            ],
        },
    )
    if verbose:
        print(
            "scales mean/max/min %.3f/%.3f/%.3f"
            % (scales.mean(), scales.max(), scales.min())
        )
    return result


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--grl", type=int, default=0)
    p.add_argument("--resume", action="store_true",
                   help="skip folds whose checkpoint already exists")
    args = p.parse_args(argv)
    setup_seed(args.seed, getattr(args, "prng_impl", None), distributed=True)
    cfg = config_from_args(args, grl=bool(args.grl))
    if args.learning_rate is None:
        cfg.learning_rate = 1e-3 if cfg.optimizer == "sgd" else 5e-4
    cfg.lr_step_epochs = 10  # cloak StepLR(10, 0.5) (training_cloak.py:379)
    if cfg.grl:
        # the GRL trainer steps StepLR once per epoch (only on the validate
        # pass, training_cloak_with_grl.py:186-191) and uses
        # Plateau(patience=3, factor=0.5) (:421)
        cfg.lr_sched_steps_per_epoch = 1
        cfg.plateau_patience, cfg.plateau_factor = 3, 0.5

    from sept_tpu.cli.common import resolve_mesh
    from sept_tpu.data.store import load_fold
    from sept_tpu.train.checkpoint import CheckpointManager

    mesh = resolve_mesh(args)
    if mesh is not None:
        print(f"data parallel: {mesh.devices.size}-device mesh")
    fold_dir = os.path.join(args.work_dir, "folds", args.dataset)
    ckpt = CheckpointManager(cfg.output_dir)
    accs, uars = [], []
    for k in args.folds or range(1, cfg.n_folds + 1):
        if args.resume and ckpt.exists(cloak_artifact(cfg), k):
            print(f"fold{k}: checkpoint exists, skipping (--resume)")
            continue
        fold = load_fold(os.path.join(fold_dir, f"fold{k}.npz"))
        resume_path = (
            os.path.join(cfg.output_dir, cloak_artifact(cfg), f"mid_fold{k}")
            if args.resume else None
        )
        result = run_fold(cfg, fold, ckpt, mesh=mesh, resume_path=resume_path)
        accs.append(result.final_test_acc)
        uars.append(result.final_test_uar)
        print(
            f"fold{k}: test acc {result.final_test_acc:.3f} "
            f"uar {result.final_test_uar:.3f}"
        )
    if accs:
        print(
            f"{cloak_artifact(cfg)}: mean test acc {np.mean(accs):.3f} "
            f"uar {np.mean(uars):.3f}"
        )
    else:
        print(f"{cloak_artifact(cfg)}: all folds resumed from existing "
              f"checkpoints, nothing trained")


if __name__ == "__main__":
    main()

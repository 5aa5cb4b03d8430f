"""CLI: baseline SER / adversary training (mirrors
/root/reference/training/training_adversary_baselines.py).

    python -m sept_tpu.cli.train_baseline --dataset synthetic --pred emotion
    python -m sept_tpu.cli.train_baseline --dataset synthetic --pred gender --adv 1

Per fold: loads the assembled splits, trains the configured backbone with
best-by-validation-accuracy selection (after epoch 10), evaluates via the
sliding-window vote, and checkpoints the best params under
``<output_dir>/{baseline|adv_baseline}_<pred>/fold<k>``.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from sept_tpu.cli.common import add_common_args, config_from_args, setup_seed


def artifact_name(cfg) -> str:
    base = "adv_baseline" if cfg.adv else "baseline"
    name = f"{base}_{cfg.pred}"
    # non-default training numerics are part of the artifact identity: a
    # bf16-trained checkpoint must not collide with (or silently resume) an
    # f32 one
    if cfg.compute_dtype != "float32":
        name += "_bf16"
    return name


def run_fold(cfg, fold, ckpt, verbose=True, metrics_path=None, mesh=None,
             resume_path=None):
    from sept_tpu.data.pipeline import batch_iterator
    from sept_tpu.models import build_backbone, compute_dtype, pooling_for
    from sept_tpu.train import (
        init_state,
        make_baseline_step,
        make_eval_logits_fn,
        make_optimizer,
    )
    from sept_tpu.train.device_loop import fit_device
    from sept_tpu.train.loop import fit, speaker_weights

    train_split = fold.adv_training if cfg.adv else fold.training
    val_split = fold.adv_validation if cfg.adv else fold.validation

    model = build_backbone(
        cfg.model_type,
        hidden_size=cfg.hidden_size,
        pred=cfg.pred,
        att=cfg.att,
        attention_size=cfg.attention_size,
        # sync-BN over the mesh axis: train-mode BatchNorm must see the
        # GLOBAL batch for DP equivalence (parallel/epoch_dp.py)
        bn_axis_name="data" if mesh is not None else None,
        dtype=compute_dtype(cfg.compute_dtype),
        conv_backend=cfg.resolved_conv_backend(),
        remat=cfg.remat,
    )
    # ceil: every driver executes the padded partial batch too (host
    # batch_iterator yields it; DeviceSplit.n_batches rounds up), and the
    # schedule converts optimizer steps -> epochs by dividing by this —
    # floor would overcount epochs and fire StepLR decays early
    steps_per_epoch = max(1, -(-len(train_split) // cfg.batch_size))
    tx = make_optimizer(cfg, steps_per_epoch)
    sample = next(
        batch_iterator(train_split, cfg.batch_size, np.random.default_rng(0))
    )
    sample = {
        k: jnp.asarray(v) for k, v in sample.items()
        if k not in ("speaker_ids", "datasets")
    }
    pooling = pooling_for(cfg.model_type)
    state = init_state(
        model, tx, jax.random.PRNGKey(cfg.seed), sample,
        use_global=cfg.global_feature, pooling=pooling,
    )
    logits_fn = make_eval_logits_fn(model, use_global=cfg.global_feature,
                                    pooling=pooling)
    spk_w = speaker_weights(train_split) if "combine" in cfg.dataset else None
    use_device_loop = (
        cfg.pred in ("emotion", "gender", "multitask")
        # scan compile is slow on CPU; an explicit mesh overrides (tests /
        # forced --n_devices on the virtual CPU mesh)
        and (jax.default_backend() != "cpu" or mesh is not None)
    )
    if use_device_loop:
        # fast path: device-resident splits + scanned epochs (DP over the
        # mesh when one is provided)
        result = fit_device(state, model, tx, train_split, val_split,
                            fold.test, cfg, logits_fn, spk_weights=spk_w,
                            verbose=verbose, mesh=mesh,
                            resume_path=resume_path)
    else:
        if mesh is not None:
            print("note: --n_devices DP needs the device loop; training "
                  "single-device")
        # per-step host loop: the jitted step is only built on this branch
        # (fit_device compiles its own scanned epoch)
        step = make_baseline_step(model, tx, use_global=cfg.global_feature,
                                  pooling=pooling)
        result = fit(state, step, logits_fn, train_split, val_split,
                     fold.test, cfg, spk_weights=spk_w, verbose=verbose)
    if metrics_path:
        from sept_tpu.utils import MetricsLogger

        log = MetricsLogger(metrics_path)
        for epoch, h in enumerate(result.history):
            log.log(fold=fold.fold, epoch=epoch,
                    train_loss=h["train"]["loss"], train_acc=h["train"]["acc"],
                    val_loss=h["validate"]["loss"], val_acc=h["validate"]["acc"],
                    test_acc=h["test"]["acc"], test_uar=h["test"]["uar"])
        log.close()
    ckpt.save(
        artifact_name(cfg),
        fold.fold,
        result.best_state.params,
        result.best_state.batch_stats,
        manifest={
            "config": cfg,
            "best_epoch": result.best_epoch,
            "best_val_acc": result.best_val_acc,
            "test_acc": result.final_test_acc,
            "test_uar": result.final_test_uar,
        },
    )
    return result


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--resume", action="store_true",
                   help="skip folds whose checkpoint already exists")
    args = p.parse_args(argv)
    setup_seed(args.seed, getattr(args, "prng_impl", None), distributed=True)
    cfg = config_from_args(args)
    if args.learning_rate is None:
        cfg.learning_rate = 1e-4 if cfg.optimizer == "sgd" else 5e-5
    if args.num_epochs is None and cfg.optimizer == "sgd":
        # reference runs 100 epochs under SGD regardless of --num_epochs
        # (training_adversary_baselines.py:440); we honor an explicit flag
        cfg.num_epochs = 100
    # Plateau(patience=3, factor=0.2) for adam baselines (:429)
    cfg.plateau_patience, cfg.plateau_factor = 3, 0.2

    from sept_tpu.cli.common import resolve_mesh
    from sept_tpu.data.store import load_fold
    from sept_tpu.train.checkpoint import CheckpointManager

    mesh = resolve_mesh(args)
    if mesh is not None:
        print(f"data parallel: {mesh.devices.size}-device mesh")
    fold_dir = os.path.join(args.work_dir, "folds", args.dataset)
    ckpt = CheckpointManager(cfg.output_dir)
    metrics_path = os.path.join(
        cfg.output_dir, artifact_name(cfg), "metrics.jsonl"
    )
    accs, uars = [], []
    for k in args.folds or range(1, cfg.n_folds + 1):
        if args.resume and ckpt.exists(artifact_name(cfg), k):
            print(f"fold{k}: checkpoint exists, skipping (--resume)")
            continue
        fold = load_fold(os.path.join(fold_dir, f"fold{k}.npz"))
        # --resume also enables mid-fold (epoch-level) checkpointing: an
        # interrupted fold continues from its last completed epoch
        resume_path = (
            os.path.join(cfg.output_dir, artifact_name(cfg), f"mid_fold{k}")
            if args.resume else None
        )
        result = run_fold(cfg, fold, ckpt, metrics_path=metrics_path,
                          mesh=mesh, resume_path=resume_path)
        accs.append(result.final_test_acc)
        uars.append(result.final_test_uar)
        print(
            f"fold{k}: best epoch {result.best_epoch} "
            f"test acc {result.final_test_acc:.3f} uar {result.final_test_uar:.3f}"
        )
    _print_summary(cfg, accs, uars)
    _write_run_manifest(cfg, accs, uars, args)


def _print_summary(cfg, accs, uars):
    if accs:
        print(
            f"{artifact_name(cfg)}: mean test acc {np.mean(accs):.3f} "
            f"uar {np.mean(uars):.3f} over {len(accs)} folds"
        )
    else:
        print(f"{artifact_name(cfg)}: all folds resumed from existing "
              f"checkpoints, nothing trained")


def _write_run_manifest(cfg, accs, uars, args):
    from sept_tpu.utils import RunManifest

    manifest = RunManifest(
        os.path.join(cfg.output_dir, artifact_name(cfg), "run.json"), cfg
    )
    manifest.record(mean_test_acc=float(np.mean(accs)) if accs else None,
                    mean_test_uar=float(np.mean(uars)) if uars else None,
                    folds=list(args.folds or range(1, cfg.n_folds + 1)))
    manifest.write()


if __name__ == "__main__":
    main()

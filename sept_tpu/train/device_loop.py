"""Device-resident fold training: scanned epochs, host-side control flow.

The portable fit() loop (sept_tpu.train.loop) dispatches one jitted step per
batch — correct everywhere, but per-step dispatch costs ~55 ms over this
machine's tunneled chip.  This module uploads a fold's splits to HBM once
and runs each training epoch and each validation pass as ONE scanned device
program; only per-epoch scalars return to host, where the reference's
control flow (best-by-val-acc after epoch 10, early stopping, plateau
scaling — training_adversary_baselines.py:440-460) decides what happens
next.  The sliding-window test vote stays the batched/vmapped evaluator.

The baseline loop covers every pred (emotion / gender / multitask) and the
88-dim global feature (``DeviceSplit.globals`` rides the scanned epoch);
the cloak loop covers the same surface (globals ride the scanned
epoch into the frozen backbone's post-pool concat).
Numerical behavior matches the per-step path up to batch shuffling
granularity (the scanned epoch reshuffles identically via the same numpy
permutation stream).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sept_tpu.data.pipeline import SplitArrays
from sept_tpu.models import pooling_for
from sept_tpu.eval import metrics as M
from sept_tpu.train.config import ExperimentConfig
from sept_tpu.train.loop import EarlyStopping, FitResult, run_test
from sept_tpu.train.optim import PlateauScheduler, set_lr_scale
from sept_tpu.train.steps import (
    make_cloak_epoch_runner,
    make_epoch_runner,
)

__all__ = ["DeviceSplit", "make_val_pass", "fit_device", "fit_device_cloak"]


class DeviceSplit:
    """One split's windows/labels/weights resident in HBM, padded to a
    batch-size multiple with zero-weight rows.

    With ``mesh``, every array is placed replicated across the mesh (the DP
    epoch runners read the full split on each chip and shard only the batch
    order — sept_tpu.parallel.epoch_dp).
    """

    def __init__(self, split: SplitArrays, label_key: str, batch_size: int,
                 extra_weights: Optional[np.ndarray] = None, mesh=None):
        n = len(split)
        pad = (-n) % batch_size
        w = np.ones(n + pad, np.float32)
        w[n:] = 0.0
        if extra_weights is not None:
            w[:n] *= extra_weights

        def padded(a):
            # pad with COPIES OF ROW 0, exactly like the host path
            # (batch_iterator pads the index vector with zeros): zero-weight
            # rows are excluded from loss/metrics either way, but pad
            # windows still enter train-mode BatchNorm batch statistics —
            # all-zero rows would bias them with out-of-distribution data
            if not pad:
                return a
            return np.concatenate([a, np.repeat(a[:1], pad, axis=0)])

        self.windows = jnp.asarray(padded(split.windows))
        self.labels_emo = jnp.asarray(padded(split.labels_emo))
        self.labels_gen = jnp.asarray(padded(split.labels_gen))
        self.labels = (
            self.labels_gen if label_key == "labels_gen" else self.labels_emo
        )
        self.weights = jnp.asarray(w)
        self.globals = jnp.asarray(padded(split.global_data))
        if mesh is not None:
            from sept_tpu.parallel.epoch_dp import put_replicated

            (self.windows, self.labels_emo, self.labels_gen, self.labels,
             self.weights, self.globals) = put_replicated(
                (self.windows, self.labels_emo, self.labels_gen, self.labels,
                 self.weights, self.globals), mesh)
        self.n_real = n
        self.n_batches = (n + pad) // batch_size
        self.batch_size = batch_size


def _masked_uar(truth: np.ndarray, preds: np.ndarray, valid: np.ndarray):
    t, p = truth[valid], preds[valid]
    return M.accuracy(t, p), M.uar(t, p)


def _spk_weight_vec(split: SplitArrays, spk_weights: Optional[dict]):
    """Per-row combine-mode loss weights (reference ``weights[speaker_id]``,
    training_adversary_baselines.py:178 — applied in BOTH training and
    validate modes, so the val split gets a vector too)."""
    if spk_weights is None:
        return None
    return np.array(
        [
            spk_weights.get(f"{s}_{d}", 1.0)
            for s, d in zip(split.speaker_ids, split.datasets)
        ],
        dtype=np.float32,
    )


def _loop_snapshot(epoch, best_val_acc, best_epoch, early, plateau, final,
                   history):
    """Host bookkeeping -> JSON-able dict (see train.midfold)."""
    from sept_tpu.train.checkpoint import _jsonable

    return _jsonable({
        "epoch": epoch, "best_val_acc": best_val_acc, "best_epoch": best_epoch,
        "early_best": early.best, "early_counter": early.counter,
        "early_stop": early.should_stop,
        "plateau_best": plateau.best, "plateau_bad": plateau.bad_epochs,
        "plateau_scale": plateau.scale,
        "final": {"acc": final["acc"], "uar": final["uar"],
                  "conf": np.asarray(final["conf"]).tolist()},
        "history": history,
    })


def _loop_restore(loop, early, plateau):
    """Inverse of _loop_snapshot; returns (start_epoch, best_val_acc,
    best_epoch, final, history)."""
    early.best = loop["early_best"]
    early.counter = loop["early_counter"]
    early.should_stop = loop["early_stop"]
    plateau.best = loop["plateau_best"]
    plateau.bad_epochs = loop["plateau_bad"]
    plateau.scale = loop["plateau_scale"]
    final = {"acc": loop["final"]["acc"], "uar": loop["final"]["uar"],
             "conf": np.asarray(loop["final"]["conf"])}
    return (loop["epoch"] + 1, loop["best_val_acc"], loop["best_epoch"],
            final, loop["history"])


def make_val_pass(apply_logits, use_global: bool = False):
    """Scanned whole-split validation pass: one device program, but peak
    activation memory bounded by batch_size (the split is processed
    batch-by-batch inside a lax.scan, like the train path — a single
    whole-split forward would exhaust HBM at corpus scale).

    ``apply_logits(params, batch_stats, windows_batch (B, T, D), g) ->
    logits`` (``g`` is the (B, 88) global-feature batch, or None without
    ``use_global``).  Returns ``val(params, batch_stats, windows (M,T,D),
    labels (M,), weights (M,), n_batches, batch_size[, globals_]) ->
    (loss, preds (M,))`` where loss is the MEAN OF PER-BATCH MEANS — the
    same statistic the per-step path (loop.run_eval_epoch) and the
    reference (np.mean over train_loss_list,
    training_adversary_baselines.py:205) feed to the plateau scheduler and
    early stopping.  A single global weighted mean differs whenever the
    split isn't a batch-size multiple (the short last batch carries a full
    1/n_batches of a batch-means average), which shifted LR reductions and
    stop epochs between the two drivers.
    """

    @functools.partial(jax.jit, static_argnames=("n_batches", "batch_size"))
    def val(params, batch_stats, windows, labels, weights, *, n_batches,
            batch_size, globals_=None):
        def body(_, i):
            lo = i * batch_size
            x = jax.lax.dynamic_slice_in_dim(windows, lo, batch_size)
            g = (jax.lax.dynamic_slice_in_dim(globals_, lo, batch_size)
                 if use_global else None)
            lab = jax.lax.dynamic_slice_in_dim(labels, lo, batch_size)
            w = jax.lax.dynamic_slice_in_dim(weights, lo, batch_size)
            logits = apply_logits(params, batch_stats, x, g)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(logp, lab[:, None], axis=-1)[:, 0]
            n_real = jnp.maximum(jnp.sum((w > 0).astype(jnp.float32)), 1.0)
            return None, (jnp.sum(nll * w) / n_real, jnp.argmax(logits, -1))

        _, (batch_losses, preds) = jax.lax.scan(
            body, None, jnp.arange(n_batches))
        return jnp.mean(batch_losses), preds.reshape(-1)

    return val


def _run_epoch_loop(state, cfg: ExperimentConfig, *, train_epoch, val_epoch,
                    test_epoch, m_total: int, n_real: Optional[int] = None,
                    needs_order: bool = True,
                    resume_path: Optional[str],
                    replicate, verbose: bool,
                    epoch_callback=None) -> FitResult:
    """Shared epoch-loop bookkeeping for ALL fold drivers (loop.fit and
    both device-resident drivers).

    ``train_epoch(state, epoch, order) -> (state, train metrics dict with
    at least 'loss'/'acc')``, ``val_epoch(state) -> dict with
    'loss'/'acc'/'uar'``, ``test_epoch(state) -> test metrics dict`` close
    over the workload's splits and compiled programs; everything else —
    best-state tracking (STRICT > after epoch > min_sel, reference
    semantics), plateau scaling, early stopping (patience accrues only
    once selection opens; the ``early_stop_with_sgd`` gate), mid-fold
    save/restore with identical shuffle replay, and FitResult assembly —
    lives HERE once, so the drivers cannot drift apart (they had:
    fit_device_cloak ignored early_stop_with_sgd for a while; loop.fit
    carried its own copy of all of this until round 3).
    ``replicate`` re-places restored states onto the mesh (identity when
    single-device).
    """
    # resume replays THIS loop's rng to restore the shuffle stream; callers
    # that shuffle elsewhere (loop.fit's batch_iterator, needs_order=False)
    # would resume with an unrestored stream — refuse rather than drift
    assert needs_order or resume_path is None, (
        "resume requires the loop-owned shuffle stream (needs_order=True); "
        "a needs_order=False caller shuffles in its own generator which "
        "replay cannot restore"
    )
    rng = np.random.default_rng(cfg.seed)
    early = EarlyStopping(patience=cfg.early_stop_patience)
    plateau = PlateauScheduler(cfg.plateau_patience, cfg.plateau_factor)
    # STRICT reference gate (epoch > 10), capped for short smoke runs
    min_sel = min(cfg.min_select_epoch, cfg.num_epochs - 2)

    best_val_acc, best_epoch = 0.0, 0
    best_state = state
    # the in-memory best (initially the pre-training state) has not been
    # persisted yet; once written, unchanged bests are NOT re-serialized
    # every epoch (a full TrainState Orbax write per epoch, doubling
    # checkpoint I/O — midfold.save(best=None) keeps the prior best_dir)
    best_dirty = True
    final = {"acc": 0.0, "uar": 0.0, "conf": np.zeros((0, 0))}
    history = []

    mid = None
    if resume_path:
        from sept_tpu.train.midfold import MidFoldCheckpoint

        mid = MidFoldCheckpoint(resume_path)
    start_epoch = 0
    if mid is not None and mid.exists():
        state, best_loaded, loop = mid.restore(like=state)
        state = replicate(state)
        if best_loaded is not None:
            best_loaded = replicate(best_loaded)
        start_epoch, best_val_acc, best_epoch, final, history = _loop_restore(
            loop, early, plateau
        )
        if best_loaded is not None:
            best_state = best_loaded
            best_dirty = False  # the on-disk best is already current
        for _ in range(start_epoch):  # replay the shuffle stream
            rng.permutation(n_real if n_real is not None else m_total)
        if verbose:
            print(f"mid-fold resume: continuing at epoch {start_epoch}")

    def next_order():
        # loop.fit shuffles inside batch_iterator and never consumes the
        # order — skip the permutation AND the corpus-sized H2D transfer
        if not needs_order:
            return None
        # shuffle REAL rows only; pad rows stay in the final batch like the
        # host path (batch_iterator pads only the last batch) — scattering
        # zero-weight pads into random batches would feed them into
        # train-mode BatchNorm statistics mid-epoch
        if n_real is None or n_real == m_total:
            return jnp.asarray(rng.permutation(m_total))
        return jnp.asarray(np.concatenate(
            [rng.permutation(n_real), np.arange(n_real, m_total)]))

    for epoch in range(start_epoch, cfg.num_epochs):
        order = next_order()
        state, train_m = train_epoch(state, epoch, order)
        val_m = val_epoch(state)
        test_m = test_epoch(state)
        entry = {"train": train_m, "validate": val_m, "test": test_m}
        if epoch_callback is not None:
            # per-epoch observables beyond the step metrics (e.g. cloak
            # sigma statistics — the reference prints these every epoch,
            # training_cloak.py:429-438); merged into history so mid-fold
            # snapshots carry them and resume keeps the trajectory whole
            entry.update(epoch_callback(state))
        history.append(entry)

        if cfg.optimizer == "adam":
            state = dataclasses.replace(
                state, opt_state=set_lr_scale(state.opt_state,
                                              plateau.step(val_m["loss"]))
            )
        # STRICT >: ties keep the FIRST best epoch, like the reference
        if val_m["acc"] > best_val_acc and epoch > min_sel:
            best_val_acc, best_epoch, best_state, final = (
                val_m["acc"], epoch, state, test_m)
            best_dirty = True
        if verbose:
            print(
                f"epoch {epoch}: train loss {train_m['loss']:.4f} "
                f"acc {train_m['acc']:.3f}"
                f" | val acc {val_m['acc']:.3f} | test acc {test_m['acc']:.3f}"
                f" uar {test_m['uar']:.3f}"
            )
        if epoch > min_sel:  # patience accrues only once selection opens
            early(val_m["loss"])
        should_stop = early.should_stop and (
            cfg.optimizer != "sgd" or cfg.early_stop_with_sgd)
        if mid is not None and not should_stop:
            mid.save(state, best_state if best_dirty else None, _loop_snapshot(
                epoch, best_val_acc, best_epoch, early, plateau, final, history
            ))
            best_dirty = False
        if should_stop:
            if verbose:
                print("early stopping")
            break

    if mid is not None:
        mid.delete()  # fold complete: the final artifact supersedes it
    return FitResult(
        best_state=best_state,
        best_epoch=best_epoch,
        best_val_acc=best_val_acc,
        final_test_acc=final["acc"],
        final_test_uar=final["uar"],
        final_confusion=final["conf"],
        history=history,
    )


def fit_device(
    state,
    model,
    tx,
    train_split: SplitArrays,
    val_split: SplitArrays,
    test_split: SplitArrays,
    cfg: ExperimentConfig,
    logits_fn,
    spk_weights: Optional[dict] = None,
    verbose: bool = True,
    mesh=None,
    resume_path: Optional[str] = None,
) -> FitResult:
    """loop.fit with scanned device epochs (baseline/adversary workloads).

    ``mesh``: run each scanned epoch data-parallel over the mesh (replicated
    state + splits, sharded batches, psum gradients over ICI —
    sept_tpu.parallel.epoch_dp).  The model should use sync-BN
    (``bn_axis_name='data'``) for exact single-device equivalence.

    ``resume_path``: mid-fold checkpoint directory (train.midfold): the full
    training state + loop bookkeeping persist after every epoch, and an
    interrupted fold resumes from the next epoch (identical shuffle stream);
    deleted automatically when the fold completes.
    """
    label_key = "labels_gen" if cfg.pred == "gender" else "labels_emo"
    train_ds = DeviceSplit(train_split, label_key, cfg.batch_size,
                           _spk_weight_vec(train_split, spk_weights), mesh)
    val_ds = DeviceSplit(val_split, label_key, cfg.batch_size,
                         _spk_weight_vec(val_split, spk_weights), mesh=mesh)

    pooling = pooling_for(cfg.model_type)
    if mesh is not None:
        from sept_tpu.parallel.epoch_dp import make_epoch_runner_dp, put_replicated

        run_epoch = make_epoch_runner_dp(model, tx, mesh,
                                         use_global=cfg.global_feature,
                                         pooling=pooling)
        state = put_replicated(state, mesh)
    else:
        run_epoch = make_epoch_runner(model, tx, use_global=cfg.global_feature,
                                      pooling=pooling)
    def _val_logits(p, bs, x, g):
        out = model.apply(
            {"params": p, "batch_stats": bs}, x[..., None], global_feature=g,
            pooling=pooling,
        )
        # multitask: validation loss/metrics track the emotion head (loop.py)
        return out[0] if isinstance(out, tuple) else out

    val_pass = make_val_pass(_val_logits, use_global=cfg.global_feature)

    def train_epoch(st, epoch, order):
        gkw = {"globals_": train_ds.globals} if cfg.global_feature else {}
        if cfg.pred == "multitask":
            gkw["labels_gen"] = train_ds.labels_gen
        st, losses, correct, counts = run_epoch(
            st, train_ds.windows, train_ds.labels, train_ds.weights, order,
            n_batches=train_ds.n_batches, batch_size=train_ds.batch_size,
            **gkw,
        )
        acc = float(jnp.sum(correct) / jnp.maximum(jnp.sum(counts), 1e-8))
        return st, {"loss": float(jnp.mean(losses)), "acc": acc}

    def val_epoch(st):
        vkw = {"globals_": val_ds.globals} if cfg.global_feature else {}
        val_loss, val_preds = val_pass(
            st.params, st.batch_stats, val_ds.windows, val_ds.labels,
            val_ds.weights, n_batches=val_ds.n_batches,
            batch_size=val_ds.batch_size, **vkw,
        )
        valid = np.asarray(val_ds.weights) > 0
        val_acc, val_uar = _masked_uar(
            np.asarray(val_ds.labels), np.asarray(val_preds), valid
        )
        return {"loss": float(val_loss), "acc": val_acc, "uar": val_uar}

    def replicate(st):
        if mesh is not None:
            from sept_tpu.parallel.epoch_dp import put_replicated

            return put_replicated(st, mesh)
        return st

    return _run_epoch_loop(
        state, cfg,
        train_epoch=train_epoch,
        val_epoch=val_epoch,
        test_epoch=lambda st: run_test(logits_fn, st, test_split, cfg),
        m_total=train_ds.n_batches * train_ds.batch_size,
        n_real=train_ds.n_real,
        resume_path=resume_path, replicate=replicate, verbose=verbose,
    )


def fit_device_cloak(
    state,
    model,
    tx,
    train_split: SplitArrays,
    val_split: SplitArrays,
    test_split: SplitArrays,
    cfg: ExperimentConfig,
    eval_logits_fn,
    mask=None,
    spk_weights: Optional[dict] = None,
    verbose: bool = True,
    mesh=None,
    resume_path: Optional[str] = None,
    epoch_callback=None,
) -> FitResult:
    """Device-resident cloak / cloak+GRL training with scanned epochs.

    ``eval_logits_fn(params, batch_stats, spec, global) -> emotion logits``
    should run the cloak forward with a fixed noise key (as the CLIs build).
    ``mesh``: data-parallel scanned epochs (see fit_device).
    ``resume_path``: mid-fold epoch-level checkpoint/resume (see fit_device).
    """
    train_ds = DeviceSplit(train_split, "labels_emo", cfg.batch_size,
                           _spk_weight_vec(train_split, spk_weights), mesh)
    val_ds = DeviceSplit(val_split, "labels_emo", cfg.batch_size,
                         _spk_weight_vec(val_split, spk_weights), mesh=mesh)
    mask_j = None if mask is None else jnp.asarray(mask)

    runner_opts = dict(
        scale_lambda=cfg.scale_lambda, gender_lambda=cfg.gender_lambda,
        grl=cfg.grl, apply_scale_reg=cfg.suppression_ratio == 0,
        pooling=pooling_for(cfg.model_type),
        antithetic=cfg.antithetic_noise,
        saliency_align=cfg.saliency_align,
        use_global=cfg.global_feature,
    )
    if mesh is not None:
        from sept_tpu.parallel.epoch_dp import (
            make_cloak_epoch_runner_dp,
            put_replicated,
        )

        run_epoch = make_cloak_epoch_runner_dp(model, tx, mesh, **runner_opts)
        state = put_replicated(state, mesh)
        if mask_j is not None:
            mask_j = put_replicated(mask_j, mesh)
    else:
        run_epoch = make_cloak_epoch_runner(model, tx, **runner_opts)

    val_pass = make_val_pass(
        lambda p, bs, x, g: eval_logits_fn(p, bs, x[..., None], g),
        use_global=cfg.global_feature,
    )

    def train_epoch(st, epoch, order):
        gkw = {"globals_": train_ds.globals} if cfg.global_feature else {}
        st, losses, correct, counts = run_epoch(
            st, train_ds.windows, train_ds.labels_emo, train_ds.labels_gen,
            train_ds.weights, order, mask_j,
            n_batches=train_ds.n_batches, batch_size=train_ds.batch_size,
            **gkw,
        )
        acc = float(jnp.sum(correct) / jnp.maximum(jnp.sum(counts), 1e-8))
        return st, {"loss": float(jnp.mean(losses)), "acc": acc}

    def val_epoch(st):
        vkw = {"globals_": val_ds.globals} if cfg.global_feature else {}
        val_loss, val_preds = val_pass(
            st.params, st.batch_stats, val_ds.windows,
            val_ds.labels_emo, val_ds.weights, n_batches=val_ds.n_batches,
            batch_size=val_ds.batch_size, **vkw,
        )
        valid = np.asarray(val_ds.weights) > 0
        val_acc, val_uar = _masked_uar(
            np.asarray(val_ds.labels_emo), np.asarray(val_preds), valid
        )
        return {"loss": float(val_loss), "acc": val_acc, "uar": val_uar}

    def replicate(st):
        return put_replicated(st, mesh) if mesh is not None else st

    return _run_epoch_loop(
        state, cfg,
        train_epoch=train_epoch,
        val_epoch=val_epoch,
        test_epoch=lambda st: run_test(eval_logits_fn, st, test_split, cfg),
        m_total=train_ds.n_batches * train_ds.batch_size,
        n_real=train_ds.n_real,
        resume_path=resume_path, replicate=replicate, verbose=verbose,
        epoch_callback=epoch_callback,
    )

"""Jitted train / eval steps for every workload.

Each reference training loop's per-batch body (H2D copy, forward, Python-loop
weighted CE, backward, step — e.g.
/root/reference/training/training_adversary_baselines.py:156-187) becomes ONE
jitted ``train_step(state, batch, ...) -> (state, metrics)`` with donated
state buffers.  Losses:

- baseline/adversary: per-sample weighted CE averaged over real samples
  (padding rows carry weight 0; combine-mode speaker weights ride the same
  vector — training_cloak.py:136-143);
- cloak: weighted CE - scale_lambda * log(mean(scales)) (the sigma-maximizing
  regularizer, applied only when suppression_ratio == 0,
  training_cloak.py:145-147);
- cloak+GRL: weighted emotion CE + gender_lambda * gender CE (reversed into
  the noise by the GRL) - scale_lambda * log(mean(scales))
  (training_cloak_with_grl.py:141-162) — the whole minimax game is a single
  fused backward.

All steps are sharding-agnostic: under a Mesh with batch-sharded inputs and
replicated params, XLA inserts the gradient psums over ICI (sept_tpu.parallel).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import flax
import jax
import jax.numpy as jnp
import optax

__all__ = [
    "TrainState",
    "init_state",
    "weighted_ce",
    "make_baseline_step",
    "make_epoch_runner",
    "make_eval_logits_fn",
    "make_cloak_step",
    "make_cloak_grl_step",
    "cloak_scales",
    "saliency_alignment_loss",
]


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    step: jax.Array


def init_state(
    model, tx, rng, sample_batch, use_global: bool = False, **apply_kwargs
) -> TrainState:
    """Jitted model init + optimizer init.

    ``use_global`` must match the step's setting — the dense1 input width
    depends on whether the 88-dim global feature is concatenated
    (baseline_models.py:208).
    """
    p_rng, d_rng, n_rng, run_rng = jax.random.split(rng, 4)

    @jax.jit
    def _init(x, g):
        return model.init(
            {"params": p_rng, "dropout": d_rng, "noise": n_rng},
            x,
            global_feature=g,
            train=True,
            **apply_kwargs,
        )

    variables = _init(
        sample_batch["spec"], sample_batch.get("global") if use_global else None
    )
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", flax.core.freeze({}).unfreeze()),
        opt_state=tx.init(params),
        rng=run_rng,
        step=jnp.zeros((), jnp.int32),
    )


def weighted_nll_sum(
    logits: jax.Array, labels: jax.Array, weights: jax.Array
) -> jax.Array:
    """Weighted negative-log-likelihood SUM (no normalization).

    The data-parallel building block: shards psum their local sums and
    divide by the GLOBAL weight afterwards (parallel/epoch_dp.py,
    parallel/shard_map_dp.py); the single-device ``weighted_ce`` is this
    over the local total weight."""
    logp = jax.nn.log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.sum(nll * weights)


def count_real(weights: jax.Array) -> jax.Array:
    """Number of REAL (non-padding) rows: weights > 0.

    Speaker weights scale loss numerators only; padding rows carry weight
    exactly 0."""
    return jnp.maximum(jnp.sum(weights > 0).astype(jnp.float32), 1.0)


def weighted_ce(logits: jax.Array, labels: jax.Array, weights: jax.Array) -> jax.Array:
    """Per-sample weighted cross entropy, averaged over the REAL row count.

    The reference's combine-mode loss is ``sum_i(ce_i * w_i) / len(preds)``
    (training_adversary_baselines.py:175-179, training_cloak.py:137-143) —
    speaker weights scale the numerator only; the denominator is the batch
    size.  Dividing by ``sum(weights)`` instead (the earlier behavior)
    silently shrank combine-mode gradients by the batch's mean weight.
    For unweighted runs (weights ∈ {0,1}) the two are identical."""
    return weighted_nll_sum(logits, labels, weights) / count_real(weights)


def _metrics(logits, labels, weights, loss):
    """Train-pass metrics; accuracy is UNWEIGHTED over real rows (the
    reference appends every prediction and scores plain accuracy_score,
    training_adversary_baselines.py:218)."""
    preds = jnp.argmax(logits, axis=-1)
    valid = (weights > 0).astype(jnp.float32)
    correct = jnp.sum((preds == labels) * valid)
    return {
        "loss": loss,
        "correct": correct,
        "count": jnp.sum(valid),
        "preds": preds,
    }


def make_baseline_step(
    model, tx, use_global: bool = False, pooling: Optional[str] = "mean"
) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    """Jitted supervised step for baseline / adversary / multitask training.

    pred='multitask' sums emotion + gender CE over the two heads
    (baseline_models.py:251-254); metrics track the emotion head.
    ``pooling`` must match evaluation's (None = flatten for the 'deep'
    model types, training_cloak.py:132).
    """

    multitask = model.pred == "multitask"
    label_key = "labels_gen" if model.pred == "gender" else "labels_emo"

    @jax.jit
    def step(state: TrainState, batch: dict):
        rng, d_rng = jax.random.split(state.rng)
        g = batch["global"] if use_global else None

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["spec"],
                global_feature=g,
                train=True,
                pooling=pooling,
                rngs={"dropout": d_rng},
                mutable=["batch_stats"],
            )
            if multitask:
                emo_out, gen_out = out
                loss = weighted_ce(
                    emo_out, batch["labels_emo"], batch["weight"]
                ) + weighted_ce(gen_out, batch["labels_gen"], batch["weight"])
                out = emo_out
            else:
                loss = weighted_ce(out, batch[label_key], batch["weight"])
            return loss, (out, mut)

        (loss, (logits, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            batch_stats=mut["batch_stats"],
            opt_state=opt_state,
            rng=rng,
            step=state.step + 1,
        )
        return new_state, _metrics(logits, batch[label_key], batch["weight"], loss)

    return step


def make_epoch_runner(model, tx, use_global: bool = False,
                      pooling: Optional[str] = "mean"):
    """Whole-epoch trainer as ONE device program (lax.scan over batches).

    For device-resident datasets (sept_tpu.data.device_pipeline): a Python
    per-step loop pays host dispatch latency per batch — expensive over a
    tunneled chip — while a scan runs every step back-to-back on device and
    returns only per-batch scalar metrics.

    Returns ``run(state, windows (M, T, D), labels (M,), weights (M,),
    order (M,), n_batches, batch_size[, globals_][, labels_gen]) ->
    (state, losses, correct, counts)``.  With ``use_global``, pass
    ``globals_`` (M, 88) and the per-window vector is concatenated to the
    pooled state exactly as in the per-step path
    (baseline_models.py:208,244-245).  For pred='multitask' models pass
    ``labels_gen`` too: the loss sums emotion + gender CE and the metrics
    track the emotion head, matching make_baseline_step.
    """

    multitask = model.pred == "multitask"

    @functools.partial(jax.jit, static_argnames=("n_batches", "batch_size"))
    def run(state, windows, labels, weights, order, *, n_batches, batch_size,
            globals_=None, labels_gen=None):
        def body(carry, i):
            st = carry
            idx = jax.lax.dynamic_slice_in_dim(order, i * batch_size, batch_size)
            spec = windows[idx][..., None]
            g = globals_[idx] if use_global else None
            lab = labels[idx]
            lg = labels_gen[idx] if multitask else None
            w = weights[idx]
            rng, d_rng = jax.random.split(st.rng)

            def loss_fn(params):
                out, mut = model.apply(
                    {"params": params, "batch_stats": st.batch_stats},
                    spec,
                    global_feature=g,
                    train=True,
                    pooling=pooling,
                    rngs={"dropout": d_rng},
                    mutable=["batch_stats"],
                )
                if multitask:
                    emo_out, gen_out = out
                    loss = weighted_ce(emo_out, lab, w) + weighted_ce(
                        gen_out, lg, w
                    )
                    return loss, (emo_out, mut)
                return weighted_ce(out, lab, w), (out, mut)

            (loss, (logits, mut)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(st.params)
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            new_st = TrainState(
                params=params,
                batch_stats=mut["batch_stats"],
                opt_state=opt_state,
                rng=rng,
                step=st.step + 1,
            )
            valid = (w > 0).astype(jnp.float32)
            correct = jnp.sum((jnp.argmax(logits, -1) == lab) * valid)
            return new_st, (loss, correct, jnp.sum(valid))

        state, (losses, correct, counts) = jax.lax.scan(
            body, state, jnp.arange(n_batches)
        )
        return state, losses, correct, counts

    return run


def make_cloak_epoch_runner(
    model,
    tx,
    scale_lambda: float = 0.0,
    gender_lambda: float = 0.1,
    grl: bool = False,
    apply_scale_reg: bool = True,
    pooling: Optional[str] = "mean",
    antithetic: bool = False,
    saliency_align: float = 0.0,
    use_global: bool = False,
):
    """Whole-epoch cloak / cloak+GRL trainer as one scanned device program.

    Like make_epoch_runner but for the cloak workloads: the scan body is the
    cloak (or GRL minimax) loss with per-batch noise/dropout keys split from
    the carried rng.  ``run(state, windows (M,T,D), labels_emo, labels_gen,
    weights, order, mask, n_batches, batch_size[, globals_])``; pass
    ``mask=None`` for unsuppressed training.  ``antithetic``: +eps/-eps loss
    pair per step (see make_cloak_step).  With ``use_global`` pass
    ``globals_`` (M, 88): the frozen backbone concatenates the per-window
    vector after pooling exactly as the per-step path does
    (baseline_models.py:208,244-245 via cloak_models.py:110-118).
    """

    @functools.partial(jax.jit, static_argnames=("n_batches", "batch_size"))
    def run(state, windows, labels_emo, labels_gen, weights, order, mask,
            *, n_batches, batch_size, globals_=None):
        def body(st, i):
            idx = jax.lax.dynamic_slice_in_dim(order, i * batch_size, batch_size)
            spec = windows[idx][..., None]
            g = globals_[idx] if use_global else None
            le, lg, w = labels_emo[idx], labels_gen[idx], weights[idx]
            rng, n_rng, d_rng = jax.random.split(st.rng, 3)

            def loss_fn(params):
                if grl:
                    def branch(sign):
                        return model.apply(
                            {"params": params, "batch_stats": st.batch_stats},
                            spec, mask=mask, train=True, pooling=pooling,
                            noise_sign=sign, global_feature=g,
                            rngs={"noise": n_rng, "dropout": d_rng},
                            mutable=["batch_stats"],
                        )

                    (emo_l, gen_l, _), mut = branch(1.0)
                    loss = weighted_ce(emo_l, le, w) + gender_lambda * weighted_ce(
                        gen_l, lg, w
                    )
                    if antithetic:
                        (emo_m, gen_m, _), _ = branch(-1.0)
                        loss = 0.5 * (
                            loss
                            + weighted_ce(emo_m, le, w)
                            + gender_lambda * weighted_ce(gen_m, lg, w)
                        )
                    logits, bs = emo_l, mut["batch_stats"]
                else:
                    def branch(sign):
                        out, _ = model.apply(
                            {"params": params, "batch_stats": st.batch_stats},
                            spec, mask=mask, train=True, pooling=pooling,
                            noise_sign=sign, global_feature=g,
                            rngs={"noise": n_rng},
                        )
                        return out

                    logits = branch(1.0)
                    loss = weighted_ce(logits, le, w)
                    if antithetic:
                        loss = 0.5 * (loss + weighted_ce(branch(-1.0), le, w))
                    bs = st.batch_stats
                if apply_scale_reg and scale_lambda:
                    loss = loss - scale_lambda * jnp.log(
                        jnp.mean(cloak_scales(model, params))
                    )
                if grl and saliency_align:
                    loss = loss + saliency_align * saliency_alignment_loss(
                        model, params, st.batch_stats, spec, le, lg, w,
                        pooling, g,
                    )
                return loss, (logits, bs)

            (loss, (logits, bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(st.params)
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            new_st = TrainState(
                params=params, batch_stats=bs, opt_state=opt_state,
                rng=rng, step=st.step + 1,
            )
            valid = (w > 0).astype(jnp.float32)
            correct = jnp.sum((jnp.argmax(logits, -1) == le) * valid)
            return new_st, (loss, correct, jnp.sum(valid))

        state, (losses, correct, counts) = jax.lax.scan(
            body, state, jnp.arange(n_batches)
        )
        return state, losses, correct, counts

    return run


def make_eval_logits_fn(model, use_global: bool = False, **apply_kwargs):
    """Jitted eval forward: (params, batch_stats, spec, global) -> logits."""

    @jax.jit
    def fn(params, batch_stats, spec, global_feature=None):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            spec,
            global_feature=global_feature if use_global else None,
            train=False,
            **apply_kwargs,
        )

    return fn


def saliency_alignment_loss(
    model, params, batch_stats, spec, labels_emo, labels_gen, weights,
    pooling: Optional[str] = "mean", global_feature=None,
) -> jax.Array:
    """First-order scale-shaping term for the cloak+GRL game.

    The reference's only channel for differentiating the per-cell noise
    scales is the curvature of the CE under the eps draw — an O(eps^2)
    signal that, at this problem's size, leaves the sigma map uniform and
    the suppression masks equivalent to random cell deletion.  This term is
    the framework's explicit, documented alternative: compute each frozen
    branch's input saliency |dCE/dx| per (frame, mel) cell, and push the
    noise scale UP where the gender adversary is sensitive and DOWN where
    the emotion model is:

        align = mean( scales * (sal_emo - sal_gen) )        (both unit-mean)

    Minimizing it allocates noise (and therefore the percentile suppression
    masks, training_cloak.py:364-371 / adversary_cloak_evaluation.py:262-267)
    onto privacy-bearing cells first.  Saliencies are stop-gradient
    constants: the term is linear in scales, so the sigma gradient is
    first-order and exact.  Off by default (scale_lambda-only training is
    the reference behavior); enabled via ExperimentConfig.saliency_align.
    """
    eps = 1e-8
    x = jax.lax.stop_gradient(spec)

    gf = (None if global_feature is None
          else jax.lax.stop_gradient(global_feature))

    def branch_saliency(backbone, sub_params, sub_stats, labels):
        def ce(xin):
            logits = backbone.apply(
                {"params": sub_params, "batch_stats": sub_stats},
                xin, train=False, pooling=pooling, global_feature=gf,
            )
            return weighted_ce(logits, labels, weights)

        sal = jnp.abs(jax.grad(ce)(x)).mean(axis=0)[..., 0]  # (T, D)
        return sal / (jnp.mean(sal) + eps)

    p = jax.lax.stop_gradient(params)
    bs = jax.lax.stop_gradient(batch_stats)
    sal_emo = branch_saliency(
        model.emotion_backbone, p["emotion_backbone"],
        bs.get("emotion_backbone", {}), labels_emo,
    )
    sal_gen = branch_saliency(
        model.gender_backbone, p["gender_backbone"],
        bs.get("gender_backbone", {}), labels_gen,
    )
    scales = cloak_scales(model, params)  # differentiable path
    return jnp.mean(scales * (sal_emo - sal_gen))


def cloak_scales(model, params) -> jax.Array:
    """Current noise scales from a cloak model's params (tanh squash)."""
    rhos = params["noise"]["rhos"]
    min_scale = getattr(model, "min_scale", 0.01)
    return (1.0 + jnp.tanh(rhos)) / 2.0 * (
        model.max_scale - min_scale
    ) + min_scale


def make_cloak_step(
    model,
    tx,
    scale_lambda: float = 0.0,
    use_global: bool = False,
    apply_scale_reg: bool = True,
    pooling: Optional[str] = "mean",
    antithetic: bool = False,
):
    """Jitted cloak step: only noise params move (tx is partition-frozen).

    ``antithetic``: evaluate the loss at +eps AND -eps from the same draw
    and average.  The first-order noise of the sigma gradient (E[g*eps] = 0)
    cancels exactly between the pair, exposing the curvature signal that
    differentiates per-cell scales — the variance reduction that makes the
    suppression masks meaningful instead of percentile cuts over jitter.
    """

    label_key = "labels_emo" if model.backbone.pred == "emotion" else "labels_gen"

    @jax.jit
    def step(state: TrainState, batch: dict, mask: Optional[jax.Array] = None):
        rng, n_rng = jax.random.split(state.rng)
        g = batch["global"] if use_global else None

        def loss_fn(params):
            def branch(sign):
                logits, _noisy = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["spec"],
                    global_feature=g,
                    mask=mask,
                    train=True,
                    pooling=pooling,
                    noise_sign=sign,
                    rngs={"noise": n_rng},
                )
                return logits

            logits = branch(1.0)
            loss = weighted_ce(logits, batch[label_key], batch["weight"])
            if antithetic:
                loss = 0.5 * (
                    loss
                    + weighted_ce(branch(-1.0), batch[label_key], batch["weight"])
                )
            if apply_scale_reg and scale_lambda:
                scale_loss = jnp.log(jnp.mean(cloak_scales(model, params)))
                loss = loss - scale_lambda * scale_loss
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = dataclasses.replace(
            state, params=params, opt_state=opt_state, rng=rng, step=state.step + 1
        )
        return new_state, _metrics(logits, batch[label_key], batch["weight"], loss)

    return step


def make_cloak_grl_step(
    model,
    tx,
    scale_lambda: float = 0.0,
    gender_lambda: float = 0.1,
    use_global: bool = False,
    apply_scale_reg: bool = True,
    pooling: Optional[str] = "mean",
    antithetic: bool = False,
    saliency_align: float = 0.0,
):
    """Jitted cloak+GRL minimax step (noise + gender adversary update).

    ``antithetic``: +eps/-eps loss pair (see make_cloak_step) — metrics and
    BN stats come from the +eps pass.  ``saliency_align``: weight of the
    first-order scale-shaping term (see saliency_alignment_loss).
    """

    @jax.jit
    def step(state: TrainState, batch: dict, mask: Optional[jax.Array] = None):
        rng, n_rng, d_rng = jax.random.split(state.rng, 3)
        g = batch["global"] if use_global else None

        def loss_fn(params):
            def branch(sign):
                return model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["spec"],
                    global_feature=g,
                    mask=mask,
                    train=True,
                    pooling=pooling,
                    noise_sign=sign,
                    rngs={"noise": n_rng, "dropout": d_rng},
                    mutable=["batch_stats"],
                )

            def pair_loss(out):
                (emo_logits, gen_logits, _noisy) = out
                emo = weighted_ce(emo_logits, batch["labels_emo"], batch["weight"])
                gen = weighted_ce(gen_logits, batch["labels_gen"], batch["weight"])
                return emo + gender_lambda * gen

            (emo_logits, gen_logits, _noisy), mut = branch(1.0)
            loss = pair_loss((emo_logits, gen_logits, _noisy))
            if antithetic:
                out_m, _ = branch(-1.0)
                loss = 0.5 * (loss + pair_loss(out_m))
            if apply_scale_reg and scale_lambda:
                loss = loss - scale_lambda * jnp.log(
                    jnp.mean(cloak_scales(model, params))
                )
            if saliency_align:
                loss = loss + saliency_align * saliency_alignment_loss(
                    model, params, state.batch_stats, batch["spec"],
                    batch["labels_emo"], batch["labels_gen"],
                    batch["weight"], pooling, g,
                )
            return loss, (emo_logits, gen_logits, mut)

        (loss, (emo_logits, gen_logits, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            batch_stats=mut["batch_stats"],
            opt_state=opt_state,
            rng=rng,
            step=state.step + 1,
        )
        m = _metrics(emo_logits, batch["labels_emo"], batch["weight"], loss)
        # validity mask, NOT raw weights: combine-mode speaker weights are
        # >= 1 and would inflate the count past the batch size (_metrics
        # masks the same way)
        m["gender_correct"] = jnp.sum(
            (jnp.argmax(gen_logits, -1) == batch["labels_gen"])
            * (batch["weight"] > 0)
        )
        return new_state, m

    return step

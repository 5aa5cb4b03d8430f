"""Data-parallel scanned epoch runners (shard_map over the whole-epoch scan).

The device-resident training path (sept_tpu.train.device_loop) runs each
epoch as ONE scanned program; this module is its multi-chip form.  The
dataset splits stay replicated in every chip's HBM (they are tens of MB at
this framework's corpus scale — cheap next to the model activations), the
shuffled batch ORDER is sharded along the per-batch axis, and each scan step
is a local sub-batch forward/backward whose gradients psum over the mesh's
ICI.  Parity with the single-device runner (sept_tpu.train.steps.
make_epoch_runner / make_cloak_epoch_runner) up to float association when:

- the model uses sync-BN (``bn_axis_name`` = the mesh axis), so train-mode
  BatchNorm normalizes over the GLOBAL batch;
- dropout is off (per-shard dropout masks are valid DP training but not the
  single-device masks);
- the cloak noise key is shared (the (win,feats) noise draw broadcasts over
  batch rows, so identical keys = identical noise on every shard);
- ``saliency_align`` is 0, OR every shard's weight sum is equal: the
  saliency term normalizes and unit-means per SHARD, and the psum averages
  those locally-normalized saliencies — with unequal shard weight sums
  (speaker weights, padded last batch) that differs from the single-device
  globally-normalized term by more than float association.  The alignment
  objective ("shape scales like the local saliency map") is preserved; the
  exact gradient is not.

Loss formulation: each shard computes ``local_weighted_sum /
psum(real_row_count) [+ reg / n_devices]`` (speaker weights scale
numerators only — reference combine loss divides by batch size,
training_adversary_baselines.py:175-179) so that the RAW psum of local
gradients equals the gradient of the global weighted mean plus exactly one
copy of the
regularizer — no double counting (the subtlety of mixing per-sample losses
with parameter-only regularizers under DP).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sept_tpu.train.steps import (
    TrainState,
    cloak_scales,
    saliency_alignment_loss,
    weighted_nll_sum as _weighted_nll,
)

__all__ = ["make_epoch_runner_dp", "make_cloak_epoch_runner_dp", "put_replicated"]


def put_replicated(tree, mesh: Mesh):
    """Place every array of a pytree replicated over the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)




def _order_spec(mesh: Mesh, axis: str):
    return (
        TrainState(params=P(), batch_stats=P(), opt_state=P(), rng=P(), step=P()),
        P(), P(), P(),          # windows / labels / weights: replicated
        P(None, axis),          # order: (n_batches, batch) sharded per batch
    )


def make_epoch_runner_dp(model, tx, mesh: Mesh, axis: str = "data",
                         use_global: bool = False,
                         pooling: Optional[str] = "mean"):
    """DP form of sept_tpu.train.steps.make_epoch_runner.

    ``run(state, windows (M,T,D), labels (M,), weights (M,), order (M,),
    n_batches, batch_size[, globals_ (M,88)]) -> (state, losses, correct,
    counts)`` — same call signature, state and metrics replicated on
    return.  With ``use_global`` the replicated per-window global-feature
    rows are gathered alongside each shard's batch rows.
    """
    n_dev = mesh.devices.size
    multitask = model.pred == "multitask"

    def local_epoch(state, windows, labels, weights, order, globals_,
                    labels_gen):
        def body(st, idx):  # idx: (batch/n_dev,) this shard's rows
            spec = windows[idx][..., None]
            g = globals_[idx] if use_global else None
            lab, w = labels[idx], weights[idx]
            lg = labels_gen[idx]
            rng, d_rng = jax.random.split(st.rng)
            # decorrelate dropout across shards: with the replicated state's
            # shared key, row i of EVERY shard would draw the identical mask
            # (fold_in is a no-op for the dropout-off equivalence tests)
            d_rng = jax.random.fold_in(d_rng, jax.lax.axis_index(axis))
            # global REAL-row count: speaker weights scale numerators only
            denom = jnp.maximum(
                jax.lax.psum(jnp.sum((w > 0).astype(jnp.float32)), axis), 1.0)

            def loss_fn(params):
                out, mut = model.apply(
                    {"params": params, "batch_stats": st.batch_stats},
                    spec, global_feature=g, train=True,
                    pooling=pooling,
                    rngs={"dropout": d_rng},
                    mutable=["batch_stats"],
                )
                if multitask:
                    emo_out, gen_out = out
                    local = (_weighted_nll(emo_out, lab, w)
                             + _weighted_nll(gen_out, lg, w))
                    return local / denom, (emo_out, mut)
                return _weighted_nll(out, lab, w) / denom, (out, mut)

            (local_loss, (logits, mut)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(st.params)
            loss = jax.lax.psum(local_loss, axis)
            grads = jax.tree.map(lambda g: jax.lax.psum(g, axis), grads)
            # sync-BN models return identical stats on every shard; pmean is
            # then a no-op, and the plain-BN approximation otherwise
            batch_stats = jax.tree.map(
                lambda s: jax.lax.pmean(s, axis), mut["batch_stats"]
            )
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            new_st = TrainState(
                params=params, batch_stats=batch_stats, opt_state=opt_state,
                rng=rng, step=st.step + 1,
            )
            valid = (w > 0).astype(jnp.float32)
            correct = jax.lax.psum(
                jnp.sum((jnp.argmax(logits, -1) == lab) * valid), axis
            )
            return new_st, (loss, correct, jax.lax.psum(jnp.sum(valid), axis))

        state, (losses, correct, counts) = jax.lax.scan(body, state, order)
        return state, losses, correct, counts

    state_spec = _order_spec(mesh, axis)[0]
    mapped = jax.jit(jax.shard_map(
        local_epoch,
        mesh=mesh,
        in_specs=_order_spec(mesh, axis) + (P(), P()),  # globals/labels_gen: replicated
        out_specs=(state_spec, P(), P(), P()),
        check_vma=False,
    ))

    def run(state, windows, labels, weights, order, *, n_batches, batch_size,
            globals_=None, labels_gen=None):
        if batch_size % n_dev:
            raise ValueError(
                f"batch_size {batch_size} not divisible by {n_dev} devices"
            )
        order2 = jax.device_put(
            jnp.reshape(order[: n_batches * batch_size], (n_batches, batch_size)),
            NamedSharding(mesh, P(None, axis)),
        )
        if globals_ is None:  # unused placeholder keeping the specs fixed
            globals_ = jnp.zeros((windows.shape[0], 1), windows.dtype)
        if labels_gen is None:
            if getattr(model, "pred", None) == "multitask":
                # a zero placeholder would silently train the gender head
                # toward class 0 for every row; the single-device runner
                # crashes loudly in the same situation
                raise ValueError(
                    "multitask epoch runner needs labels_gen"
                )
            labels_gen = jnp.zeros((windows.shape[0],), jnp.int32)
        return mapped(state, windows, labels, weights, order2, globals_,
                      labels_gen)

    return run


def make_cloak_epoch_runner_dp(
    model,
    tx,
    mesh: Mesh,
    scale_lambda: float = 0.0,
    gender_lambda: float = 0.1,
    grl: bool = False,
    apply_scale_reg: bool = True,
    pooling: Optional[str] = "mean",
    antithetic: bool = False,
    saliency_align: float = 0.0,
    use_global: bool = False,
    axis: str = "data",
):
    """DP form of make_cloak_epoch_runner (cloak / cloak+GRL workloads).

    Same call signature as the single-device runner; ``mask=None`` is
    expressed as an all-ones mask (numerically identical in CloakNoise:
    ``x*1 + locs + scales*eps*1`` == the unmasked branch) so the shard_map
    signature stays fixed, and without ``use_global`` a scalar dummy rides
    the (fixed-arity) globals slot.
    """
    n_dev = mesh.devices.size

    def local_epoch(state, windows, labels_emo, labels_gen, weights, order,
                    mask, globals_):
        def body(st, idx):
            spec = windows[idx][..., None]
            g = globals_[idx] if use_global else None
            le, lg, w = labels_emo[idx], labels_gen[idx], weights[idx]
            rng, n_rng, d_rng = jax.random.split(st.rng, 3)
            # n_rng stays SHARED across shards (the (win,feats) noise draw
            # broadcasts over batch rows — identical keys = identical noise,
            # matching single-device); dropout masks are per-row and must
            # NOT repeat across shards
            d_rng = jax.random.fold_in(d_rng, jax.lax.axis_index(axis))
            # global REAL-row count: speaker weights scale numerators only
            denom = jnp.maximum(
                jax.lax.psum(jnp.sum((w > 0).astype(jnp.float32)), axis), 1.0)

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
                    loss = (
                        _weighted_nll(emo_l, le, w)
                        + gender_lambda * _weighted_nll(gen_l, lg, w)
                    ) / denom
                    if antithetic:
                        (emo_m, gen_m, _), _ = branch(-1.0)
                        loss = 0.5 * (
                            loss
                            + (
                                _weighted_nll(emo_m, le, w)
                                + gender_lambda * _weighted_nll(gen_m, lg, w)
                            ) / denom
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
                    loss = _weighted_nll(logits, le, w) / denom
                    if antithetic:
                        loss = 0.5 * (
                            loss + _weighted_nll(branch(-1.0), le, w) / denom
                        )
                    bs = st.batch_stats
                if apply_scale_reg and scale_lambda:
                    # parameter-only regularizer: contribute 1/n_dev per
                    # shard so the raw gradient psum carries exactly one copy
                    loss = loss - scale_lambda * jnp.log(
                        jnp.mean(cloak_scales(model, params))
                    ) / n_dev
                if grl and saliency_align:
                    # per-shard saliency over the local sub-batch; the psum
                    # averages the shards' alignment gradients (1/n_dev each)
                    loss = loss + saliency_align * saliency_alignment_loss(
                        model, params, st.batch_stats, spec, le, lg, w,
                        pooling, g,
                    ) / n_dev
                return loss, (logits, bs)

            (local_loss, (logits, bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(st.params)
            loss = jax.lax.psum(local_loss, axis)
            grads = jax.tree.map(lambda g: jax.lax.psum(g, axis), grads)
            bs = jax.tree.map(lambda s: jax.lax.pmean(s, axis), bs)
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            new_st = TrainState(
                params=params, batch_stats=bs, opt_state=opt_state,
                rng=rng, step=st.step + 1,
            )
            valid = (w > 0).astype(jnp.float32)
            correct = jax.lax.psum(
                jnp.sum((jnp.argmax(logits, -1) == le) * valid), axis
            )
            return new_st, (loss, correct, jax.lax.psum(jnp.sum(valid), axis))

        state, (losses, correct, counts) = jax.lax.scan(body, state, order)
        return state, losses, correct, counts

    state_spec, rep, _, _, order_sp = _order_spec(mesh, axis)
    mapped = jax.jit(jax.shard_map(
        local_epoch,
        mesh=mesh,
        in_specs=(state_spec, rep, rep, rep, rep, order_sp, rep, rep),
        out_specs=(state_spec, P(), P(), P()),
        check_vma=False,
    ))

    def run(state, windows, labels_emo, labels_gen, weights, order, mask,
            *, n_batches, batch_size, globals_=None):
        if batch_size % n_dev:
            raise ValueError(
                f"batch_size {batch_size} not divisible by {n_dev} devices"
            )
        if mask is None:
            mask = jnp.ones(windows.shape[1:3], jnp.float32)
        if globals_ is None:
            if use_global:
                # gather would silently CLIP every batch index into the
                # (1,1) dummy and train on all-zero global features
                raise ValueError(
                    "use_global=True but no globals_ passed to run()")
            globals_ = jnp.zeros((1, 1), jnp.float32)  # unused dummy slot
        order2 = jax.device_put(
            jnp.reshape(order[: n_batches * batch_size], (n_batches, batch_size)),
            NamedSharding(mesh, P(None, axis)),
        )
        return mapped(
            state, windows, labels_emo, labels_gen, weights, order2, mask,
            globals_,
        )

    return run

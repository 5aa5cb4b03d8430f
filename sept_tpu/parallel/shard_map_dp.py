"""Explicit-collective data parallelism via shard_map + psum.

The default DP path (sept_tpu.parallel.mesh) lets XLA infer the gradient
all-reduce from shardings.  This module is the explicit formulation: the
per-device step runs under ``jax.shard_map`` with batch shards, computes
local gradients, and all-reduces them with ``jax.lax.pmean`` over the mesh
axis — the collective rides ICI within a slice.  Useful when you want
manual control of what is reduced (e.g. loss-weight denominators) and as
the template for more elaborate collective schedules.

Weighted-loss subtlety handled here: the global weighted-CE mean is
``sum_i w_i l_i / sum_i w_i`` — NOT the mean of per-shard means — so the
numerator and denominator are psum'd separately before dividing.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from sept_tpu.train.steps import TrainState, weighted_nll_sum

__all__ = ["make_shard_map_dp_step"]


def make_shard_map_dp_step(
    model, tx, mesh: Mesh, axis: str = "data"
) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    """Baseline/adversary train step with explicit pmean gradient collectives.

    State is replicated; batch dict arrays are sharded on the leading axis.
    Matches make_baseline_step numerically with dropout off
    (tests/test_parallel.py); with dropout on, each shard draws independent
    per-row masks (valid DP training, not the single-device mask pattern).
    """

    label_key = "labels_gen" if model.pred == "gender" else "labels_emo"

    def local_step(state: TrainState, batch: dict):
        rng, d_rng = jax.random.split(state.rng)
        # fold the shard index into the dropout key: a shared key draws
        # masks at LOCAL (B/n, ...) shape, so it neither reproduces the
        # single-device (B, ...) masks nor gives independent masks — row i
        # of every shard would share one mask.  (The numerical-equivalence
        # tests run dropout-off, where this fold is a no-op.)
        d_rng = jax.random.fold_in(d_rng, jax.lax.axis_index(axis))
        labels = batch[label_key]
        w = batch["weight"]

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["spec"],
                train=True,
                rngs={"dropout": d_rng},
                mutable=["batch_stats"],
            )
            # local weighted SUM; the global mean divides after psum
            return weighted_nll_sum(out, labels, w), (out, mut)

        (loss_sum, (logits, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        # global REAL-row count (speaker weights scale numerators only;
        # padding rows carry weight exactly 0) — steps.count_real semantics
        n_real = jax.lax.psum(jnp.sum((w > 0).astype(jnp.float32)), axis)
        loss_sum = jax.lax.psum(loss_sum, axis)
        denom = jnp.maximum(n_real, 1.0)
        loss = loss_sum / denom
        # d(global loss)/d(params) = psum(local grad sums) / global count
        grads = jax.tree.map(lambda g: jax.lax.psum(g, axis) / denom, grads)
        # BN batch stats: average the per-shard updates (replicated result)
        batch_stats = jax.tree.map(
            lambda s: jax.lax.pmean(s, axis), mut["batch_stats"]
        )

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            rng=rng,
            step=state.step + 1,
        )
        correct = jax.lax.psum(
            jnp.sum((jnp.argmax(logits, -1) == labels)
                    * (w > 0).astype(jnp.float32)), axis
        )
        return new_state, {
            "loss": loss,
            "correct": correct,
            "count": n_real,
            "preds": jnp.argmax(logits, -1),
        }

    rep = P()
    shd = P(axis)
    state_specs = TrainState(
        params=rep, batch_stats=rep, opt_state=rep, rng=rep, step=rep
    )
    batch_specs = {
        "spec": shd, "labels_emo": shd, "labels_gen": shd,
        "global": shd, "weight": shd,
    }
    mapped = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_specs, batch_specs),
        out_specs=(
            state_specs,
            {"loss": rep, "correct": rep, "count": rep, "preds": shd},
        ),
        check_vma=False,
    )
    return jax.jit(mapped)

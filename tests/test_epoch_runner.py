"""Scanned whole-epoch runner must match the per-step loop numerically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sept_tpu.models import Conv2dBiRNN
from sept_tpu.train import (
    ExperimentConfig,
    init_state,
    make_baseline_step,
    make_epoch_runner,
    make_optimizer,
)

T, D, M, BATCH = 32, 16, 24, 8


def test_epoch_runner_matches_per_step_loop():
    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-2,
                           weight_decay=0.0, hidden_size=8)
    model = Conv2dBiRNN(hidden_size=8, pred="emotion", dropout_rate=0.0)
    tx = make_optimizer(cfg, steps_per_epoch=100)

    key = jax.random.PRNGKey(8)
    windows = jax.random.normal(key, (M, T, D))
    labels = jnp.asarray(np.arange(M) % 4, jnp.int32)
    weights = jnp.ones(M)
    order = jnp.asarray(np.random.default_rng(0).permutation(M))

    sample = {
        "spec": windows[:BATCH][..., None],
        "labels_emo": labels[:BATCH],
        "labels_gen": labels[:BATCH] % 2,
        "global": jnp.zeros((BATCH, 88)),
        "weight": weights[:BATCH],
    }
    state0 = init_state(model, tx, key, sample)

    # per-step loop (dropout_rate=0 so the rng path is irrelevant to math,
    # but thread the SAME rng sequence anyway)
    step = make_baseline_step(model, tx)
    s = state0
    losses_loop = []
    n_batches = M // BATCH
    for i in range(n_batches):
        idx = jax.lax.dynamic_slice_in_dim(order, i * BATCH, BATCH)
        batch = {
            "spec": windows[idx][..., None],
            "labels_emo": labels[idx],
            "labels_gen": labels[idx] % 2,
            "global": jnp.zeros((BATCH, 88)),
            "weight": weights[idx],
        }
        s, m = step(s, batch)
        losses_loop.append(float(m["loss"]))

    run = make_epoch_runner(model, tx)
    s2, losses_scan, correct, counts = run(
        state0, windows, labels, weights, order,
        n_batches=n_batches, batch_size=BATCH,
    )

    np.testing.assert_allclose(np.asarray(losses_scan), losses_loop, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(counts), BATCH)

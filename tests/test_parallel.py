"""Data-parallel sharding tests on the 8-device virtual CPU mesh.

The standard JAX fake-backend pattern (SURVEY.md §4 "Distributed"): assert
that the SAME jitted train step, run with batch-sharded inputs + replicated
params over an 8-device mesh, produces numerically equivalent updates to the
single-device step — XLA inserts the gradient all-reduce from shardings alone.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sept_tpu.models import Conv2dBiRNN
from sept_tpu.parallel import (
    batch_sharding,
    make_mesh,
    pad_batch_to_multiple,
    replicate_state,
    shard_batch,
)
from sept_tpu.train import (
    ExperimentConfig,
    init_state,
    make_baseline_step,
    make_optimizer,
)

T, D = 40, 32
KEY = jax.random.PRNGKey(8)


def batch(b=16):
    k = jax.random.PRNGKey(3)
    return {
        "spec": np.asarray(jax.random.normal(k, (b, T, D, 1))),
        "labels_emo": np.arange(b, dtype=np.int32) % 4,
        "labels_gen": np.arange(b, dtype=np.int32) % 2,
        "global": np.zeros((b, 88), np.float32),
        "weight": np.ones(b, np.float32),
    }


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_dp_step_matches_single_device():
    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-3, hidden_size=16,
                           weight_decay=0.0)
    model = Conv2dBiRNN(hidden_size=16, pred="emotion")
    tx = make_optimizer(cfg, steps_per_epoch=10)
    b = batch(16)
    state = init_state(model, tx, KEY, {k: jnp.asarray(v) for k, v in b.items()})
    step = make_baseline_step(model, tx)

    # single device
    s_single, m_single = step(state, {k: jnp.asarray(v) for k, v in b.items()})

    # 8-device mesh: replicated state, batch-sharded inputs
    mesh = make_mesh()
    state_rep = replicate_state(state, mesh)
    db = shard_batch(b, mesh)
    assert db["spec"].sharding == batch_sharding(mesh)
    s_dp, m_dp = step(state_rep, db)

    assert float(m_dp["loss"]) == pytest.approx(float(m_single["loss"]), rel=1e-5)
    flat_a = jax.tree.leaves(s_single.params)
    flat_b = jax.tree.leaves(s_dp.params)
    for a, c in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-6)


def test_dp_padding_mask_keeps_loss_exact():
    """Padding the batch to a device multiple must not change the loss."""
    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-3, hidden_size=16,
                           weight_decay=0.0)
    model = Conv2dBiRNN(hidden_size=16, pred="emotion")
    tx = make_optimizer(cfg, steps_per_epoch=10)
    b13 = batch(13)  # not divisible by 8
    state = init_state(
        model, tx, KEY, {k: jnp.asarray(v) for k, v in pad_batch_to_multiple(b13, 8).items()}
    )
    step = make_baseline_step(model, tx)

    padded = pad_batch_to_multiple(b13, 8)
    assert len(padded["weight"]) == 16
    assert padded["weight"].sum() == 13

    mesh = make_mesh()
    s_dp, m_dp = step(replicate_state(state, mesh), shard_batch(padded, mesh))

    # reference: unpadded single-device loss (weight-normalized) — compute
    # with a batch padded by zero-weight rows on one device instead
    s_1, m_1 = step(state, {k: jnp.asarray(v) for k, v in padded.items()})
    assert float(m_dp["loss"]) == pytest.approx(float(m_1["loss"]), rel=1e-5)
    assert float(m_dp["count"]) == 13.0


def test_shard_map_dp_matches_single_device():
    """Explicit psum/pmean formulation == single-device step (dropout off)."""
    from sept_tpu.parallel.shard_map_dp import make_shard_map_dp_step

    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-3, hidden_size=16,
                           weight_decay=0.0)
    model = Conv2dBiRNN(hidden_size=16, pred="emotion", dropout_rate=0.0)
    # sync-BN variant for the sharded run: batch stats all-reduced over the
    # mesh axis so train-mode BN sees the GLOBAL batch, like single-device
    model_sync = Conv2dBiRNN(hidden_size=16, pred="emotion", dropout_rate=0.0,
                             bn_axis_name="data")
    tx = make_optimizer(cfg, steps_per_epoch=10)
    b = batch(16)
    b["weight"][13:] = 0.0  # exercise the weighted-denominator psum
    state = init_state(model, tx, KEY, {k: jnp.asarray(v) for k, v in b.items()})
    step = make_baseline_step(model, tx)
    s_ref, m_ref = step(state, {k: jnp.asarray(v) for k, v in b.items()})

    mesh = make_mesh()
    dp_step = make_shard_map_dp_step(model_sync, tx, mesh)
    s_dp, m_dp = dp_step(replicate_state(state, mesh), shard_batch(b, mesh))

    assert float(m_dp["loss"]) == pytest.approx(float(m_ref["loss"]), rel=1e-5)
    assert float(m_dp["count"]) == 13.0
    for a, c in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-6)

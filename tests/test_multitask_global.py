"""Multitask training step and the 88-dim global-feature path."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from sept_tpu.models import Conv2dBiRNN
from sept_tpu.train import (
    ExperimentConfig,
    init_state,
    make_baseline_step,
    make_eval_logits_fn,
    make_optimizer,
)

T, D = 40, 32
KEY = jax.random.PRNGKey(8)


def _batch(b=8):
    k = jax.random.PRNGKey(1)
    return {
        "spec": jax.random.normal(k, (b, T, D, 1)),
        "labels_emo": jnp.asarray(np.arange(b) % 4, jnp.int32),
        "labels_gen": jnp.asarray(np.arange(b) % 2, jnp.int32),
        "global": jax.random.normal(jax.random.PRNGKey(2), (b, 88)),
        "weight": jnp.ones(b),
    }


@pytest.mark.slow
def test_multitask_step_trains_both_heads():
    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-2, weight_decay=0.0)
    model = Conv2dBiRNN(hidden_size=16, pred="multitask")
    tx = make_optimizer(cfg, 10)
    state = init_state(model, tx, KEY, _batch())
    step = make_baseline_step(model, tx)
    s1, m = step(state, _batch())
    assert m["preds"].shape == (8,)
    # both heads' weights moved
    for head in ("pred_emotion", "pred_gender"):
        d = float(jnp.max(jnp.abs(
            s1.params["heads"][head]["kernel"] - state.params["heads"][head]["kernel"]
        )))
        assert d > 0, head


@pytest.mark.slow
def test_global_feature_path_changes_logits():
    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-3)
    model = Conv2dBiRNN(hidden_size=16, pred="emotion")
    tx = make_optimizer(cfg, 10)
    b = _batch()
    state = init_state(model, tx, KEY, b, use_global=True)
    # dense1 input widened by 88 (baseline_models.py:208)
    assert state.params["heads"]["dense1"]["kernel"].shape[0] == 2 * 16 + 88
    logits_fn = make_eval_logits_fn(model, use_global=True)
    l1 = logits_fn(state.params, state.batch_stats, b["spec"], b["global"])
    l2 = logits_fn(state.params, state.batch_stats, b["spec"],
                   jnp.zeros_like(b["global"]))
    assert float(jnp.max(jnp.abs(l1 - l2))) > 0

    step = make_baseline_step(model, tx, use_global=True)
    s1, m = step(state, b)
    assert np.isfinite(float(m["loss"]))

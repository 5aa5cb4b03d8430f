"""Correctness tests for the fused second-conv-block Pallas kernels.

Interpret-mode on the CPU test backend; compiled-on-hardware coverage lives
in tests_tpu/.  Mirrors tests/test_pallas_conv.py: f32 kernel-level fwd/bwd
parity against jnp oracles (train AND eval BN, including dx and the
batch-statistics backward), plus model-level ``conv_backend="fused2"``
against the XLA path at bf16 tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sept_tpu.ops.pallas_conv2 import (
    block2_reference,
    fused_block2_eval,
    fused_block2_train,
)

EPS = 1e-5
B, CI, CO = 2, 32, 64


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return dict(
        x=jnp.asarray(rng.standard_normal((B, 100, 64, CI)).astype(np.float32)),
        k=jnp.asarray((rng.standard_normal((5, 5, CI, CO)) * 0.1).astype(np.float32)),
        bias=jnp.asarray((rng.standard_normal(CO) * 0.1).astype(np.float32)),
        gamma=jnp.asarray((1 + 0.1 * rng.standard_normal(CO)).astype(np.float32)),
        beta=jnp.asarray((0.1 * rng.standard_normal(CO)).astype(np.float32)),
        w=jnp.asarray(rng.standard_normal((B, 50, 32, CO)).astype(np.float32)),
    )


def _ref_train(x, k, bias, gamma, beta):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias[None, None, None, :]
    mean = y.mean((0, 1, 2))
    var = ((y - mean) ** 2).mean((0, 1, 2))
    z = jax.nn.relu((y - mean) * jax.lax.rsqrt(var + EPS) * gamma + beta)
    pooled = jax.lax.reduce_window(
        z, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return pooled, mean, var


def test_train_forward_and_grads(data):
    d = data
    pooled, mean, var = fused_block2_train(
        d["x"], d["k"], d["bias"], d["gamma"], d["beta"], CI, CO, True,
        jnp.float32, None)
    rp, rm, rv = _ref_train(d["x"], d["k"], d["bias"], d["gamma"], d["beta"])
    np.testing.assert_allclose(pooled, rp, atol=1e-4)
    np.testing.assert_allclose(mean, rm, atol=1e-5)
    np.testing.assert_allclose(var, rv, atol=1e-4)

    def loss_f(x, k, bias, gamma, beta):
        p, _, _ = fused_block2_train(x, k, bias, gamma, beta, CI, CO, True,
                                     jnp.float32, None)
        return jnp.sum(p * d["w"])

    def loss_r(x, k, bias, gamma, beta):
        p, _, _ = _ref_train(x, k, bias, gamma, beta)
        return jnp.sum(p * d["w"])

    args = (d["x"], d["k"], d["bias"], d["gamma"], d["beta"])
    gf = jax.grad(loss_f, argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(["dx", "dk", "db", "dgamma", "dbeta"], gf, gr):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(a, b, atol=5e-3 * scale, err_msg=name)


def test_eval_forward_and_grads(data):
    d = data
    rng = np.random.default_rng(1)
    mean = jnp.asarray((0.1 * rng.standard_normal(CO)).astype(np.float32))
    var = jnp.asarray((1 + 0.5 * rng.random(CO)).astype(np.float32))
    pe = fused_block2_eval(d["x"], d["k"], d["bias"], d["gamma"], d["beta"],
                           mean, var, CI, CO, True, jnp.float32)
    re = block2_reference(d["x"], d["k"], d["bias"], d["gamma"], d["beta"],
                          mean, var)
    np.testing.assert_allclose(pe, re, atol=1e-4)

    def loss_f(x, k, bias, gamma, beta):
        return jnp.sum(fused_block2_eval(x, k, bias, gamma, beta, mean, var,
                                         CI, CO, True, jnp.float32) * d["w"])

    def loss_r(x, k, bias, gamma, beta):
        return jnp.sum(block2_reference(x, k, bias, gamma, beta, mean, var)
                       * d["w"])

    args = (d["x"], d["k"], d["bias"], d["gamma"], d["beta"])
    gf = jax.grad(loss_f, argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(["dx", "dk", "db", "dgamma", "dbeta"], gf, gr):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(a, b, atol=5e-3 * scale, err_msg=name)


def test_model_backend_parity():
    """conv_backend='fused2' == 'xla' with identical params, bf16 tolerance."""
    from sept_tpu.models import Conv2dBiRNN

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 200, 128, 1)).astype(np.float32))
    mx = Conv2dBiRNN(hidden_size=32, pred="emotion", dtype=jnp.bfloat16)
    mf = Conv2dBiRNN(hidden_size=32, pred="emotion", dtype=jnp.bfloat16,
                     conv_backend="fused2")
    v = mx.init({"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, x, train=True)
    vf = mf.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)}, x, train=True)
    assert jax.tree.structure(v) == jax.tree.structure(vf)

    o1, m1 = mx.apply(v, x, train=True,
                      rngs={"dropout": jax.random.PRNGKey(2)},
                      mutable=["batch_stats"])
    o2, m2 = mf.apply(v, x, train=True,
                      rngs={"dropout": jax.random.PRNGKey(2)},
                      mutable=["batch_stats"])
    scale = float(jnp.abs(o1).max())
    assert float(jnp.abs(o1 - o2).max()) < 0.05 * max(scale, 0.1)
    for bn in ("bn0", "bn1"):
        np.testing.assert_allclose(
            m1["batch_stats"][bn]["mean"], m2["batch_stats"][bn]["mean"],
            atol=2e-3)
        np.testing.assert_allclose(
            m1["batch_stats"][bn]["var"], m2["batch_stats"][bn]["var"],
            atol=2e-3)

    e1 = mx.apply(v, x, train=False)
    e2 = mf.apply(v, x, train=False)
    assert float(jnp.abs(e1 - e2).max()) < 0.05 * max(scale, 0.1)

    lab = jnp.asarray((np.arange(4) % 4).astype(np.int32))

    def loss(params, model):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        lp = jax.nn.log_softmax(out)
        return -jnp.mean(lp[jnp.arange(4), lab])

    g1 = jax.grad(loss)(v["params"], mx)
    g2 = jax.grad(loss)(v["params"], mf)

    def close(a, b):
        a32 = a.astype(jnp.float32)
        b32 = b.astype(jnp.float32)
        # floor absorbs bf16 autodiff noise on analytically-zero grads
        tol = max(0.05 * float(jnp.abs(b32).max()), 0.02)
        assert float(jnp.abs(a32 - b32).max()) < tol

    jax.tree.map(close, g1, g2)


def test_resolved_auto_is_fused2():
    """'auto' resolves to fused2 on accelerators (here: CPU -> xla)."""
    from sept_tpu.train import ExperimentConfig

    cfg = ExperimentConfig(compute_dtype="bfloat16")
    assert cfg.resolved_conv_backend() == "xla"  # CPU test backend
    cfg.conv_backend = "fused2"
    assert cfg.resolved_conv_backend() == "fused2"


def test_cloak_grads_through_fused2_eval():
    """Noise-parameter gradients through the frozen fused2 backbone match
    the XLA backend (exercises K5 dx of BOTH fused blocks)."""
    from sept_tpu.models import CloakedModel, Conv2dBiRNN

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 200, 128, 1)).astype(np.float32))
    lab = jnp.asarray(np.array([0, 1], np.int32))

    def grads(backend):
        bb = Conv2dBiRNN(hidden_size=32, pred="emotion", dtype=jnp.bfloat16,
                         conv_backend=backend)
        m = CloakedModel(backbone=bb)
        v = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1),
                    "noise": jax.random.PRNGKey(2)}, x, train=True)

        def loss(p):
            out = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                          x, train=True,
                          rngs={"dropout": jax.random.PRNGKey(3),
                                "noise": jax.random.PRNGKey(4)})
            logits = out[0] if isinstance(out, tuple) else out
            lp = jax.nn.log_softmax(logits)
            return -jnp.mean(lp[jnp.arange(2), lab])

        return jax.grad(loss)(v["params"])["noise"]

    g_x = grads("xla")
    g_f = grads("fused2")
    for key in g_x:
        a = g_x[key].astype(jnp.float32)
        b = g_f[key].astype(jnp.float32)
        assert float(jnp.abs(a).max()) > 0.0, key
        tol = max(0.08 * float(jnp.abs(a).max()), 0.02)
        assert float(jnp.abs(a - b).max()) < tol, key

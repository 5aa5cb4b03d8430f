"""Correctness tests for the fused first-conv-block Pallas kernels.

Interpret-mode on the CPU test backend; compiled-on-hardware coverage lives
in tests_tpu/.  The f32 kernel-level tests pin fwd/bwd (train AND eval BN,
including dx and the batch-statistics backward terms) against jnp oracles at
float32 tolerance; the model-level test pins the ``conv_backend="fused1"``
path against the XLA path at bf16 tolerance with identical parameters.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sept_tpu.ops.pallas_conv import (
    block1_reference,
    fused_block1_eval,
    fused_block1_train,
)

# multi-minute on one core: excluded from the default fast lane (pyproject addopts)
pytestmark = pytest.mark.slow

EPS = 1e-5
B, C = 2, 32


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return dict(
        x=jnp.asarray(rng.standard_normal((B, 200, 128, 1)).astype(np.float32)),
        k=jnp.asarray((rng.standard_normal((5, 5, 1, C)) * 0.2).astype(np.float32)),
        bias=jnp.asarray((rng.standard_normal(C) * 0.1).astype(np.float32)),
        gamma=jnp.asarray((1 + 0.1 * rng.standard_normal(C)).astype(np.float32)),
        beta=jnp.asarray((0.1 * rng.standard_normal(C)).astype(np.float32)),
        w=jnp.asarray(rng.standard_normal((B, 100, 64, C)).astype(np.float32)),
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
    pooled, mean, var = fused_block1_train(
        d["x"], d["k"], d["bias"], d["gamma"], d["beta"], C, True,
        jnp.float32, None)
    rp, rm, rv = _ref_train(d["x"], d["k"], d["bias"], d["gamma"], d["beta"])
    np.testing.assert_allclose(pooled, rp, atol=1e-4)
    np.testing.assert_allclose(mean, rm, atol=1e-5)
    np.testing.assert_allclose(var, rv, atol=1e-5)

    def loss_f(x, k, bias, gamma, beta):
        p, _, _ = fused_block1_train(x, k, bias, gamma, beta, C, True,
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
    mean = jnp.asarray((0.1 * rng.standard_normal(C)).astype(np.float32))
    var = jnp.asarray((1 + 0.5 * rng.random(C)).astype(np.float32))
    pe = fused_block1_eval(d["x"], d["k"], d["bias"], d["gamma"], d["beta"],
                           mean, var, C, True, jnp.float32)
    re = block1_reference(d["x"], d["k"], d["bias"], d["gamma"], d["beta"],
                          mean, var)
    np.testing.assert_allclose(pe, re, atol=1e-4)

    def loss_f(x, k, bias, gamma, beta):
        return jnp.sum(fused_block1_eval(x, k, bias, gamma, beta, mean, var,
                                         C, True, jnp.float32) * d["w"])

    def loss_r(x, k, bias, gamma, beta):
        return jnp.sum(block1_reference(x, k, bias, gamma, beta, mean, var)
                       * d["w"])

    args = (d["x"], d["k"], d["bias"], d["gamma"], d["beta"])
    gf = jax.grad(loss_f, argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(["dx", "dk", "db", "dgamma", "dbeta"], gf, gr):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(a, b, atol=5e-3 * scale, err_msg=name)


def test_model_backend_parity():
    """conv_backend='fused1' == 'xla' with identical params, bf16 tolerance."""
    from sept_tpu.models import Conv2dBiRNN

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 200, 128, 1)).astype(np.float32))
    mx = Conv2dBiRNN(hidden_size=32, pred="emotion", dtype=jnp.bfloat16)
    mf = Conv2dBiRNN(hidden_size=32, pred="emotion", dtype=jnp.bfloat16,
                     conv_backend="fused1")
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
    np.testing.assert_allclose(
        m1["batch_stats"]["bn0"]["mean"], m2["batch_stats"]["bn0"]["mean"],
        atol=1e-3)
    np.testing.assert_allclose(
        m1["batch_stats"]["bn0"]["var"], m2["batch_stats"]["bn0"]["var"],
        atol=1e-3)

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
        # (conv0 bias under train-mode BN)
        tol = max(0.05 * float(jnp.abs(b32).max()), 0.02)
        assert float(jnp.abs(a32 - b32).max()) < tol

    jax.tree.map(close, g1, g2)


def test_resolved_conv_backend():
    """'auto' picks fused1 only when every precondition holds (CPU -> xla)."""
    from sept_tpu.train import ExperimentConfig

    cfg = ExperimentConfig(compute_dtype="bfloat16")
    # the test backend is CPU, so auto must refuse interpret-mode training
    assert cfg.resolved_conv_backend() == "xla"
    cfg.conv_backend = "fused1"
    assert cfg.resolved_conv_backend() == "fused1"  # explicit passes through
    cfg.conv_backend = "auto"
    cfg.compute_dtype = "float32"
    assert cfg.resolved_conv_backend() == "xla"
    cfg.compute_dtype = "bfloat16"
    cfg.feature_len = 120
    assert cfg.resolved_conv_backend() == "xla"


def test_geometry_guard():
    from sept_tpu.models import Conv2dBiRNN

    m = Conv2dBiRNN(hidden_size=32, pred="emotion", dtype=jnp.bfloat16,
                    conv_backend="fused1")
    x = jnp.zeros((2, 100, 128, 1), jnp.float32)
    with pytest.raises(ValueError, match="geometry"):
        m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, train=True)


def test_deep_model_fused_parity():
    """DeepConv2dBiRNN shares the first block; fused1 == xla at bf16 tol."""
    from sept_tpu.models import DeepConv2dBiRNN

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 200, 128, 1)).astype(np.float32))
    mx = DeepConv2dBiRNN(hidden_size=32, pred="emotion", dtype=jnp.bfloat16)
    mf = DeepConv2dBiRNN(hidden_size=32, pred="emotion", dtype=jnp.bfloat16,
                         conv_backend="fused1")
    v = mx.init({"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, x, train=True)
    vf = mf.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)}, x, train=True)
    assert jax.tree.structure(v) == jax.tree.structure(vf)
    e1 = mx.apply(v, x, train=False, pooling=None)
    e2 = mf.apply(v, x, train=False, pooling=None)
    scale = max(float(jnp.abs(e1).max()), 0.1)
    assert float(jnp.abs(e1 - e2).max()) < 0.05 * scale


def test_cloak_grads_through_fused_eval():
    """The frozen-backbone cloak path: noise-parameter gradients through the
    fused eval-mode block match the XLA backend (the dx path of K5)."""
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
    g_f = grads("fused1")
    for key in g_x:
        a = g_x[key].astype(jnp.float32)
        b = g_f[key].astype(jnp.float32)
        assert float(jnp.abs(a).max()) > 0.0, key  # grads actually flow
        tol = max(0.08 * float(jnp.abs(a).max()), 0.02)
        assert float(jnp.abs(a - b).max()) < tol, key


def test_remat_composes_with_fused_backend():
    """remat=True + conv_backend='fused1' trains (regression).

    The encoder's nn.remat closure used to route module access through the
    outer ``self`` instead of the checkpoint-rebound module, which leaked
    the fused block's param tracers out of the transform
    (UnexpectedTracerError at grad time).  remat is the roofline's top
    remaining lever (docs/ARCHITECTURE.md §2b′), so the composition must
    stay trainable; grads must also match the non-remat fused path.
    """
    from sept_tpu.models import Conv2dBiRNN

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 200, 128, 1)).astype(np.float32))
    lab = jnp.asarray(np.array([0, 1], np.int32))

    def grads(remat):
        m = Conv2dBiRNN(hidden_size=16, pred="emotion", dtype=jnp.bfloat16,
                        conv_backend="fused1", remat=remat)
        v = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x, train=True)

        def loss(p):
            out, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                             x, train=True,
                             rngs={"dropout": jax.random.PRNGKey(2)},
                             mutable=["batch_stats"])
            lp = jax.nn.log_softmax(out)
            return -jnp.mean(lp[jnp.arange(2), lab])

        return jax.grad(loss)(v["params"])

    g_plain = grads(remat=False)
    g_remat = grads(remat=True)
    assert jax.tree.structure(g_plain) == jax.tree.structure(g_remat)

    def close(a, b):
        a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
        tol = max(0.05 * float(jnp.abs(a32).max()), 0.02)
        assert float(jnp.abs(a32 - b32).max()) < tol

    jax.tree.map(close, g_plain, g_remat)

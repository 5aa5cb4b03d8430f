"""Gradient-reversal custom_vjp: identity forward, -lambda*grad backward.

Reference semantics: /root/reference/model/reversal_gradient.py:13-23.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sept_tpu.ops import gradient_reversal


def test_forward_is_identity():
    x = jnp.arange(6.0).reshape(2, 3)
    np.testing.assert_array_equal(np.asarray(gradient_reversal(x, 0.5)), np.asarray(x))


def test_backward_reverses_and_scales():
    def f(x):
        return jnp.sum(gradient_reversal(x, 0.25) ** 2)

    x = jnp.asarray([1.0, -2.0, 3.0])
    g = jax.grad(f)(x)
    # d/dx sum(x^2) = 2x, reversed and scaled: -0.25 * 2x
    np.testing.assert_allclose(np.asarray(g), -0.25 * 2 * np.asarray(x), atol=1e-6)


def test_grl_composes_under_jit_and_downstream_params():
    # the cloak+GRL use: loss = f(grl(x)) must push -lambda * df/dx into x,
    # while params *inside* f get normal (non-reversed) gradients.
    w = jnp.asarray(2.0)

    def loss(x, w):
        return jnp.sum(w * gradient_reversal(x, 0.1))

    gx, gw = jax.jit(jax.grad(loss, argnums=(0, 1)))(jnp.ones(4), w)
    np.testing.assert_allclose(np.asarray(gx), -0.1 * 2.0 * np.ones(4), atol=1e-6)
    np.testing.assert_allclose(float(gw), 4.0, atol=1e-6)

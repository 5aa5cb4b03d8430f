"""Gradient-reversal layer as a ``jax.custom_vjp``.

TPU-native equivalent of the reference's ``GradientReversalFunction``
(/root/reference/model/reversal_gradient.py:5-32): identity on the forward
pass, ``-lambda * grad`` on the backward pass.  Used to fold the adversary's
gender loss into the cloak's noise parameters with reversed sign so the whole
minimax game runs in one fused backward (training_cloak_with_grl.py:141-162).

``lambda_`` must be a STATIC Python float (it rides in
``nondiff_argnums``, so a traced jax scalar would fail to hash at the
custom_vjp boundary) — matching the reference, where lambda is a constant
hyperparameter (training_cloak_with_grl.py:227).  A traced/scheduled
lambda would need the value moved into the differentiable args with a
``stop_gradient``; no in-repo caller wants that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["gradient_reversal"]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def gradient_reversal(x: jax.Array, lambda_: float = 1.0) -> jax.Array:
    return x


def _grl_fwd(x, lambda_):
    return x, None


def _grl_bwd(lambda_, _res, g):
    return (jax.tree.map(lambda t: jnp.negative(t) * lambda_, g),)


gradient_reversal.defvjp(_grl_fwd, _grl_bwd)

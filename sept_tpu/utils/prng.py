"""Explicit PRNG-key discipline.

The reference's reproducibility rests on one global ``setup_seed(8)``
(/root/reference/utils/training_tools.py:69-74) mutating torch/numpy/random
state.  JAX randomness is functional; these helpers make the threading
ergonomic while keeping every consumer (cloak noise, dropout, augmentation,
shuffling) on an explicit, named key stream (SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

import hashlib

import jax

__all__ = ["KeySeq", "fold_in_name"]


def fold_in_name(key: jax.Array, name: str) -> jax.Array:
    """Derive a named subkey deterministically from a string tag."""
    digest = int.from_bytes(
        hashlib.sha256(name.encode()).digest()[:4], "big"
    )
    return jax.random.fold_in(key, digest)


class KeySeq:
    """A splitting key sequence: ``ks = KeySeq(8); k1 = ks(); k2 = ks('noise')``."""

    def __init__(self, seed_or_key):
        import numbers

        # numbers.Integral admits numpy integer seeds (np.int64 from a
        # Generator or config array is NOT a Python int and would be
        # stored as a "key", crashing later inside jax.random.split)
        if isinstance(seed_or_key, numbers.Integral):
            self._key = jax.random.PRNGKey(int(seed_or_key))
        else:
            self._key = seed_or_key

    def __call__(self, name: str | None = None) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        if name is not None:
            sub = fold_in_name(sub, name)
        return sub

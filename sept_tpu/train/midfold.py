"""Mid-fold (epoch-level) checkpoint / resume.

The reference has save-only checkpoints: a crashed fold re-runs from epoch 0
(SURVEY.md §5 "Checkpoint / resume").  This module gives the device fold
loops REAL resume: after every epoch the full optimization state (params,
batch_stats, opt_state, rng, step), the best-so-far state, and the host-side
loop bookkeeping (epoch index, best-val tracking, EarlyStopping and
plateau-scheduler counters, metric history) are persisted; a restarted run
continues from the next epoch with identical behavior.

Layout under ``dir``:
    state/   Orbax checkpoint of the live TrainState
    best/    Orbax checkpoint of the best-by-val state (when one exists)
    loop.json  host bookkeeping

The fold driver deletes the directory once the fold completes (the final
artifact supersedes it).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["MidFoldCheckpoint"]


class MidFoldCheckpoint:
    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        self._ckptr = ocp.StandardCheckpointer()

    def exists(self) -> bool:
        return os.path.isfile(os.path.join(self.path, "loop.json"))

    def save(self, state: Any, best_state: Optional[Any], loop: dict) -> None:
        os.makedirs(self.path, exist_ok=True)
        self._ckptr.save(os.path.join(self.path, "state"), state, force=True)
        if best_state is not None:
            self._ckptr.save(
                os.path.join(self.path, "best"), best_state, force=True
            )
        self._ckptr.wait_until_finished()
        tmp = os.path.join(self.path, "loop.json.tmp")
        with open(tmp, "w") as f:
            json.dump(loop, f)
        os.replace(tmp, os.path.join(self.path, "loop.json"))

    def restore(self, like: Any) -> tuple[Any, Optional[Any], dict]:
        """Restore (state, best_state, loop) against a freshly-built ``like``
        pytree (device-agnostic: arrays land on the current backend)."""
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                np.shape(x), x.dtype,
                sharding=jax.sharding.SingleDeviceSharding(jax.devices()[0]),
            )
            if hasattr(x, "dtype")
            else x,
            like,
        )
        state = self._ckptr.restore(os.path.join(self.path, "state"), abstract)
        best = None
        if os.path.isdir(os.path.join(self.path, "best")):
            best = self._ckptr.restore(
                os.path.join(self.path, "best"), abstract
            )
        with open(os.path.join(self.path, "loop.json")) as f:
            loop = json.load(f)
        return state, best, loop

    def delete(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)

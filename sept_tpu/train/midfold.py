"""Mid-fold (epoch-level) checkpoint / resume.

The reference has save-only checkpoints: a crashed fold re-runs from epoch 0
(SURVEY.md §5 "Checkpoint / resume").  This module gives the device fold
loops REAL resume: after every epoch the full optimization state (params,
batch_stats, opt_state, rng, step), the best-so-far state, and the host-side
loop bookkeeping (epoch index, best-val tracking, EarlyStopping and
plateau-scheduler counters, metric history) are persisted; a restarted run
continues from the next epoch with identical behavior.

Crash-consistency contract: ``loop.json`` is the single atomic commit point.
Each epoch's Orbax states are written to FRESH ``state_e<N>`` /
``best_e<N>`` directories first; only after they are fully finalized is
``loop.json`` (which names them) atomically replaced, and only after that
are the previous epoch's directories deleted.  A kill at ANY instant leaves
``loop.json`` pointing at a complete checkpoint whose epoch index matches
its contents — the restored run replays the identical trajectory.  (The
naive overwrite-in-place scheme had a window where the state directory held
epoch N+1 while loop.json still said N: that epoch trained twice from a
double-stepped optimizer, or an interrupted overwrite left the fold
unresumable.)

Layout under ``dir``:
    state_e<N>/  Orbax checkpoint of the live TrainState after epoch N
    best_e<N>/   Orbax checkpoint of the best-by-val state (when one exists)
    loop.json    host bookkeeping + {"state_dir", "best_dir"} pointers

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

    def _loop_path(self) -> str:
        return os.path.join(self.path, "loop.json")

    def exists(self) -> bool:
        if not os.path.isfile(self._loop_path()):
            return False
        try:
            with open(self._loop_path()) as f:
                loop = json.load(f)
        except (json.JSONDecodeError, OSError):
            return False
        state_dir = loop.get("state_dir", "state")
        return os.path.isdir(os.path.join(self.path, state_dir))

    def save(self, state: Any, best_state: Optional[Any], loop: dict) -> None:
        os.makedirs(self.path, exist_ok=True)
        epoch = int(loop.get("epoch", 0))
        state_dir = f"state_e{epoch}"
        best_dir = f"best_e{epoch}" if best_state is not None else None

        # 1) write the new checkpoints to fresh directories
        self._ckptr.save(os.path.join(self.path, state_dir), state, force=True)
        if best_state is not None:
            self._ckptr.save(
                os.path.join(self.path, best_dir), best_state, force=True
            )
        self._ckptr.wait_until_finished()

        # 2) commit: atomically point loop.json at them
        prev = None
        if os.path.isfile(self._loop_path()):
            try:
                with open(self._loop_path()) as f:
                    prev = json.load(f)
            except (json.JSONDecodeError, OSError):
                prev = None
        loop = dict(loop)
        loop["state_dir"] = state_dir
        if best_dir is not None:
            loop["best_dir"] = best_dir
        elif prev and prev.get("best_dir"):
            loop["best_dir"] = prev["best_dir"]  # keep the older best alive
        tmp = self._loop_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(loop, f)
        os.replace(tmp, self._loop_path())

        # 3) only now drop superseded checkpoint directories
        keep = {state_dir, loop.get("best_dir")}
        for d in os.listdir(self.path):
            if (d.startswith(("state_e", "best_e", "state", "best"))
                    and d not in keep
                    and os.path.isdir(os.path.join(self.path, d))):
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    def restore(self, like: Any) -> tuple[Any, Optional[Any], dict]:
        """Restore (state, best_state, loop) against a freshly-built ``like``
        pytree (device-agnostic: arrays land on the current backend)."""
        with open(self._loop_path()) as f:
            loop = json.load(f)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                np.shape(x), x.dtype,
                sharding=jax.sharding.SingleDeviceSharding(jax.devices()[0]),
            )
            if hasattr(x, "dtype")
            else x,
            like,
        )
        state_dir = loop.get("state_dir", "state")  # "state": legacy layout
        state = self._ckptr.restore(
            os.path.join(self.path, state_dir), abstract
        )
        best = None
        best_dir = loop.get("best_dir", "best")
        if os.path.isdir(os.path.join(self.path, best_dir)):
            best = self._ckptr.restore(
                os.path.join(self.path, best_dir), abstract
            )
        return state, best, loop

    def delete(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)

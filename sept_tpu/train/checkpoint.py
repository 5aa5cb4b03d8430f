"""Orbax checkpointing with the reference's three-artifact dependency graph.

The reference saves a best-by-validation state_dict per fold as ``model.pt``
plus per-epoch metrics (``results_<len>.pkl``) under a directory tree that
encodes every hyperparameter (training_adversary_baselines.py:482-510).
Cross-stage dependencies: cloak training loads the baseline checkpoint
(training_cloak.py:357-358); suppression>0 runs load the suppression_0 cloak
(:364-366); the evaluation sweep loads baseline + adversary + cloak
(adversary_cloak_evaluation.py:247-260).

Here each artifact is an Orbax checkpoint under a flat, readable key
(``<output_dir>/<artifact>/fold<k>``) plus a JSON run manifest — replacing
the directory-tree-as-config database (SURVEY.md §5) — and restore gives
real resume, which the reference lacks.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "artifact_path"]


def artifact_path(output_dir: str, artifact: str, fold: int) -> str:
    """e.g. results/baseline_emotion/fold1"""
    return os.path.join(os.path.abspath(output_dir), artifact, f"fold{fold}")


class CheckpointManager:
    """Save/restore param pytrees + batch_stats + a JSON manifest."""

    def __init__(self, output_dir: str):
        self.output_dir = os.path.abspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def save(
        self,
        artifact: str,
        fold: int,
        params: Any,
        batch_stats: Any = None,
        manifest: Optional[dict] = None,
    ) -> str:
        path = artifact_path(self.output_dir, artifact, fold)
        payload = {"params": params}
        if batch_stats is not None:
            payload["batch_stats"] = batch_stats
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()
        if manifest is not None:
            # one manifest per fold, next to (not inside) the Orbax dir
            mpath = os.path.join(
                os.path.dirname(path), f"manifest_fold{fold}.json"
            )
            with open(mpath, "w") as f:
                json.dump(_jsonable(manifest), f, indent=2)
        return path

    def restore(self, artifact: str, fold: int, like: Optional[Any] = None) -> dict:
        """Device-agnostic restore.

        Checkpoints saved on one backend (e.g. the TPU) must restore on
        another (e.g. the CPU test backend); Orbax's default re-applies the
        *stored* device shardings and fails.  Restoring against an abstract
        (shape/dtype-only) target from the checkpoint's metadata places
        arrays on the current default device instead.
        """
        path = artifact_path(self.output_dir, artifact, fold)
        if like is not None:
            return self._ckptr.restore(path, like)
        meta = self._ckptr.metadata(path)
        tree = getattr(meta, "item_metadata", meta)

        device = jax.devices()[0]
        sharding = jax.sharding.SingleDeviceSharding(device)

        def to_abstract(m):
            return jax.ShapeDtypeStruct(tuple(m.shape), m.dtype,
                                        sharding=sharding)

        abstract = jax.tree.map(
            to_abstract,
            dict(tree.tree) if hasattr(tree, "tree") else tree,
            is_leaf=lambda x: hasattr(x, "shape") and hasattr(x, "dtype"),
        )
        return self._ckptr.restore(path, abstract)

    def exists(self, artifact: str, fold: int) -> bool:
        return os.path.isdir(artifact_path(self.output_dir, artifact, fold))


# one JSON-coercion helper for manifests AND checkpoint metadata — a fix to
# one copy (NaN handling, new leaf types) must not silently miss the other
from sept_tpu.utils.logging import _jsonable  # noqa: E402

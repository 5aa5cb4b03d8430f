"""Structured run logging: flat manifests + JSONL metrics.

Replaces the reference's directory-tree-as-config experiment database
(hyperparameters encoded in 12-deep result paths,
/root/reference/training/training_cloak.py:445-467) with:

- :class:`RunManifest` — one JSON file per run holding the full config,
  environment info, and final metrics;
- :class:`MetricsLogger` — append-only JSONL of per-epoch metric dicts
  (the queryable equivalent of the per-epoch ``results_<len>.pkl``).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any

import jax

__all__ = ["RunManifest", "MetricsLogger"]


def _jsonable(obj):
    import numpy as np

    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return _jsonable(dataclasses.asdict(obj))
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.ndarray, jax.Array)):
        return np.asarray(obj).tolist()
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    return obj


class RunManifest:
    def __init__(self, path: str, config: Any = None):
        self.path = path
        self.data: dict = {
            "created": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "jax_version": jax.__version__,
            "devices": [str(d) for d in jax.devices()],
            "config": _jsonable(config) if config is not None else None,
            "results": {},
        }

    def record(self, **kv) -> None:
        self.data["results"].update(_jsonable(kv))

    def write(self) -> str:
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        with open(self.path, "w") as f:
            json.dump(self.data, f, indent=2)
        return self.path


class MetricsLogger:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a")

    def log(self, **kv) -> None:
        kv.setdefault("t", time.time())
        self._f.write(json.dumps(_jsonable(kv)) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()

"""Device mesh + data-parallel sharding.

The reference is single-device (SURVEY.md §2.7); the framework's parallelism
surface is data parallelism over a 1-D ``jax.sharding.Mesh``:

- params / opt state / batch_stats: replicated;
- batch arrays: sharded on the leading axis;
- the jitted train step is sharding-agnostic — XLA inserts the gradient
  all-reduce (psum) over ICI from the output sharding constraints alone.

Multi-host extension: call :func:`init_distributed` (jax.distributed over
DCN) before :func:`make_mesh`; everything else is unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "init_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate_state",
    "pad_batch_to_multiple",
]


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init over DCN (no-op for single-process or if already
    initialized — setup_seed() performs the init before any backend use,
    and this keeps later explicit calls harmless)."""
    if num_processes and num_processes > 1:
        if jax.distributed.is_initialized():
            return
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all).

    An explicit request for more devices than exist raises — slicing would
    silently hand back a smaller mesh and run the job at the wrong scale
    (batch-divisibility checks use the actual mesh size, so nothing
    downstream would ever notice).
    """
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are visible"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Put each batch array on the mesh, sharded along the leading dim."""
    sh = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_state(state, mesh: Mesh):
    """Replicate a TrainState (params/opt/bn stats) across the mesh."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def pad_batch_to_multiple(batch: dict, multiple: int) -> dict:
    """Zero-pad the batch's leading dim to a device-count multiple, extending
    the ``weight`` mask so padded rows contribute nothing to the loss."""
    n = len(batch["weight"])
    pad = (-n) % multiple
    if pad == 0:
        return batch
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        pad_block = np.zeros((pad,) + v.shape[1:], dtype=v.dtype)
        out[k] = np.concatenate([v, pad_block])
    return out

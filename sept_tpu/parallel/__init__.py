"""Parallelism: mesh setup, data-parallel shardings, multi-host init."""

from sept_tpu.parallel.epoch_dp import (
    make_cloak_epoch_runner_dp,
    make_epoch_runner_dp,
    put_replicated,
)
from sept_tpu.parallel.shard_map_dp import make_shard_map_dp_step
from sept_tpu.parallel.mesh import (
    batch_sharding,
    init_distributed,
    make_mesh,
    pad_batch_to_multiple,
    replicate_state,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "init_distributed",
    "make_cloak_epoch_runner_dp",
    "make_epoch_runner_dp",
    "make_shard_map_dp_step",
    "make_mesh",
    "put_replicated",
    "pad_batch_to_multiple",
    "replicate_state",
    "replicated",
    "shard_batch",
]

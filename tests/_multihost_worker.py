"""One process of a REAL 2-process ``jax.distributed`` run (CPU backend,
4 virtual devices per process) — launched by tests/test_multihost.py.

The parent exports the exact user-facing multi-host env contract
(``SEPT_COORDINATOR`` / ``SEPT_NUM_PROCESSES`` / ``SEPT_PROCESS_ID``,
cli/common.py) plus ``XLA_FLAGS=--xla_force_host_platform_device_count=4``.
This worker goes through ``cli.common.resolve_mesh`` — the env path the
monkeypatched tests in test_parallel.py cannot exercise — so
``jax.distributed.initialize`` really runs, the two processes really join
one cluster, and the DP scanned epoch really executes over the global
8-device mesh with psums crossing the process boundary.

Process 0 writes the resulting params / per-batch losses / counts to the
npz path in argv[1]; the parent compares them with the single-process
result (same seeds, same data).  Everything here must be bit-deterministic
given the platform: data from seeded numpy generators, init from a fixed
PRNGKey, dropout off, sync-BN on the mesh axis.
"""

import argparse
import sys


def main() -> None:
    out_path = sys.argv[1]

    # platform pinning must precede any backend use (the host environment's
    # sitecustomize registers an accelerator plugin and selects it via jax
    # config, so JAX_PLATFORMS=cpu in the env alone is not enough)
    from sept_tpu.cli.common import pin_cpu_platform, resolve_mesh

    pin_cpu_platform()

    # resolve_mesh sees SEPT_COORDINATOR and performs the DCN init itself
    mesh = resolve_mesh(argparse.Namespace(n_devices=8, batch_size=16))

    import jax

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 4, jax.local_devices()
    assert len(jax.devices()) == 8, jax.devices()
    assert mesh is not None and mesh.devices.size == 8

    import jax.numpy as jnp  # noqa: F401  (imported after backend pinning)
    import numpy as np

    from sept_tpu.models import Conv2dBiRNN
    from sept_tpu.parallel.epoch_dp import make_epoch_runner_dp, put_replicated
    from sept_tpu.train import ExperimentConfig, init_state, make_optimizer

    # identical construction to the parent's single-process reference
    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-3,
                           hidden_size=16, weight_decay=0.0)
    model = Conv2dBiRNN(hidden_size=16, pred="emotion", dropout_rate=0.0,
                        bn_axis_name="data")
    tx = make_optimizer(cfg, steps_per_epoch=10)

    T, D, m = 40, 32, 32
    rng = np.random.default_rng(5)
    windows = rng.standard_normal((m, T, D)).astype(np.float32)
    labels = (np.arange(m) % 4).astype(np.int32)
    weights = np.where(np.arange(m) < m - 3, 1.0, 0.0).astype(np.float32)
    order = np.random.default_rng(0).permutation(m)

    b0 = {"spec": windows[:16][..., None],
          "labels_emo": labels[:16],
          "labels_gen": np.zeros(16, np.int32),
          "global": np.zeros((16, 88), np.float32),
          "weight": np.ones(16, np.float32)}
    state = init_state(model, tx, jax.random.PRNGKey(8), b0)
    state = put_replicated(state, mesh)

    run = make_epoch_runner_dp(model, tx, mesh)
    s, losses, correct, counts = run(state, windows, labels, weights, order,
                                     n_batches=2, batch_size=16)

    if jax.process_index() == 0:
        arrays = {"losses": np.asarray(losses),
                  "correct": np.asarray(correct),
                  "counts": np.asarray(counts)}
        for i, leaf in enumerate(jax.tree.leaves(s.params)):
            arrays[f"param_{i}"] = np.asarray(leaf)
        for i, leaf in enumerate(jax.tree.leaves(s.batch_stats)):
            arrays[f"bstat_{i}"] = np.asarray(leaf)
        np.savez(out_path, **arrays)

    # both processes must reach the end before either tears down the cluster
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("multihost_worker_done")


if __name__ == "__main__":
    main()

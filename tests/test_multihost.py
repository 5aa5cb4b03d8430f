"""REAL 2-process multi-host DCN test (VERDICT round-3 item 3).

test_parallel.py verifies the multi-host *plumbing* with a monkeypatched
``jax.distributed.initialize``; this test replaces that trust with a genuine
2-process ``jax.distributed`` run on the CPU backend: two subprocesses join
one cluster through the user-facing ``SEPT_COORDINATOR`` env contract
(cli/common.py::resolve_mesh — the exact code path a real multi-host launch
takes, SURVEY.md §7 layer F), build the global 8-device mesh (4 virtual
devices per process), run the DP scanned epoch across the process boundary,
and must reproduce the single-process result exactly (up to the documented
sync-BN summation-order epsilon).
"""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# spawns two fresh interpreters that each compile the scanned epoch:
# multi-minute on one core, excluded from the default fast lane
pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))


def _reserve_port() -> tuple[socket.socket, int]:
    """Bind an ephemeral port with SO_REUSEADDR and return the LIVE socket
    plus its port.  The caller holds the socket until just before spawning
    the workers, so no other process can grab the port in between (the
    close-then-reuse pattern is a TOCTOU race); SO_REUSEADDR lets the
    coordinator bind the same port while our closed socket lingers in
    TIME_WAIT."""
    s = socket.socket()
    s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    s.bind(("127.0.0.1", 0))
    return s, s.getsockname()[1]


def _single_process_reference():
    """The same epoch on this process's conftest 8-device backend, run
    SINGLE-device (sept_tpu.train.steps.make_epoch_runner) — the oracle the
    2-process DP run must match."""
    from sept_tpu.models import Conv2dBiRNN
    from sept_tpu.train import ExperimentConfig, init_state, make_optimizer
    from sept_tpu.train.steps import make_epoch_runner

    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-3,
                           hidden_size=16, weight_decay=0.0)
    model = Conv2dBiRNN(hidden_size=16, pred="emotion", dropout_rate=0.0)
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
    run = make_epoch_runner(model, tx)
    s, losses, correct, counts = run(
        state, jnp.asarray(windows), jnp.asarray(labels),
        jnp.asarray(weights), jnp.asarray(order),
        n_batches=2, batch_size=16,
    )
    return s, np.asarray(losses), np.asarray(correct), np.asarray(counts)


def test_two_process_dcn_dp_epoch_matches_single_process(tmp_path):
    reserved, port = _reserve_port()
    out = tmp_path / "proc0_result.npz"
    procs = []
    logs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PYTEST_CURRENT_TEST", None)
        env.update({
            # the documented user-facing multi-host launch contract
            "SEPT_COORDINATOR": f"127.0.0.1:{port}",
            "SEPT_NUM_PROCESSES": "2",
            "SEPT_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "PYTHONPATH": os.pathsep.join(
                [os.path.dirname(HERE), env.get("PYTHONPATH", "")]).rstrip(
                    os.pathsep),
        })
        log = open(tmp_path / f"worker{pid}.log", "wb")
        logs.append(log)
        if pid == 0:
            # release the reserved port only now, microseconds before the
            # coordinator process that will re-bind it is spawned
            reserved.close()
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_multihost_worker.py"),
             str(out)],
            env=env, stdout=log, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(HERE),
        ))
    try:
        for p in procs:
            p.wait(timeout=600)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
        for log in logs:
            log.close()

    for pid, p in enumerate(procs):
        if p.returncode != 0:
            tail = (tmp_path / f"worker{pid}.log").read_bytes()[-4000:]
            pytest.fail(
                f"worker {pid} exited {p.returncode}:\n"
                + tail.decode(errors="replace"))
    assert out.exists(), "process 0 wrote no result"

    got = np.load(out)
    s1, losses1, correct1, counts1 = _single_process_reference()

    np.testing.assert_allclose(got["losses"], losses1, rtol=1e-5)
    np.testing.assert_allclose(got["correct"], correct1, atol=1e-5)
    np.testing.assert_allclose(got["counts"], counts1, atol=1e-6)
    params1 = jax.tree.leaves(s1.params)
    for i, ref in enumerate(params1):
        np.testing.assert_allclose(got[f"param_{i}"], np.asarray(ref),
                                   atol=3e-6)
    # sync-BN under DP pmeans per-shard moments: different f32 summation
    # order than the single-device one-pass moments (same epsilon rationale
    # as test_parallel.py::test_dp_scanned_epoch_matches_single_device)
    for i, ref in enumerate(jax.tree.leaves(s1.batch_stats)):
        np.testing.assert_allclose(got[f"bstat_{i}"], np.asarray(ref),
                                   atol=2e-5)

"""Headline benchmark: featurize+train utterances/sec on one TPU chip.

Workload (matched to benchmarks/reference_cpu.py, the faithful torch-CPU
re-creation of the reference pipeline):

- featurize N 2.5-s utterances (mel spectrogram n_fft=800/hop 160/128 mels,
  dB) — here as one batched, jitted MXU GEMM chain instead of the
  reference's per-utterance CPU loop;
- window to (4N, 200, 128) with stride 50;
- one training epoch of the Conv2dBiRNN workhorse (SGD momentum, batch 32)
  as a jitted donated-state step.

Steady-state throughput (compile excluded via warmup on identical shapes;
the torch reference is eager and has no compile either).  Prints ONE JSON
line; vs_baseline is measured against benchmarks/reference_cpu.json from the
same machine (reference repo publishes no numbers — BASELINE.md).
"""

import json
import os
import time

import numpy as np


def main():
    import jax

    # persistent compile cache: repeat bench runs skip the (slow, tunneled)
    # XLA compilation of the ingest + scanned-epoch programs
    from sept_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from sept_tpu.models import Conv2dBiRNN
    from sept_tpu.train import (
        ExperimentConfig,
        init_state,
        make_baseline_step,
        make_optimizer,
    )

    SR, N_UTTS, DUR_S = 16000, 256, 2.5
    WIN, SHIFT, D = 200, 50, 128
    BATCH = 32

    rng = np.random.default_rng(8)
    t = np.arange(int(DUR_S * SR)) / SR
    waves = {
        f"u{i:04d}": (
            0.3 * np.sin(2 * np.pi * (120 + 10 * (i % 32)) * t)
            + 0.05 * rng.standard_normal(t.shape)
        ).astype(np.float32)
        for i in range(N_UTTS)
    }


    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-4,
                           hidden_size=64, batch_size=BATCH)
    model = Conv2dBiRNN(hidden_size=64, pred="emotion")
    tx = make_optimizer(cfg, steps_per_epoch=32)
    dummy = {
        "spec": jnp.zeros((BATCH, WIN, D, 1), jnp.float32),
        "labels_emo": jnp.zeros((BATCH,), jnp.int32),
        "labels_gen": jnp.zeros((BATCH,), jnp.int32),
        "global": jnp.zeros((BATCH, 88), jnp.float32),
        "weight": jnp.ones((BATCH,), jnp.float32),
    }
    state = init_state(model, tx, jax.random.PRNGKey(8), dummy)
    step = make_baseline_step(model, tx)
    state, _ = step(state, dummy)  # compile
    jax.block_until_ready(state.params)

    # ---- timed: on-device ingest (featurize + znorm + window, zero D2H) ----
    wave_list = [waves[k] for k in waves]
    spk = (np.arange(N_UTTS) % 16).astype(np.int32)
    labels = (np.arange(N_UTTS) % 4).astype(np.int32)
    # warmup-compile the ingest on identical shapes
    from sept_tpu.data.device_pipeline import device_ingest

    device_ingest(wave_list[:N_UTTS], spk, labels, labels % 2,
                  win_len=WIN, shift_len=SHIFT)
    t0 = time.perf_counter()
    ds = device_ingest(wave_list, spk, labels, labels % 2,
                       win_len=WIN, shift_len=SHIFT)
    jax.block_until_ready(ds.windows)
    t_feat = time.perf_counter() - t0
    t_win = 0.0

    # ---- timed: one training epoch as a single scanned device program ----
    from sept_tpu.train import make_epoch_runner

    m_total = len(ds)
    n_batches = m_total // BATCH
    order = jnp.asarray(np.random.default_rng(0).permutation(m_total))
    run_epoch = make_epoch_runner(model, tx)
    # warmup compile
    out = run_epoch(state, ds.windows, ds.labels_emo, ds.weight, order,
                    n_batches=n_batches, batch_size=BATCH)
    jax.block_until_ready(out[0].params)
    t0 = time.perf_counter()
    state, losses, correct, counts = run_epoch(
        state, ds.windows, ds.labels_emo, ds.weight, order,
        n_batches=n_batches, batch_size=BATCH,
    )
    jax.block_until_ready(state.params)
    t_train = time.perf_counter() - t0

    total = t_feat + t_win + t_train
    utts_per_sec = N_UTTS / total

    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "reference_cpu.json")
    vs_baseline = None
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)
        vs_baseline = round(utts_per_sec / ref["utts_per_sec"], 2)

    print(json.dumps({
        "metric": "featurize+train utterances/sec/chip (2.5s utts, mel128 + Conv2dBiRNN epoch)",
        "value": round(utts_per_sec, 2),
        "unit": "utt/s/chip",
        "vs_baseline": vs_baseline,
        "detail": {
            "n_utts": N_UTTS,
            "n_windows": int(m_total),
            "featurize_s": round(t_feat, 3),
            
            "train_epoch_s": round(t_train, 3),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()

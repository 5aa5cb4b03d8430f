"""Headline benchmark: featurize+train utterances/sec on one TPU chip.

Workload (matched to benchmarks/reference_cpu.py, the faithful torch-CPU
re-creation of the reference pipeline):

- featurize N 2.5-s utterances (mel spectrogram n_fft=800/hop 160/128 mels,
  dB) — here as one batched, jitted MXU GEMM chain instead of the
  reference's per-utterance CPU loop;
- window to (2N, 200, 128) with stride 50;
- one 64-batch training epoch of the Conv2dBiRNN workhorse (SGD momentum,
  batch 32) as one scanned device program.

Steady-state throughput (compile excluded via warmup on identical shapes;
the torch reference is eager and has no compile either).  Each timed stage
is the MIN over 3 repeats: the chip sits behind a shared tunnel whose
host<->device bandwidth varies run to run, and min-of-N measures pipeline
capability rather than transient tunnel contention.  Prints ONE JSON line.
BASELINE LABELING: vs_baseline is measured against
benchmarks/reference_cpu.json from the same machine — the reference
pipeline in eager torch on a SINGLE CPU core (this box has one core; the
reference repo publishes no numbers of its own, BASELINE.md).

STAGE ORDER MATTERS on this environment: loading/running the scanned-BiRNN
model executables flips the tunnel into a ~40x-slower host->device transfer
mode for the rest of the process (measured: device_put of 160 MB goes
0.12s -> 4.4s after init_state; pure on-device compute is unaffected).  All
transfer-bound stages (ingest, functionals) are therefore timed BEFORE any
model program — which is also the real pipeline order (featurize, then
train on device-resident arrays).

Also reported in ``detail``:
- mfu: model-FLOPs utilization of the training epoch against the v5e chip's
  197 TFLOP/s bf16 peak (XLA cost-analysis FLOPs / elapsed / peak) — this
  run computes in f32, so the ceiling is conservative;
- featurize_bf16_s: the fused Pallas bf16-throughput frontend
  (ops/pallas_frontend.py);
- gemaps_emobase_s: device functional featurization (88-dim eGeMAPS-style +
  988-dim emobase-style) for the same N utterances.
"""

import json
import os
import time

import numpy as np

V5E_BF16_PEAK = 197e12  # FLOP/s, one v5e chip


def main():
    import jax

    # persistent compile cache: repeat bench runs skip the (slow, tunneled)
    # XLA compilation of the ingest + scanned-epoch programs
    from sept_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    SR, N_UTTS, DUR_S = 16000, 1024, 2.5
    WIN, SHIFT, D = 200, 50, 128
    BATCH = 32

    rng = np.random.default_rng(8)
    t = np.arange(int(DUR_S * SR)) / SR
    # 16-bit PCM waves, as decoded from the corpora's WAV files (IEMOCAP /
    # CREMA-D are 16 kHz PCM16): int16 stages to the device at HALF the
    # float32 bytes and normalizes on device bit-exactly
    # (runtime.narrow_pcm16 / ops.frontend.pcm_to_float)
    waves = {
        f"u{i:04d}": np.clip(np.rint((
            0.3 * np.sin(2 * np.pi * (120 + 10 * (i % 32)) * t)
            + 0.05 * rng.standard_normal(t.shape)
        ) * 32768.0), -32768, 32767).astype(np.int16)
        for i in range(N_UTTS)
    }

    # Timings take the MIN over repeats: the chip is reached over a shared
    # tunnel whose transfer bandwidth varies run to run; min-of-N measures
    # the pipeline's capability rather than transient tunnel contention.
    REPEATS = 3

    # ---- timed: on-device ingest (featurize + znorm + window, zero D2H) ----
    # FIRST, before any model executable exists (see module docstring).
    from sept_tpu.data.device_pipeline import device_ingest

    wave_list = [waves[k] for k in waves]
    spk = (np.arange(N_UTTS) % 16).astype(np.int32)
    labels = (np.arange(N_UTTS) % 4).astype(np.int32)

    def timed_ingest(frontend):
        ds, best = None, float("inf")
        for _ in range(REPEATS + 1):  # first iteration = warmup-compile
            t0 = time.perf_counter()
            out = device_ingest(wave_list, spk, labels, labels % 2,
                                win_len=WIN, shift_len=SHIFT,
                                frontend=frontend)
            jax.block_until_ready(out.windows)
            dt = time.perf_counter() - t0
            if ds is None:
                ds = out  # warmup result; its time is discarded
            else:
                best = min(best, dt)
        return ds, best

    ds, t_feat = timed_ingest("xla")  # parity mode: the headline pipeline
    _, t_feat_bf16 = timed_ingest("pallas_bf16")

    # ---- timed: functional featurization (gemaps + emobase), warm ----
    # the production path: one device program computes both sets per chunk
    from sept_tpu.ops.emobase import combined_functionals_batch

    sub = {k: waves[k] for k in list(waves)[:128]}
    combined_functionals_batch(sub)  # warm the (one) bucket shape
    t_func = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        combined_functionals_batch(waves)
        t_func = min(t_func, time.perf_counter() - t0)

    # ---- model setup (slow-transfer mode starts here; all remaining
    # stages run on device-resident data) ----
    from sept_tpu.models import Conv2dBiRNN
    from sept_tpu.train import (
        ExperimentConfig,
        init_state,
        make_epoch_runner,
        make_optimizer,
    )

    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-4,
                           hidden_size=64, batch_size=BATCH)
    model = Conv2dBiRNN(hidden_size=64, pred="emotion")
    tx = make_optimizer(cfg, steps_per_epoch=64)
    dummy = {
        "spec": jnp.zeros((BATCH, WIN, D, 1), jnp.float32),
        "labels_emo": jnp.zeros((BATCH,), jnp.int32),
        "labels_gen": jnp.zeros((BATCH,), jnp.int32),
        "global": jnp.zeros((BATCH, 88), jnp.float32),
        "weight": jnp.ones((BATCH,), jnp.float32),
    }
    state = init_state(model, tx, jax.random.PRNGKey(8), dummy)

    # ---- timed: one training epoch as a single scanned device program ----
    m_total = len(ds)
    n_batches = m_total // BATCH
    order = jnp.asarray(np.random.default_rng(0).permutation(m_total))
    run_epoch = make_epoch_runner(model, tx)
    out = run_epoch(state, ds.windows, ds.labels_emo, ds.weight, order,
                    n_batches=n_batches, batch_size=BATCH)  # warmup
    jax.block_until_ready(out[0].params)
    t_train = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state, losses, correct, counts = run_epoch(
            state, ds.windows, ds.labels_emo, ds.weight, order,
            n_batches=n_batches, batch_size=BATCH,
        )
        jax.block_until_ready(state.params)
        t_train = min(t_train, time.perf_counter() - t0)

    # MFU: XLA-counted FLOPs of ONE train step x n_batches / elapsed / peak.
    # (cost_analysis on the scanned epoch counts the scan body once, not
    # x n_batches, so the per-step program is the honest FLOP source.)
    flops = None
    try:
        from sept_tpu.train import make_baseline_step

        step = make_baseline_step(model, tx)
        cost = step.lower(state, dummy).compile().cost_analysis()
        if cost and cost.get("flops"):
            flops = float(cost["flops"]) * n_batches
    except Exception:
        pass

    # ---- timed: the same epoch with bf16 conv/RNN compute (params f32) ----
    # TPU throughput mode (models/backbone.py dtype knob): MXU runs bf16
    # 2x f32 rate; reported as detail, the headline stays the parity mode.
    model_bf16 = Conv2dBiRNN(hidden_size=64, pred="emotion", dtype=jnp.bfloat16)
    state_bf16 = init_state(model_bf16, tx, jax.random.PRNGKey(8), dummy)
    run_epoch_bf16 = make_epoch_runner(model_bf16, tx)
    out = run_epoch_bf16(state_bf16, ds.windows, ds.labels_emo, ds.weight, order,
                         n_batches=n_batches, batch_size=BATCH)  # warmup
    jax.block_until_ready(out[0].params)
    t_train_bf16 = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = run_epoch_bf16(state_bf16, ds.windows, ds.labels_emo,
                             ds.weight, order,
                             n_batches=n_batches, batch_size=BATCH)
        jax.block_until_ready(out[0].params)
        t_train_bf16 = min(t_train_bf16, time.perf_counter() - t0)

    # ---- timed: the bf16 epoch with the fused first-conv-block kernels ----
    # (ops/pallas_conv.py; what --conv_backend auto resolves to in this
    # configuration — the layout-copy traffic around XLA's pool lowering is
    # the top line of the step profile, docs/ARCHITECTURE.md §2c)
    model_fused = Conv2dBiRNN(hidden_size=64, pred="emotion",
                              dtype=jnp.bfloat16, conv_backend="fused1")
    state_fused = init_state(model_fused, tx, jax.random.PRNGKey(8), dummy)
    run_epoch_fused = make_epoch_runner(model_fused, tx)
    out = run_epoch_fused(state_fused, ds.windows, ds.labels_emo, ds.weight,
                          order, n_batches=n_batches, batch_size=BATCH)
    jax.block_until_ready(out[0].params)
    t_train_fused = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = run_epoch_fused(state_fused, ds.windows, ds.labels_emo,
                              ds.weight, order,
                              n_batches=n_batches, batch_size=BATCH)
        jax.block_until_ready(out[0].params)
        t_train_fused = min(t_train_fused, time.perf_counter() - t0)

    # headline = parity-mode featurize + bf16-compute training epoch with
    # the fused conv kernels: the production configuration
    # (--compute_dtype bfloat16 --conv_backend auto, f32 params and
    # accumulation; bf16 SER quality validated on the hard benchmark corpus
    # at mean 5-fold UAR 0.884 vs 0.897 f32 — within fold-to-fold spread).
    # The full f32 and XLA-backend numbers stay in detail.
    total = t_feat + t_train_fused
    utts_per_sec = N_UTTS / total

    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "reference_cpu.json")
    vs_baseline = None
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)
        vs_baseline = round(utts_per_sec / ref["utts_per_sec"], 2)

    print(json.dumps({
        "metric": "featurize+train utterances/sec/chip (2.5s utts, mel128 + "
                  "Conv2dBiRNN epoch, bf16 compute + fused conv kernels)",
        "value": round(utts_per_sec, 2),
        "unit": "utt/s/chip",
        "vs_baseline": vs_baseline,
        "detail": {
            "baseline": "reference pipeline, eager torch-CPU, 1 thread/1 core"
                        " (benchmarks/reference_cpu.json)",
            "mode": "parity-mode f32 featurize + bf16-compute train epoch "
                    "with fused first-conv-block Pallas kernels "
                    "(--compute_dtype bfloat16 --conv_backend auto; SER "
                    "quality validated, see README); f32 epoch in "
                    "train_epoch_s, XLA-backend bf16 in train_epoch_bf16_s",
            "utts_per_sec_f32": round(N_UTTS / (t_feat + t_train), 2),
            "n_utts": N_UTTS,
            "n_windows": int(m_total),
            "n_train_batches": int(n_batches),
            "featurize_s": round(t_feat, 3),
            "featurize_bf16_s": round(t_feat_bf16, 3),
            "train_epoch_s": round(t_train, 3),
            "train_epoch_bf16_s": round(t_train_bf16, 3),
            "train_epoch_fused_s": round(t_train_fused, 3),
            "mfu_vs_bf16_peak": (
                round(flops / t_train_fused / V5E_BF16_PEAK, 4)
                if flops is not None else None
            ),
            "mfu_bf16_xla_epoch": (
                round(flops / t_train_bf16 / V5E_BF16_PEAK, 4)
                if flops is not None else None
            ),
            "mfu_f32_epoch": (
                round(flops / t_train / V5E_BF16_PEAK, 4)
                if flops is not None else None
            ),
            "gemaps_emobase_s": round(t_func, 3),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()

"""Bytes-vs-FLOPs roofline of the training step (VERDICT r2 item 4).

Answers, with arithmetic instead of assertion, whether the Conv2dBiRNN
training epoch is HBM-bandwidth-bound on the v5e chip:

- FLOPs and bytes-accessed come from XLA's own cost model on the COMPILED
  per-step program (``.compile().cost_analysis()``), not hand counting.
- arithmetic intensity AI = flops / bytes; the v5e ridge point is
  peak_flops / peak_bw  (bf16: 197e12 / 8.19e11 ~ 240 FLOP/byte).
- bandwidth-floor time  t_bw  = bytes / 819 GB/s  and compute-floor time
  t_mxu = flops / peak; the measured step time against max(t_bw, t_mxu)
  says which wall we're near — and how near.  A measured time far above
  BOTH floors means the step is bound by neither peak (strided-copy
  effective bandwidth, VPU ops, or serialization), which is actionable
  information the raw MFU number hides.

Run on the chip:  python benchmarks/roofline.py
Prints one JSON line per mode (f32/xla, bf16/xla, bf16/fused1,
bf16/fused1+remat — four fresh compiles).

``--analytic`` needs NO chip: it prints the same floors from a
hand-counted bytes/FLOPs model of the step (documented inline) against
the round-2 measured step times, so the roofline conclusion is
reproducible arithmetic even when the hardware is away.  The on-chip
run supersedes it (XLA's cost model sees the program as compiled —
layout copies, fusion choices — which the hand count cannot).

``--batches 32 64 128`` additionally sweeps the production mode
(bf16/fused1) over batch sizes at a fixed total utterance count — the
VERDICT-r2 headroom probe: if per-utterance time drops at batch 64/128,
the 32-batch epoch is paying per-step overhead (dispatch, layout
transitions) rather than sitting on the bandwidth floor; if it is flat,
bytes/utt rule and the batch knob is closed.  Each extra batch size costs
one fresh compile (minutes over a cold tunnel) — budget accordingly.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# runnable as `python benchmarks/roofline.py` from the repo root without an
# installed package (same convention as serving_bench.py / privacy_demo.py)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12   # FLOP/s
V5E_F32_PEAK = 49e12     # FLOP/s (MXU f32 rate is 1/4 the bf16 rate)
V5E_HBM_BW = 819e9       # bytes/s

WIN, D, BATCH, N_BATCHES = 200, 128, 32, 64

# Round-2 measured step times (ms; 64-step scanned epoch, batch 32, chip,
# 2026-08-17 — see docs/ARCHITECTURE.md "Training-epoch anatomy").
MEASURED_STEP_MS = {"f32_xla": 12.6, "bf16_xla": 9.29, "bf16_fused1": 6.79}


def analytic():
    """Hand-counted bytes/FLOPs floors vs the round-2 measured step times.

    The byte model is deliberately a LOWER bound: every major activation
    of Conv2dBiRNN (conv/pool outputs, RNN in/out) is charged 4 touches —
    forward write, backward read, cotangent write, cotangent read —
    i.e. each tensor crosses HBM exactly once per role, with perfect
    fusion of everything elementwise.  Parameters (<1 M) are noise at
    batch 32.  Layout copies, select-and-scatter scratch, and any
    re-reads XLA actually emits come ON TOP of this floor, which is the
    point: if the measured step already sits far above the floor, those
    extras (not the pin rate, not the MXU) are what binds.
    """
    B = BATCH
    acts = {  # forward activation element counts, standard 200x128 window
        "input": B * 200 * 128,
        "conv0": B * 200 * 128 * 32,
        "pool0": B * 100 * 64 * 32,
        "conv1": B * 100 * 64 * 64,
        "pool1": B * 50 * 32 * 64,
        "conv2": B * 50 * 32 * 128,
        "pool2": B * 25 * 16 * 128,
        "rnn_in": B * 25 * 2048,
        "rnn_out": B * 25 * 128,
    }
    elems = sum(acts.values())  # 59.9 M elements

    def conv_flops(kh, kw, cin, cout, oh, ow):
        return kh * kw * cin * cout * oh * ow * 2 * B

    def bigru_flops(d_in, h, t):
        return 3 * (d_in * h + h * h) * 2 * t * 2 * B  # x2 directions

    fwd = (conv_flops(5, 5, 1, 32, 200, 128)
           + conv_flops(5, 5, 32, 64, 100, 64)
           + conv_flops(5, 5, 64, 128, 50, 32)
           + bigru_flops(2048, 64, 25) + bigru_flops(128, 64, 25)
           + (128 * 128 + 128 * 4) * 2 * B)
    train_flops = 3 * fwd  # fwd + dW + dx

    for mode, t_ms in MEASURED_STEP_MS.items():
        f32 = mode.startswith("f32")
        byts = 4 * elems * (4 if f32 else 2)
        peak = V5E_F32_PEAK if f32 else V5E_BF16_PEAK
        t_bw = byts / V5E_HBM_BW
        t_mxu = train_flops / peak
        print(json.dumps({
            "mode": mode,
            "source": "analytic+round2-measured",
            "batch": BATCH,
            "step_ms_measured_r2": t_ms,
            "flops_per_step": train_flops,
            "bytes_per_step_floor": byts,
            "arith_intensity_flop_per_byte": round(train_flops / byts, 1),
            "ridge_flop_per_byte": round(peak / V5E_HBM_BW, 1),
            "t_bw_floor_ms": round(t_bw * 1e3, 2),
            "t_mxu_floor_ms": round(t_mxu * 1e3, 2),
            "pct_of_hbm_peak": round(100 * t_bw / (t_ms / 1e3), 1),
            "pct_of_mxu_peak": round(100 * t_mxu / (t_ms / 1e3), 1),
            "effective_gbps_on_floor_bytes": round(
                byts / (t_ms / 1e3) / 1e9, 1),
        }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[],
                    help="extra batch sizes to sweep in bf16/fused1 mode "
                    "(total utterances held at 64*32=2048)")
    ap.add_argument("--analytic", action="store_true",
                    help="print the hand-counted floors vs round-2 "
                    "measured step times; needs no accelerator")
    ap.add_argument("--skip_modes", action="store_true",
                    help="skip the four mode rows and run only the "
                    "--batches sweep (extending an earlier run without "
                    "re-paying the mode compiles)")
    args = ap.parse_args()
    if args.analytic:
        analytic()
        return
    batch_sweep = args.batches
    from sept_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from sept_tpu.models import Conv2dBiRNN
    from sept_tpu.train import (
        ExperimentConfig,
        init_state,
        make_baseline_step,
        make_epoch_runner,
        make_optimizer,
    )

    m_total = N_BATCHES * BATCH  # held fixed across the batch sweep
    windows = jnp.asarray(
        np.random.default_rng(8).standard_normal((m_total, WIN, D)),
        jnp.float32)
    labels = jnp.asarray(np.arange(m_total) % 4, jnp.int32)
    weights = jnp.ones(m_total)
    order = jnp.asarray(np.random.default_rng(0).permutation(m_total))

    def measure(name, kw, batch):
        n_batches = m_total // batch
        cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-4,
                               hidden_size=64, batch_size=batch)
        tx = make_optimizer(cfg, steps_per_epoch=n_batches)
        dummy = {
            "spec": jnp.zeros((batch, WIN, D, 1), jnp.float32),
            "labels_emo": jnp.zeros((batch,), jnp.int32),
            "labels_gen": jnp.zeros((batch,), jnp.int32),
            "global": jnp.zeros((batch, 88), jnp.float32),
            "weight": jnp.ones((batch,), jnp.float32),
        }
        model = Conv2dBiRNN(hidden_size=64, pred="emotion", **kw)
        state = init_state(model, tx, jax.random.PRNGKey(8), dummy)

        # XLA cost model on the compiled per-step program
        step = make_baseline_step(model, tx)
        cost = step.lower(state, dummy).compile().cost_analysis() or {}
        flops = float(cost.get("flops", 0.0))
        byts = float(cost.get("bytes accessed", 0.0))

        # measured epoch time (min of 3, warm)
        run = make_epoch_runner(model, tx)
        out = run(state, windows, labels, weights, order,
                  n_batches=n_batches, batch_size=batch)
        jax.block_until_ready(out[0].params)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(state, windows, labels, weights, order,
                      n_batches=n_batches, batch_size=batch)
            jax.block_until_ready(out[0].params)
            best = min(best, time.perf_counter() - t0)
        t_step = best / n_batches

        peak = V5E_F32_PEAK if name.startswith("f32") else V5E_BF16_PEAK
        t_bw = byts / V5E_HBM_BW if byts else None
        t_mxu = flops / peak if flops else None
        print(json.dumps({
            "mode": name,
            "batch": batch,
            "step_ms": round(t_step * 1e3, 3),
            "epoch_s": round(best, 3),
            "us_per_utt": round(best / m_total * 1e6, 1),
            "flops_per_step": flops,
            "bytes_per_step": byts,
            "arith_intensity_flop_per_byte": (
                round(flops / byts, 1) if byts else None),
            "ridge_flop_per_byte": round(peak / V5E_HBM_BW, 1),
            "t_bw_floor_ms": round(t_bw * 1e3, 3) if t_bw else None,
            "t_mxu_floor_ms": round(t_mxu * 1e3, 3) if t_mxu else None,
            "pct_of_hbm_peak": (
                round(100 * t_bw / t_step, 1) if t_bw else None),
            "pct_of_mxu_peak": (
                round(100 * t_mxu / t_step, 1) if t_mxu else None),
            "effective_gbps": (
                round(byts / t_step / 1e9, 1) if byts else None),
        }), flush=True)

    modes = [
        ("f32_xla", dict()),
        ("bf16_xla", dict(dtype=jnp.bfloat16)),
        ("bf16_fused1", dict(dtype=jnp.bfloat16, conv_backend="fused1")),
        # the roofline's top remaining lever (ARCHITECTURE §2b′): at ~10%
        # MXU occupancy, recomputing the encoder in the backward is nearly
        # free in FLOP-time and deletes the fwd->bwd HBM round-trips of
        # the two largest activations — measure whether XLA's actual
        # lowering realizes that saving
        ("bf16_fused1_remat", dict(dtype=jnp.bfloat16,
                                   conv_backend="fused1", remat=True)),
    ]
    if not args.skip_modes:
        for name, kw in modes:
            measure(name, kw, BATCH)
    for b in batch_sweep:
        if b != BATCH and m_total % b == 0:
            measure("bf16_fused1", dict(dtype=jnp.bfloat16,
                                        conv_backend="fused1"), b)
        else:
            print(json.dumps({"mode": "bf16_fused1", "batch": b,
                              "skipped": f"batch must divide {m_total} and "
                              f"differ from the base {BATCH}"}), flush=True)


if __name__ == "__main__":
    main()

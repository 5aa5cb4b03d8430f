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
is the MIN over repeats: the chip sits behind a shared tunnel whose
host<->device bandwidth varies run to run, and min-of-N measures pipeline
capability rather than transient tunnel contention.  Prints ONE JSON line.
BASELINE LABELING: vs_baseline is measured against
benchmarks/reference_cpu.json from the same machine — the reference
pipeline in eager torch on a SINGLE CPU core (this box has one core; the
reference repo publishes no numbers of its own, BASELINE.md).

BUDGET DISCIPLINE (the driver runs this under a hard timeout): the bench is
structured headline-first.  Only two stages are required to print a result —
the parity-mode ingest and the production (bf16 + fused-conv) training
epoch.  Every other variant (bf16 ingest, device functionals, f32 epoch,
bf16-XLA epoch, batch-128 throughput epoch, the MFU cost-analysis
lowering) is an EXTRA, run only while
wall-clock headroom remains against ``SEPT_BENCH_BUDGET_S`` (default 420 s)
and recorded in ``detail`` when it completes; skipped extras are listed in
``detail.skipped``.  Extras run on a TIGHT budget only when a previous
generous run completed them all and left ``.extras_seeded`` in the compile
cache (their programs are then provably cached; a first tunneled compile is
minutes long, blocking, and would starve the required headline stage).
A subprocess probe with a timeout guards against the
known tunnel-wedge failure mode (backend init hangs forever): if the chip is
unreachable the bench falls back to the CPU backend at a reduced size and
says so in ``detail.device_fallback`` rather than timing out with no output.
The persistent compile cache lives in the repo (``.jax_cache/``, see
cli/common.py::enable_compile_cache), so the driver's run reuses every
compile this checkout has already paid for.

STAGE ORDER MATTERS on this environment: loading/running the scanned-BiRNN
model executables flips the tunnel into a ~40x-slower host->device transfer
mode for the rest of the process (measured: device_put of 160 MB goes
0.12s -> 4.4s after init_state; pure on-device compute is unaffected).  All
transfer-bound stages (ingest, functionals) are therefore timed BEFORE any
model program — which is also the real pipeline order (featurize, then
train on device-resident arrays).

Also reported in ``detail``:
- mfu: model-FLOPs utilization of the training epoch against the v5e chip's
  197 TFLOP/s bf16 peak (XLA cost-analysis FLOPs / elapsed / peak);
- featurize_bf16_s: the fused Pallas bf16-throughput frontend
  (ops/pallas_frontend.py);
- gemaps_emobase_s: device functional featurization (88-dim eGeMAPS-style +
  988-dim emobase-style) for the same N utterances.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

V5E_BF16_PEAK = 197e12  # FLOP/s, one v5e chip
T0 = time.perf_counter()


def _probe_device(timeout_s: float) -> bool:
    """Backend init in a subprocess with a hard timeout.

    The tunneled chip's known failure mode is a wedge where backend init
    hangs indefinitely; there is no in-process recourse (the hang is inside
    C++ client bring-up, before any Python signal check).  Probing in a
    child process costs one extra init (~10 s warm) and buys a guaranteed
    answer."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); import jax.numpy as jnp; "
             "jnp.arange(4.).sum().block_until_ready()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False
    except Exception:
        return False


def _progress(msg: str) -> None:
    """Stage markers on stderr (stdout carries only the one JSON line)."""
    print(f"[bench +{time.perf_counter() - T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    budget = float(os.environ.get("SEPT_BENCH_BUDGET_S", "420"))
    deadline = T0 + budget

    def remaining() -> float:
        return deadline - time.perf_counter()

    skipped: list = []
    detail: dict = {}

    forced_cpu = os.environ.get("JAX_PLATFORMS", "").split(",")[0].strip() == "cpu"
    fallback = False
    if not forced_cpu:
        if not _probe_device(min(150.0, budget * 0.4)):
            fallback = True

    _progress(f"probe done: fallback={fallback} forced_cpu={forced_cpu}")
    import jax

    if forced_cpu:
        # one canonical env-driven pin implementation (cli.common)
        from sept_tpu.cli.common import pin_cpu_platform

        pin_cpu_platform()
    elif fallback:
        # probe-driven fallback: the env did NOT request CPU, so pin
        # explicitly here
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    # persistent compile cache: repeat bench runs (including the driver's)
    # skip the minutes-slow tunneled XLA compilation of every program here
    from sept_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    on_cpu = jax.default_backend() == "cpu"
    SR, DUR_S = 16000, 2.5
    N_UTTS = int(os.environ.get("SEPT_BENCH_N_UTTS", "64" if on_cpu else "1024"))
    WIN, SHIFT, D = 200, 50, 128
    BATCH = 32

    if fallback:
        detail["device_fallback"] = (
            "TPU backend init did not answer within the probe timeout "
            "(known tunnel-wedge mode); measured on the CPU backend at "
            f"n_utts={N_UTTS} instead — NOT a chip number"
        )

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

    REPEATS = 3
    # wall-clock reserved for the (required) headline epoch stage: a warm
    # compile load + 3 runs comfortably fits; a cold compile does not, but
    # a cold cache means the budget is lost either way and the epoch is the
    # headline — it must be attempted
    RESERVE_EPOCH = 120.0

    # ---- timed: on-device ingest (featurize + znorm + window, zero D2H) ----
    # FIRST, before any model executable exists (see module docstring).
    from sept_tpu.data.device_pipeline import device_ingest

    wave_list = [waves[k] for k in waves]
    spk = (np.arange(N_UTTS) % 16).astype(np.int32)
    labels = (np.arange(N_UTTS) % 4).astype(np.int32)

    def timed_ingest(frontend, reserve):
        """Warmup (compile) + up-to-REPEATS timed runs, stopping early if
        the budget reserve would be breached.  Returns (dataset, best_s,
        warmup_s)."""
        ds, best = None, float("inf")
        t0 = time.perf_counter()
        out = device_ingest(wave_list, spk, labels, labels % 2,
                            win_len=WIN, shift_len=SHIFT, frontend=frontend)
        jax.block_until_ready(out.windows)
        warm = time.perf_counter() - t0
        ds = out
        for _ in range(REPEATS):
            if best < float("inf") and remaining() < reserve:
                break
            t0 = time.perf_counter()
            out = device_ingest(wave_list, spk, labels, labels % 2,
                                win_len=WIN, shift_len=SHIFT,
                                frontend=frontend)
            jax.block_until_ready(out.windows)
            best = min(best, time.perf_counter() - t0)
        return ds, best, warm

    # Extras gating, decided BEFORE any compile.  Two facts shape it:
    # (1) round-2's warmup-wall-clock heuristic misfired on a degraded
    # tunnel (transfer time inflated the warmup) and silently dropped every
    # extra from a warm-cache driver run; (2) a merely NON-EMPTY cache dir
    # does not prove the EXTRAS' programs are cached — a headline-only run
    # seeds ingest+epoch but not featurize_bf16/functionals, whose first
    # tunneled compile is minutes long, blocking, and would starve the
    # required headline stage if attempted on a tight budget.  So:
    #   - generous budgets (onchip.sh seed runs) always attempt extras —
    #     that is what seeds their programs into the cache;
    #   - tight (driver) budgets attempt extras ONLY when a previous run
    #     completed every extra and left the .extras_seeded marker.
    generous = budget >= 900.0
    cache_dir = jax.config.jax_compilation_cache_dir
    marker = os.path.join(cache_dir, ".extras_seeded") if cache_dir else None
    extras_cached = bool(marker and os.path.exists(marker))
    cold = not generous and not extras_cached

    _progress(f"start ingest (n_utts={N_UTTS}, backend={jax.default_backend()}"
              f", cache={'cold' if cold else 'warm'})")
    ds, t_feat, warm_feat = timed_ingest("xla", RESERVE_EPOCH)
    _progress(f"ingest done: warm={warm_feat:.1f}s best={t_feat:.2f}s")
    # pathological warmup (minutes): the cache may be warm but the tunnel is
    # badly degraded — still bail on the extras and protect the headline
    cold = cold or warm_feat > 120.0

    # ---- extra: the fused Pallas bf16 frontend (transfer-bound => must
    # run before any model program, so it is gated hard) ----
    t_feat_bf16 = None
    if on_cpu:
        skipped.append("featurize_bf16:cpu_backend")
    elif cold:
        skipped.append("featurize_bf16:cold_cache")
    elif remaining() <= RESERVE_EPOCH + 90:
        skipped.append("featurize_bf16:budget")
    else:
        try:
            _progress("start bf16 ingest")
            _, t_feat_bf16, _ = timed_ingest("pallas_bf16",
                                             RESERVE_EPOCH + 60)
        except Exception:
            skipped.append("featurize_bf16:error")

    # ---- extra: functional featurization (gemaps + emobase), warm ----
    # the production path: one device program computes both sets per chunk
    t_func = None
    if cold:
        skipped.append("gemaps_emobase:cold_cache")
    elif remaining() <= RESERVE_EPOCH + 90:
        skipped.append("gemaps_emobase:budget")
    else:
        try:
            _progress("start functionals")
            from sept_tpu.ops.emobase import combined_functionals_batch

            sub = {k: waves[k] for k in list(waves)[:min(128, N_UTTS)]}
            combined_functionals_batch(sub)  # warm the (one) bucket shape
            t_func = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                combined_functionals_batch(waves)
                t_func = min(t_func, time.perf_counter() - t0)
                if remaining() < RESERVE_EPOCH + 30:
                    break
        except Exception:
            t_func = None
            skipped.append("gemaps_emobase:error")

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
    tx = make_optimizer(cfg, steps_per_epoch=64)

    def make_dummy(batch):
        return {
            "spec": jnp.zeros((batch, WIN, D, 1), jnp.float32),
            "labels_emo": jnp.zeros((batch,), jnp.int32),
            "labels_gen": jnp.zeros((batch,), jnp.int32),
            "global": jnp.zeros((batch, 88), jnp.float32),
            "weight": jnp.ones((batch,), jnp.float32),
        }

    dummy = make_dummy(BATCH)
    m_total = len(ds)
    n_batches = m_total // BATCH
    order = jnp.asarray(np.random.default_rng(0).permutation(m_total))

    def timed_epoch(model, reserve, batch=BATCH):
        """init + warmup (compile) + up-to-REPEATS timed epochs."""
        nb = m_total // batch
        state = init_state(model, tx, jax.random.PRNGKey(8),
                           make_dummy(batch))
        run_epoch = make_epoch_runner(model, tx)
        out = run_epoch(state, ds.windows, ds.labels_emo, ds.weight, order,
                        n_batches=nb, batch_size=batch)  # warmup
        jax.block_until_ready(out[0].params)
        best = float("inf")
        for _ in range(REPEATS):
            if best < float("inf") and remaining() < reserve:
                break
            t0 = time.perf_counter()
            out = run_epoch(state, ds.windows, ds.labels_emo, ds.weight,
                            order, n_batches=nb, batch_size=batch)
            jax.block_until_ready(out[0].params)
            best = min(best, time.perf_counter() - t0)
        return state, best

    # ---- chip-unreachable fallback: featurize-only ----
    # measured on this host: the scanned-epoch XLA:CPU compile alone takes
    # >30 min on one core, so a cold CPU fallback can never print a train
    # number inside any driver budget.  Report the honest thing that DOES
    # fit — featurize-only throughput — and say so in the metric string.
    if fallback:
        val = N_UTTS / t_feat
        detail.update({
            "n_utts": N_UTTS,
            "featurize_s": round(t_feat, 3),
            "gemaps_emobase_s": (round(t_func, 3)
                                 if t_func is not None else None),
            "device": str(jax.devices()[0]),
            "budget_s": budget,
            "elapsed_s": round(time.perf_counter() - T0, 1),
            "skipped": skipped + ["train_epoch:chip_unreachable"],
        })
        print(json.dumps({
            "metric": "FEATURIZE-ONLY utterances/sec, CPU-fallback (TPU "
                      "unreachable at bench time) — NOT the headline "
                      "featurize+train chip metric",
            "value": round(val, 2),
            "unit": "utt/s (cpu, featurize only)",
            "vs_baseline": None,
            "detail": detail,
        }))
        return

    # ---- timed (HEADLINE): the production training epoch ----
    # bf16 conv/RNN compute (f32 params/accumulation) + the fused
    # first-conv-block Pallas kernel pair (ops/pallas_conv.py) — what
    # --compute_dtype bfloat16 --conv_backend auto resolves to on TPU.
    # bf16 SER quality is validated on the hard benchmark corpus at mean
    # 5-fold UAR 0.884 vs 0.897 f32, within fold-to-fold spread (README).
    # On the CPU fallback the Pallas pair runs in interpret mode (slow, not
    # representative), so the fallback headline uses the XLA f32 model.
    if on_cpu:
        headline_model = Conv2dBiRNN(hidden_size=64, pred="emotion")
        headline_mode = "f32 XLA featurize+epoch on the CPU backend"
    else:
        headline_model = Conv2dBiRNN(hidden_size=64, pred="emotion",
                                     dtype=jnp.bfloat16,
                                     conv_backend="fused1")
        headline_mode = ("parity-mode f32 featurize + bf16-compute train "
                         "epoch with fused first-conv-block Pallas kernels "
                         "(--compute_dtype bfloat16 --conv_backend auto)")
    _progress("start headline epoch")
    state_head, t_train_head = timed_epoch(headline_model, 20.0)
    _progress(f"headline epoch done: {t_train_head:.2f}s")

    # ---- the headline is now measurable; everything below is extra ----
    total = t_feat + t_train_head
    utts_per_sec = N_UTTS / total

    # extra: f32 epoch (the full-parity mode)
    t_train = None
    if on_cpu:
        pass  # the CPU headline IS the f32 epoch
    elif cold:
        skipped.append("train_epoch_f32:cold_cache")
    elif remaining() <= 90:
        skipped.append("train_epoch_f32:budget")
    else:
        try:
            _progress("start f32 epoch")
            _, t_train = timed_epoch(Conv2dBiRNN(hidden_size=64,
                                                 pred="emotion"), 45.0)
        except Exception:
            skipped.append("train_epoch_f32:error")

    # extra: bf16 epoch with the plain XLA conv lowering
    t_train_bf16 = None
    if on_cpu:
        skipped.append("train_epoch_bf16_xla:cpu_backend")
    elif cold:
        skipped.append("train_epoch_bf16_xla:cold_cache")
    elif remaining() <= 90:
        skipped.append("train_epoch_bf16_xla:budget")
    else:
        try:
            _progress("start bf16-xla epoch")
            _, t_train_bf16 = timed_epoch(
                Conv2dBiRNN(hidden_size=64, pred="emotion",
                            dtype=jnp.bfloat16), 45.0)
        except Exception:
            skipped.append("train_epoch_bf16_xla:error")

    # extra: the batch-128 throughput mode (same production model; the
    # on-chip batch sweep's knee — docs/ARCHITECTURE.md §2b′: 168.5 µs/utt
    # at b32 -> 120.9 at b128).  Batch 32 is the reference protocol so the
    # HEADLINE keeps it; this records what --batch_size 128 buys when
    # trajectory parity doesn't matter.
    t_train_b128 = None
    if on_cpu:
        skipped.append("train_epoch_b128:cpu_backend")
    elif cold:
        skipped.append("train_epoch_b128:cold_cache")
    elif (m_total // 128) * 128 != m_total or m_total // 128 == 0:
        # a partial epoch would train fewer windows than the headline's,
        # inflating utts/sec; only measure when every window fits
        skipped.append("train_epoch_b128:n_windows_not_divisible")
    elif remaining() <= (90 if extras_cached else 300):
        # with the .extras_seeded marker every extra's program (including
        # this one) is cached, so a 90 s reserve suffices; without it the
        # first tunneled compile is unbounded — require generous headroom
        # (onchip.sh seed runs), never the driver's tight budget
        skipped.append("train_epoch_b128:budget")
    else:
        try:
            _progress("start b128 epoch")
            _, t_train_b128 = timed_epoch(headline_model, 45.0, batch=128)
        except Exception:
            skipped.append("train_epoch_b128:error")

    # extra: MFU — XLA-counted FLOPs of ONE train step x n_batches /
    # elapsed / peak.  (cost_analysis on the scanned epoch counts the scan
    # body once, not x n_batches, so the per-step program is the honest
    # FLOP source.)  This is a fresh lowering+compile: budget-gated.
    flops = None
    if cold:
        skipped.append("mfu_lowering:cold_cache")
    elif remaining() <= 60:
        skipped.append("mfu_lowering:budget")
    else:
        try:
            _progress("start mfu lowering")
            from sept_tpu.train import make_baseline_step

            model_f32 = Conv2dBiRNN(hidden_size=64, pred="emotion")
            state_f32 = init_state(model_f32, tx, jax.random.PRNGKey(8),
                                   dummy)
            step = make_baseline_step(model_f32, tx)
            cost = step.lower(state_f32, dummy).compile().cost_analysis()
            if cost and cost.get("flops"):
                flops = float(cost["flops"]) * n_batches
        except Exception:
            skipped.append("mfu_lowering:error")

    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "reference_cpu.json")
    vs_baseline = None
    # vs_baseline compares the CHIP pipeline to the torch-CPU reference;
    # a forced-CPU diagnostics run is neither, so it reports no ratio
    if not on_cpu and os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)
        vs_baseline = round(utts_per_sec / ref["utts_per_sec"], 2)

    detail.update({
        "baseline": "reference pipeline, eager torch-CPU, 1 thread/1 core"
                    " (benchmarks/reference_cpu.json)",
        "mode": headline_mode,
        "n_utts": N_UTTS,
        "n_windows": int(m_total),
        "n_train_batches": int(n_batches),
        "featurize_s": round(t_feat, 3),
        "featurize_warmup_s": round(warm_feat, 3),
        "featurize_bf16_s": (round(t_feat_bf16, 3)
                             if t_feat_bf16 is not None else None),
        "train_epoch_headline_s": round(t_train_head, 3),
        "train_epoch_f32_s": (round(t_train, 3)
                              if t_train is not None else None),
        "train_epoch_bf16_xla_s": (round(t_train_bf16, 3)
                                   if t_train_bf16 is not None else None),
        "train_epoch_b128_s": (round(t_train_b128, 3)
                               if t_train_b128 is not None else None),
        "utts_per_sec_b128": (round(N_UTTS / (t_feat + t_train_b128), 2)
                              if t_train_b128 is not None else None),
        "utts_per_sec_f32": (round(N_UTTS / (t_feat + t_train), 2)
                             if t_train is not None else None),
        "mfu_vs_bf16_peak": (round(flops / t_train_head / V5E_BF16_PEAK, 4)
                             if flops is not None else None),
        "mfu_f32_epoch": (round(flops / t_train / V5E_BF16_PEAK, 4)
                          if flops is not None and t_train is not None
                          else None),
        "gemaps_emobase_s": round(t_func, 3) if t_func is not None else None,
        "device": str(jax.devices()[0]),
        "budget_s": budget,
        "elapsed_s": round(time.perf_counter() - T0, 1),
        "skipped": skipped,
    })

    # every extra completed on the chip: all of their programs are now in
    # the persistent cache, so tight-budget (driver) runs may attempt them
    if not on_cpu and not skipped and marker:
        try:
            open(marker, "w").close()
        except OSError:
            pass

    if on_cpu:
        why = ("forced via JAX_PLATFORMS=cpu" if forced_cpu
               else "accelerator probe failed; fell back to CPU" if fallback
               else "no accelerator registered on this host")
        metric = ("featurize+train utterances/sec on the CPU BACKEND "
                  f"({why}; f32, no fused kernels) — NOT the chip headline")
        unit = "utt/s (cpu)"
    else:
        metric = ("featurize+train utterances/sec/chip (2.5s utts, mel128 +"
                  " Conv2dBiRNN epoch, bf16 compute + fused conv kernels)")
        unit = "utt/s/chip"
    print(json.dumps({
        "metric": metric,
        "value": round(utts_per_sec, 2),
        "unit": unit,
        "vs_baseline": vs_baseline,
        "detail": detail,
    }))


if __name__ == "__main__":
    main()

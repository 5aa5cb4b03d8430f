"""Headline benchmark: featurize+train utterances/sec on one TPU chip.

Workload (matched to benchmarks/reference_cpu.py, the faithful torch-CPU
re-creation of the reference pipeline):

- featurize N 2.5-s utterances (mel spectrogram n_fft=800/hop 160/128 mels,
  dB) — here as one batched, jitted MXU GEMM chain instead of the
  reference's per-utterance CPU loop;
- window to (2N, 200, 128) with stride 50;
- one 64-batch training epoch of the Conv2dBiRNN workhorse (SGD momentum,
  batch 32) as one scanned device program
  (/root/reference/training/training_adversary_baselines.py:156-187).

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
headline-first.  Only two stages are required to print a result — the
parity-mode ingest and the production (bf16 + fused-conv) training epoch.
The EXTRAS (MFU, f32 epoch, bf16-XLA epoch, batch-128 epoch) are gated on
measured per-extra worst-case COLD costs (2026-08-20 on-chip session:
shared init_state 13 s f32 / 62 s fused1, epoch compiles 16-24 s per
variant, bf16-XLA up to 88 s, MFU step lowering 17 s) against the
remaining ``SEPT_BENCH_BUDGET_S`` (default 420 s) — a fully COLD cache
fits every extra inside the default budget, so there is no cold-cache
gating or seed-marker machinery anymore.

THE DEADLINE IS ENFORCED EVERYWHERE, including on the required stages
(round-4 driver run: the shared-init -> headline compile path alone took
~1045 s on a degraded tunnel and blew a 420 s budget with nothing to show
for it).  Two mechanisms:

- before each required stage the bench checks ``remaining()`` and, if the
  stage cannot fit, emits the JSON with what exists (an honest
  ``headline:budget`` skip beats a stale headline);
- a WATCHDOG daemon thread emits the best-known partial JSON and
  ``os._exit(0)``s at ``deadline - 15 s`` if the final JSON has not been
  printed — this fires even when the main thread is wedged inside a C++
  XLA compile (the degraded-tunnel mode), where no in-Python check can
  run.  Every stage updates the watchdog's payload first, so whatever was
  measured before the wedge is reported with ``<stage>:watchdog`` in
  ``skipped``.

``detail.stages`` records warmup (compile+first-run) vs best steady-state
seconds PER STAGE, so a headline swing between rounds is attributable from
the artifact alone (slow tunnel = warmup blows up, slow code = best run
moves).  MFU is emitted BEFORE the other extras: it only needs one step
lowering of the already-initialized f32 model.

Three design choices keep a fully cold cache inside the default budget:

- ONE ``init_state`` is shared by every epoch variant (the f32 / bf16 /
  fused-conv models have identical param trees, values, and dtypes — only
  the apply path differs), so the expensive fused-kernel init program is
  never compiled;
- MFU comes from ``cost_analysis`` on the ALREADY-COMPILED per-step
  program lowering (a persistent-cache hit after the epoch ran; the
  scanned epoch counts its scan body once, so the step program is the
  honest FLOP source);
- the two HAZARD stages — the fused-Pallas bf16 ingest and the
  gemaps/emobase functionals — run only on generous budgets
  (>= 900 s, tools/onchip.sh): the functionals executables have been
  observed to stall for many minutes on a degraded tunnel EVEN WARM
  (BENCH_r03: 459 s; 2026-08-20 repro: > 9.5 min), and a stall inside the
  driver's budget would starve the required stages.  Their steady-state
  numbers live in the committed benchmarks/functionals_onchip.json.

A subprocess probe with a timeout guards against the known tunnel-wedge
failure mode (backend init hangs forever): if the chip is unreachable the
bench falls back to the CPU backend at a reduced size and says so in
``detail.device_fallback`` rather than timing out with no output.
The persistent compile cache lives in the repo (``.jax_cache/``, see
cli/common.py::enable_compile_cache); warm runs skip every compile.

STAGE ORDER MATTERS on this environment: loading/running the scanned-BiRNN
model executables flips the tunnel into a ~40x-slower host->device transfer
mode for the rest of the process (measured: device_put of 160 MB goes
0.12s -> 4.4s after init_state; pure on-device compute is unaffected).  All
transfer-bound stages (ingest, and on generous budgets the bf16 ingest +
functionals) are therefore timed BEFORE any model program — which is also
the real pipeline order (featurize, then train on device-resident arrays).

Also reported in ``detail``: mfu_vs_bf16_peak (XLA-counted model FLOPs of
the epoch against the v5e chip's 197 TFLOP/s bf16 peak), per-variant epoch
seconds, and on generous budgets featurize_bf16_s / gemaps_emobase_s.
"""

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

V5E_BF16_PEAK = 197e12  # FLOP/s, one v5e chip
T0 = time.perf_counter()

_PRINT_LOCK = threading.Lock()
_PRINTED = False


def print_json_once(obj) -> bool:
    """Print the ONE stdout JSON line exactly once (main thread and the
    watchdog race for it; whoever gets here first wins)."""
    global _PRINTED
    with _PRINT_LOCK:
        if _PRINTED:
            return False
        _PRINTED = True
        print(json.dumps(obj), flush=True)
        return True


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
    stages: dict = {}  # per-stage {"warmup_s": compile+first run, "best_s"}
    detail["stages"] = stages

    # ---- watchdog: hard stop at deadline - 15 s, firing even when the
    # main thread is wedged inside a C++ XLA compile (degraded tunnel) ----
    wd = {"stage": "startup", "t_feat": None, "t_train_head": None,
          "n_utts": None, "headline_metric": None, "headline_unit": None,
          "ref_utts_per_sec": None}

    def _watchdog_fire():
        det = dict(detail)
        det["budget_s"] = budget
        det["elapsed_s"] = round(time.perf_counter() - T0, 1)
        det["skipped"] = list(skipped) + [f"{wd['stage']}:watchdog"]
        n = wd["n_utts"]
        if wd["t_train_head"] is not None:
            val = n / (wd["t_feat"] + wd["t_train_head"])
            metric, unit = wd["headline_metric"], wd["headline_unit"]
            vs = (round(val / wd["ref_utts_per_sec"], 2)
                  if wd["ref_utts_per_sec"] else None)
        elif wd["t_feat"] is not None:
            val = round(n / wd["t_feat"], 2)
            metric = ("FEATURIZE-ONLY utterances/sec — watchdog cut the run "
                      f"during '{wd['stage']}' before the headline epoch "
                      "completed (budget exhausted; degraded tunnel?) — NOT "
                      "the headline featurize+train chip metric")
            unit, vs = "utt/s (featurize only)", None
        else:
            val, vs = None, None
            metric = (f"no stage completed before the watchdog deadline "
                      f"(cut during '{wd['stage']}')")
            unit = ""
        if print_json_once({"metric": metric,
                            "value": round(val, 2) if val else val,
                            "unit": unit, "vs_baseline": vs,
                            "detail": det}):
            sys.stdout.flush()
            os._exit(0)

    watchdog = threading.Timer(
        max(5.0, budget - (time.perf_counter() - T0) - 15.0), _watchdog_fire)
    watchdog.daemon = True
    watchdog.start()

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
    # skip the tunneled XLA compilation of every program here
    from sept_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    on_cpu = jax.default_backend() == "cpu"
    SR, DUR_S = 16000, 2.5
    N_UTTS = int(os.environ.get("SEPT_BENCH_N_UTTS", "64" if on_cpu else "1024"))
    WIN, SHIFT, D = 200, 50, 128
    BATCH = 32
    generous = budget >= 900.0  # tools/onchip.sh runs; hazard stages allowed

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
    # wall-clock reserved for the (required) headline epoch stage: the
    # shared f32 init (~13 s cold) + fused epoch compile (~24 s) + runs
    RESERVE_EPOCH = 110.0

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

    wd["n_utts"] = N_UTTS
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "reference_cpu.json")
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            wd["ref_utts_per_sec"] = json.load(f)["utts_per_sec"]

    _progress(f"start ingest (n_utts={N_UTTS}, backend={jax.default_backend()}"
              f", budget={budget:.0f}s)")
    wd["stage"] = "ingest"
    ds, t_feat, warm_feat = timed_ingest("xla", RESERVE_EPOCH)
    stages["ingest"] = {"warmup_s": round(warm_feat, 3),
                        "best_s": round(t_feat, 3)}
    wd["t_feat"] = t_feat
    _progress(f"ingest done: warm={warm_feat:.1f}s best={t_feat:.2f}s")

    # ---- HAZARD extras: generous budgets only (see module docstring);
    # transfer-bound => must run before any model program ----
    t_feat_bf16 = None
    if not on_cpu and generous and remaining() > RESERVE_EPOCH + 120:
        try:
            _progress("start bf16 ingest (generous budget)")
            wd["stage"] = "featurize_bf16"
            _, t_feat_bf16, warm_bf16 = timed_ingest("pallas_bf16",
                                                     RESERVE_EPOCH + 60)
            stages["featurize_bf16"] = {"warmup_s": round(warm_bf16, 3),
                                        "best_s": round(t_feat_bf16, 3)}
        except Exception:
            skipped.append("featurize_bf16:error")

    t_func = None
    if not on_cpu and generous and remaining() > RESERVE_EPOCH + 180:
        try:
            _progress("start functionals (generous budget)")
            wd["stage"] = "functionals"
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

    model_f32 = Conv2dBiRNN(hidden_size=64, pred="emotion")

    def emit_featurize_only(reason: str):
        """Honest partial result when the budget dies before the headline:
        featurize-only throughput with a ``headline:<reason>`` skip."""
        detail.update({
            "n_utts": N_UTTS,
            "featurize_s": round(t_feat, 3),
            "featurize_warmup_s": round(warm_feat, 3),
            "device": str(jax.devices()[0]),
            "budget_s": budget,
            "elapsed_s": round(time.perf_counter() - T0, 1),
            "skipped": skipped + [f"headline:{reason}"],
        })
        print_json_once({
            "metric": "FEATURIZE-ONLY utterances/sec — budget exhausted "
                      f"before the headline epoch ({reason}) — NOT the "
                      "headline featurize+train chip metric",
            "value": round(N_UTTS / t_feat, 2),
            "unit": "utt/s (featurize only)",
            "vs_baseline": None,
            "detail": detail,
        })
        watchdog.cancel()

    # required-stage deadline check: shared f32 init ~13 s cold + headline
    # epoch compile ~24 s cold + runs; below 75 s the pair cannot fit
    if not fallback and remaining() < 75:
        emit_featurize_only("budget")
        return

    # ONE init serves every variant: the f32/bf16/fused models share
    # identical param trees, values, and dtypes (f32 params; compute dtype
    # and conv backend only change the apply path), and the f32 init
    # program is the cheapest to compile (13 s vs 62 s for the fused one).
    _progress("init state (shared across variants)")
    wd["stage"] = "init_state"
    t0 = time.perf_counter()
    state0 = init_state(model_f32, tx, jax.random.PRNGKey(8), dummy)
    jax.block_until_ready(state0.params)
    stages["init_state"] = {"warmup_s": round(time.perf_counter() - t0, 3)}

    def timed_epoch(model, reserve, batch=BATCH):
        """warmup (compile+first run) + up-to-REPEATS timed epochs on the
        shared state.  Returns (best steady-state s, warmup s)."""
        nb = m_total // batch
        run_epoch = make_epoch_runner(model, tx)
        t0 = time.perf_counter()
        out = run_epoch(state0, ds.windows, ds.labels_emo, ds.weight, order,
                        n_batches=nb, batch_size=batch)  # warmup
        jax.block_until_ready(out[0].params)
        warm = time.perf_counter() - t0
        best = float("inf")
        for _ in range(REPEATS):
            if best < float("inf") and remaining() < reserve:
                break
            t0 = time.perf_counter()
            out = run_epoch(state0, ds.windows, ds.labels_emo, ds.weight,
                            order, n_batches=nb, batch_size=batch)
            jax.block_until_ready(out[0].params)
            best = min(best, time.perf_counter() - t0)
        return best, warm

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
            "device": str(jax.devices()[0]),
            "budget_s": budget,
            "elapsed_s": round(time.perf_counter() - T0, 1),
            "skipped": skipped + ["train_epoch:chip_unreachable"],
        })
        print_json_once({
            "metric": "FEATURIZE-ONLY utterances/sec, CPU-fallback (TPU "
                      "unreachable at bench time) — NOT the headline "
                      "featurize+train chip metric",
            "value": round(val, 2),
            "unit": "utt/s (cpu, featurize only)",
            "vs_baseline": None,
            "detail": detail,
        })
        watchdog.cancel()
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
        headline_model = model_f32
        headline_mode = "f32 XLA featurize+epoch on the CPU backend"
        wd["headline_metric"] = (
            "featurize+train utterances/sec on the CPU BACKEND — NOT the "
            "chip headline")
        wd["headline_unit"] = "utt/s (cpu)"
    else:
        headline_model = Conv2dBiRNN(hidden_size=64, pred="emotion",
                                     dtype=jnp.bfloat16,
                                     conv_backend="fused1")
        headline_mode = ("parity-mode f32 featurize + bf16-compute train "
                         "epoch with fused first-conv-block Pallas kernels "
                         "(--compute_dtype bfloat16 --conv_backend auto)")
        wd["headline_metric"] = (
            "featurize+train utterances/sec/chip (2.5s utts, mel128 + "
            "Conv2dBiRNN epoch, bf16 compute + fused conv kernels)")
        wd["headline_unit"] = "utt/s/chip"
    if remaining() < 40:
        emit_featurize_only("budget")
        return
    _progress("start headline epoch")
    wd["stage"] = "headline_epoch"
    t_train_head, warm_head = timed_epoch(headline_model, 20.0)
    stages["headline_epoch"] = {"warmup_s": round(warm_head, 3),
                                "best_s": round(t_train_head, 3)}
    wd["t_train_head"] = t_train_head
    _progress(f"headline epoch done: warm={warm_head:.1f}s "
              f"best={t_train_head:.2f}s")

    # ---- the headline is now measurable; everything below is extra ----
    total = t_feat + t_train_head
    utts_per_sec = N_UTTS / total

    # Extras — MFU FIRST (cheapest, and the longest-standing null in the
    # driver artifacts: it needs only one step lowering of the
    # already-initialized f32 model), then cheapest-compile-first so a
    # shrinking budget drops the most expensive one (bf16-XLA) first.
    # Reserves = measured worst-case cold cost + final-JSON margin.

    # extra: MFU — XLA-counted FLOPs of ONE train step x n_batches /
    # elapsed / peak.  (cost_analysis on the scanned epoch counts the scan
    # body once, not x n_batches, so the per-step program is the honest
    # FLOP source; the f32 lowering is used because XLA counts conv FLOPs
    # there, while the fused-Pallas custom calls report none.)
    flops = None
    if remaining() <= 45:
        skipped.append("mfu_lowering:budget")
    else:
        try:
            _progress("start mfu lowering")
            wd["stage"] = "mfu_lowering"
            from sept_tpu.train import make_baseline_step

            t0 = time.perf_counter()
            step = make_baseline_step(model_f32, tx)
            cost = step.lower(state0, dummy).compile().cost_analysis()
            stages["mfu_lowering"] = {
                "warmup_s": round(time.perf_counter() - t0, 3)}
            if cost and cost.get("flops"):
                flops = float(cost["flops"]) * n_batches
        except Exception:
            skipped.append("mfu_lowering:error")

    # extra: f32 epoch (the full-parity mode)
    t_train = None
    if on_cpu:
        t_train = t_train_head  # the CPU headline IS the f32 epoch
    elif remaining() <= 90:
        skipped.append("train_epoch_f32:budget")
    else:
        try:
            _progress("start f32 epoch")
            wd["stage"] = "train_epoch_f32"
            t_train, warm_f32 = timed_epoch(model_f32, 45.0)
            stages["train_epoch_f32"] = {"warmup_s": round(warm_f32, 3),
                                         "best_s": round(t_train, 3)}
        except Exception:
            skipped.append("train_epoch_f32:error")

    # extra: the batch-128 throughput mode (same production model; the
    # on-chip batch sweep's knee — docs/ARCHITECTURE.md §2b′: 168.5 µs/utt
    # at b32 -> 120.9 at b128).  Batch 32 is the reference protocol so the
    # HEADLINE keeps it; this records what --batch_size 128 buys when
    # trajectory parity doesn't matter.
    t_train_b128 = None
    if on_cpu:
        skipped.append("train_epoch_b128:cpu_backend")
    elif (m_total // 128) * 128 != m_total or m_total // 128 == 0:
        # a partial epoch would train fewer windows than the headline's,
        # inflating utts/sec; only measure when every window fits
        skipped.append("train_epoch_b128:n_windows_not_divisible")
    elif remaining() <= 70:
        skipped.append("train_epoch_b128:budget")
    else:
        try:
            _progress("start b128 epoch")
            wd["stage"] = "train_epoch_b128"
            t_train_b128, warm_b128 = timed_epoch(headline_model, 45.0,
                                                  batch=128)
            stages["train_epoch_b128"] = {
                "warmup_s": round(warm_b128, 3),
                "best_s": round(t_train_b128, 3)}
        except Exception:
            skipped.append("train_epoch_b128:error")

    # extra: bf16 epoch with the plain XLA conv lowering (the most
    # expensive cold compile of the set: up to ~88 s measured)
    t_train_bf16 = None
    if on_cpu:
        skipped.append("train_epoch_bf16_xla:cpu_backend")
    elif remaining() <= 130:
        skipped.append("train_epoch_bf16_xla:budget")
    else:
        try:
            _progress("start bf16-xla epoch")
            wd["stage"] = "train_epoch_bf16_xla"
            t_train_bf16, warm_bx = timed_epoch(
                Conv2dBiRNN(hidden_size=64, pred="emotion",
                            dtype=jnp.bfloat16), 45.0)
            stages["train_epoch_bf16_xla"] = {
                "warmup_s": round(warm_bx, 3),
                "best_s": round(t_train_bf16, 3)}
        except Exception:
            skipped.append("train_epoch_bf16_xla:error")

    wd["stage"] = "final_json"
    vs_baseline = None
    # vs_baseline compares the CHIP pipeline to the torch-CPU reference;
    # a forced-CPU diagnostics run is neither, so it reports no ratio
    if not on_cpu and wd["ref_utts_per_sec"]:
        vs_baseline = round(utts_per_sec / wd["ref_utts_per_sec"], 2)

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
        "hazard_stages": ("measured this run" if generous else
                          "generous budgets only; steady-state numbers in "
                          "benchmarks/functionals_onchip.json"),
        "device": str(jax.devices()[0]),
        "budget_s": budget,
        "elapsed_s": round(time.perf_counter() - T0, 1),
        "skipped": skipped,
    })

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
    print_json_once({
        "metric": metric,
        "value": round(utts_per_sec, 2),
        "unit": unit,
        "vs_baseline": vs_baseline,
        "detail": detail,
    })
    watchdog.cancel()


if __name__ == "__main__":
    main()

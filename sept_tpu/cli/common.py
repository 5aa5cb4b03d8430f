"""Shared CLI plumbing: argparse <-> ExperimentConfig, seeding, paths."""

from __future__ import annotations

import argparse
import random

import numpy as np

from sept_tpu.train.config import ExperimentConfig

__all__ = ["add_common_args", "config_from_args", "enable_compile_cache",
           "pin_cpu_platform", "resolve_mesh", "setup_seed"]


def pin_cpu_platform() -> None:
    """Honor a JAX_PLATFORMS=cpu request BEFORE first backend use.

    Environments whose sitecustomize registers an accelerator plugin pin
    platform selection, so the env var alone is not enough — an explicit
    config update is.  Only a leading 'cpu' forces CPU; a fallback list
    like 'tpu,cpu' means prefer the accelerator."""
    import os

    platforms = [p.strip() for p in
                 os.environ.get("JAX_PLATFORMS", "").split(",") if p.strip()]
    if platforms and platforms[0] == "cpu":
        try:
            import jax

            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass


def enable_compile_cache(path: str | None = None) -> None:
    """Persistent XLA compile cache — compiles over a tunneled chip cost
    minutes; repeat runs of the same shapes become instant.  The cache dir is
    scoped per backend (CPU AOT artifacts are machine-feature-specific).

    Default location is REPO-LOCAL (``<repo>/.jax_cache/<backend>``,
    gitignored) so the cache survives environment resets that wipe /tmp and
    is found by any process run from the checkout — in particular the
    driver's end-of-round ``bench.py`` run reuses the compiles this session
    already paid for.  Override with ``SEPT_JAX_CACHE_DIR`` or ``path``;
    falls back to /tmp when the repo dir is not writable."""
    import os

    import jax

    try:
        if path is None:
            path = os.environ.get("SEPT_JAX_CACHE_DIR")
        if path is None:
            backend = jax.default_backend()
            tag = backend
            if backend == "cpu":
                # CPU AOT artifacts are machine-feature-specific: loading a
                # cache written on a host with different vector extensions
                # makes XLA warn about SIGILL risk (observed: a cache from a
                # +prefer-no-scatter host wedged execution here).  Scope the
                # dir by a fingerprint of this host's CPU flags.
                import hashlib

                try:
                    with open("/proc/cpuinfo") as f:
                        flags = next((ln for ln in f if ln.startswith("flags")),
                                     "")
                    tag = "cpu_" + hashlib.sha1(flags.encode()).hexdigest()[:10]
                except OSError:
                    pass
            root = os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
            # only treat three-dirnames-up as "the repo" when it actually is
            # a checkout; for a site-packages install that path would drop
            # the cache inside the install tree
            is_checkout = any(
                os.path.exists(os.path.join(root, m))
                for m in (".git", "pyproject.toml")
            )
            cand = os.path.join(root, ".jax_cache", tag)
            try:
                if not is_checkout:
                    raise OSError("not a checkout")
                os.makedirs(cand, exist_ok=True)
                path = cand
            except OSError:
                path = f"/tmp/sept_tpu_jax_cache_{tag}"
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _dcn_proc_env() -> tuple[int, int]:
    """(num_processes, process_id) from the multi-host env.

    Reached only from a mesh-consuming CLI with ``SEPT_COORDINATOR`` set —
    a user who exported the coordinator but lost the companion vars has a
    MISCONFIGURED multi-host launch: silently defaulting to single-process
    would run every host as an independent full job (duplicated work,
    clobbered outputs), so fail loudly with the fix spelled out."""
    import os

    try:
        return (int(os.environ["SEPT_NUM_PROCESSES"]),
                int(os.environ["SEPT_PROCESS_ID"]))
    except KeyError as e:
        raise SystemExit(
            f"SEPT_COORDINATOR is set but {e.args[0]} is not: a multi-host "
            "launch needs SEPT_COORDINATOR, SEPT_NUM_PROCESSES and "
            "SEPT_PROCESS_ID all exported (unset SEPT_COORDINATOR for a "
            "single-process run)"
        ) from None


def setup_seed(seed: int = 8, prng_impl: str | None = None,
               distributed: bool = False) -> np.random.Generator:
    """Global determinism (the reference's setup_seed(8),
    utils/training_tools.py:69-74); JAX randomness is threaded explicitly.
    Also enables the persistent compile cache (idempotent) and honors a
    JAX_PLATFORMS=cpu request (environments whose sitecustomize registers an
    accelerator plugin pin platform selection, so the env var alone is not
    enough — an explicit config update before first backend use is).

    ``distributed=True`` (mesh-consuming CLIs only) additionally performs
    multi-host DCN init from ``SEPT_COORDINATOR``/``SEPT_NUM_PROCESSES``/
    ``SEPT_PROCESS_ID`` before any backend use.

    ``prng_impl='rbg'`` switches jax's default PRNG to the hardware RBG
    generator — measured ~5% faster training epochs on v5e (threefry key
    derivation is VPU work inside every dropout/noise draw).  Runs stay
    reproducible bit-for-bit across restarts; the random STREAMS differ
    from threefry, so it is an opt-in throughput knob, not the default."""
    import os

    pin_cpu_platform()
    # multi-host DCN init MUST precede any backend use — and
    # enable_compile_cache() below touches jax.default_backend() to scope
    # the cache dir, which would initialize local-only backends and make
    # the later jax.distributed.initialize in resolve_mesh() fail.  Only
    # the mesh-consuming CLIs (train_baseline / train_cloak / evaluate)
    # pass ``distributed=True``: a single-process tool (featurize, predict,
    # serve) run in a shell with the multi-host env still exported must NOT
    # block waiting for peer processes that will never connect.  A partial
    # env (coordinator without the process vars) is a misconfigured
    # multi-host launch and fails loudly (_dcn_proc_env).
    coord = os.environ.get("SEPT_COORDINATOR")
    if distributed and coord:
        from sept_tpu.parallel import init_distributed

        init_distributed(coord, *_dcn_proc_env())
    if prng_impl:
        import jax

        jax.config.update("jax_default_prng_impl", prng_impl)
    enable_compile_cache()
    np.random.seed(seed)
    random.seed(seed)
    return np.random.default_rng(seed)


def add_common_args(p: argparse.ArgumentParser) -> None:
    """Flags mirroring the reference scripts' shared argparse surface
    (training_cloak.py:193-218)."""
    p.add_argument("--dataset", default="iemocap",
                   help="iemocap | crema-d | msp-improv | synthetic")
    p.add_argument("--corpus_root", default=None,
                   help="corpus root dir (required for real corpora)")
    p.add_argument("--feature_type", default="mel_spec")
    p.add_argument("--input_spec_size", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_epochs", type=int, default=None,
                   help="epochs per fold (default 30; the baseline trainer "
                        "mirrors the reference's 100 under SGD, "
                        "training_adversary_baselines.py:440 — unlike the "
                        "reference an EXPLICIT value is always honored)")
    p.add_argument("--model_type", default="2d-cnn-lstm")
    p.add_argument("--pred", default="emotion")
    p.add_argument("--global_feature", type=int, default=0)
    p.add_argument("--norm", default="znorm")
    p.add_argument("--aug", default="emotion")
    p.add_argument("--win_len", type=int, default=200)
    p.add_argument("--shift", type=int, default=1)
    p.add_argument("--optimizer", default="sgd")
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--att", default=None)
    p.add_argument("--adv", type=int, default=0)
    p.add_argument("--hidden_size", type=int, default=64)
    p.add_argument("--suppression_ratio", type=int, default=0)
    p.add_argument("--scale_lamda", type=float, default=0.0)
    p.add_argument("--grl_lambda", type=float, default=0.1)
    p.add_argument("--gender_lambda", type=float, default=0.1)
    p.add_argument("--antithetic", type=int, default=0,
                   help="antithetic +eps/-eps cloak noise pairs "
                        "(variance-reduced sigma gradients)")
    p.add_argument("--saliency_align", type=float, default=0.0,
                   help="saliency-aligned scale shaping weight for the GRL "
                        "cloak (0 = reference loss)")
    p.add_argument("--mask_direction", choices=("train", "eval"),
                   default="train",
                   help="suppression-mask direction during ratio-matched "
                        "cloak training: 'train' = reference "
                        "(training_cloak.py:364-371, mismatched with the "
                        "eval sweep), 'eval' = the mask the sweep applies")
    p.add_argument("--compute_dtype", choices=("float32", "bfloat16"),
                   default="float32",
                   help="bfloat16 runs conv/RNN compute in bf16 (f32 params "
                        "and accumulation) — the TPU throughput mode, "
                        "~1.4x the f32 epoch")
    p.add_argument("--conv_backend", choices=("auto", "xla", "fused1"),
                   default="auto",
                   help="first conv block of the 2d-cnn-lstm family: 'fused1' "
                        "= the hand-fused Pallas kernel pair (bf16-only, "
                        "200x128 windows; 1.37x the XLA step), 'auto' picks "
                        "it whenever it applies")
    p.add_argument("--remat", type=int, default=0,
                   help="rematerialize the encoder in the backward pass "
                        "(jax.checkpoint): trades cheap recompute FLOPs for "
                        "conv-activation HBM round-trips (2d-cnn-lstm "
                        "family; see ARCHITECTURE.md roofline)")
    p.add_argument("--early_stop_patience", type=int, default=None,
                   help="val-loss early-stopping patience (default: config "
                        "preset; large value disables)")
    p.add_argument("--n_devices", type=int, default=0,
                   help="data-parallel device count: 0 = auto (all devices "
                        "on an accelerator backend, 1 on CPU), N = force an "
                        "N-device mesh")
    p.add_argument("--prng_impl", choices=("threefry2x32", "rbg"),
                   default=None,
                   help="jax PRNG implementation; 'rbg' trades the threefry "
                        "stream for ~5%% faster epochs (reproducible, but "
                        "different random draws than the default)")
    p.add_argument("--seed", type=int, default=8)
    p.add_argument("--folds", type=int, nargs="*", default=None,
                   help="1-based fold numbers to run (default: all 5)")
    p.add_argument("--output_dir", default="results")
    p.add_argument("--work_dir", default="work",
                   help="where features/folds are stored")


def resolve_mesh(args):
    """--n_devices -> (mesh or None) for the training drivers.

    0 (auto) uses every visible device on an accelerator backend and stays
    single-device on CPU (virtual CPU meshes are a test facility — forcing
    one there requires an explicit --n_devices N).  A 1-device request, or a
    1-device machine, trains without a mesh.  The reference is single-device
    (SURVEY.md §2.7); DP is this framework's own scaling surface.

    Multi-host (DCN): set SEPT_COORDINATOR=host:port, SEPT_NUM_PROCESSES and
    SEPT_PROCESS_ID in each process's environment before launching any CLI —
    jax.distributed.initialize runs before the first backend use and
    jax.devices() then spans the whole slice (docs/ARCHITECTURE.md runbook).
    """
    import os

    import jax

    coord = os.environ.get("SEPT_COORDINATOR")
    if coord:
        from sept_tpu.parallel import init_distributed

        # same loud partial-env contract as setup_seed(distributed=True)
        init_distributed(coord, *_dcn_proc_env())

    n = args.n_devices
    auto = n == 0
    if auto:
        n = len(jax.devices()) if jax.default_backend() != "cpu" else 1
        # auto mode must never fail a previously-working command: on a
        # topology that doesn't divide the batch, use the largest device
        # count that does (worst case 1 = single-device)
        while n > 1 and args.batch_size % n:
            n -= 1
    if n <= 1:
        return None
    avail = len(jax.devices())
    if n > avail:
        raise SystemExit(
            f"--n_devices {n} but only {avail} devices visible "
            "(for a virtual CPU mesh set JAX_PLATFORMS=cpu "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N)"
        )
    if args.batch_size % n:
        raise SystemExit(
            f"--batch_size {args.batch_size} must be divisible by "
            f"--n_devices {n}"
        )
    from sept_tpu.parallel import make_mesh

    return make_mesh(n)


def config_from_args(args, **overrides) -> ExperimentConfig:
    cfg = ExperimentConfig(
        dataset=args.dataset,
        feature_type=args.feature_type,
        feature_len=args.input_spec_size,
        win_len=args.win_len,
        shift=bool(args.shift),
        norm=args.norm,
        aug=args.aug or None,
        adv=bool(args.adv),
        model_type=args.model_type,
        pred=args.pred,
        hidden_size=args.hidden_size,
        att=args.att,
        global_feature=bool(args.global_feature),
        optimizer=args.optimizer,
        batch_size=args.batch_size,
        num_epochs=args.num_epochs if args.num_epochs is not None else 30,
        scale_lambda=args.scale_lamda,
        suppression_ratio=args.suppression_ratio,
        grl_lambda=args.grl_lambda,
        gender_lambda=args.gender_lambda,
        antithetic_noise=bool(getattr(args, "antithetic", 0)),
        saliency_align=float(getattr(args, "saliency_align", 0.0)),
        mask_direction=getattr(args, "mask_direction", "train"),
        compute_dtype=getattr(args, "compute_dtype", "float32"),
        conv_backend=getattr(args, "conv_backend", "auto"),
        remat=bool(getattr(args, "remat", 0)),
        prng_impl=getattr(args, "prng_impl", None),
        seed=args.seed,
        output_dir=args.output_dir,
    )
    if args.learning_rate is not None:
        cfg.learning_rate = args.learning_rate
    if getattr(args, "early_stop_patience", None) is not None:
        cfg.early_stop_patience = args.early_stop_patience
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg

"""Real-chip smoke tests: frontend parity, Pallas kernels compiled (not
interpreted), one scanned training epoch.  ~2-4 min warm (compile cache).

These cover what the CPU suite structurally cannot: Mosaic lowering of the
fused kernels, MXU precision behavior (HIGHEST vs bf16), and the scanned
epoch program on the actual backend.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sept_tpu.cli.common import enable_compile_cache

enable_compile_cache()

SR, NFFT, HOP, MELS = 16000, 800, 160, 128


def _padded_waves(b=8, dur=2.0, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((b, int(dur * SR))).astype(np.float32)
    return np.pad(w, ((0, 0), (NFFT // 2, NFFT // 2)), mode="reflect")


def test_matmul_frontend_matches_fft_path_on_chip():
    """The MXU GEMM-chain STFT at Precision.HIGHEST must match the FFT
    formulation on hardware (the parity claim the CPU suite can't check)."""
    from sept_tpu.ops import frontend as F

    w = jnp.asarray(_padded_waves(2)[0])
    spec_mm = jax.jit(
        lambda x: F.stft_power(x, NFFT, HOP, center=False)
    )(w)
    frames = F.frame_signal(w, NFFT, HOP, center=False)
    win = jnp.asarray(F.hann_window(NFFT))
    fft = jnp.fft.rfft(frames * win[None, :], axis=1)
    spec_fft = (fft.real**2 + fft.imag**2).T
    rel = np.max(
        np.abs(np.asarray(spec_mm) - np.asarray(spec_fft))
        / (np.abs(np.asarray(spec_fft)) + 1e-3)
    )
    # the TPU FFT path carries its own f32 error; 5e-4 relative still rules
    # out the ~0.5-relative default-precision failure mode this test guards
    assert rel < 5e-4, rel


def test_pallas_mel_compiled_parity():
    """Pallas mel kernel COMPILED through Mosaic (not interpret) vs the XLA
    HIGHEST chain: f32 ~2e-4 dB; bf16 throughput mode within 0.1 dB p99."""
    from sept_tpu.ops import frontend as F
    from sept_tpu.ops.pallas_frontend import pallas_mel_spectrogram

    padded = jnp.asarray(_padded_waves(8))

    def xla_chain(p):
        def one(w):
            spec = F.stft_power(w, NFFT, HOP, center=False)
            fb = jnp.asarray(
                F.melscale_fbanks(NFFT // 2 + 1, 0.0, 8000.0, MELS, 16000)
            )
            mel = jnp.dot(spec.T, fb, precision=F.PARITY_PRECISION,
                          preferred_element_type=jnp.float32)
            return F.amplitude_to_db(mel.T, "power", None).T
        return jax.vmap(one)(p)

    ref = np.asarray(jax.jit(xla_chain)(padded))
    out = np.asarray(pallas_mel_spectrogram(padded))
    T = min(ref.shape[1], out.shape[1])
    assert np.max(np.abs(out[:, :T] - ref[:, :T])) < 2e-3

    out16 = np.asarray(pallas_mel_spectrogram(padded, bf16=True))
    dev = np.abs(out16[:, :T] - ref[:, :T])
    assert np.percentile(dev, 99) < 0.1, np.percentile(dev, 99)


def test_pallas_mfcc_compiled_runs():
    from sept_tpu.ops.pallas_frontend import pallas_mfcc

    rng = np.random.default_rng(1)
    w = rng.standard_normal((4, 32000)).astype(np.float32)
    padded = jnp.asarray(np.pad(w, ((0, 0), (200, 200)), mode="reflect"))
    out = np.asarray(pallas_mfcc(padded))
    assert out.shape[0] == 4 and out.shape[2] == 40
    assert np.all(np.isfinite(out))


def test_scanned_epoch_on_chip():
    """One whole scanned training epoch executes on hardware with finite
    loss and moving parameters."""
    from sept_tpu.models import Conv2dBiRNN
    from sept_tpu.train import (
        ExperimentConfig,
        init_state,
        make_epoch_runner,
        make_optimizer,
    )

    T, D, M, B = 40, 32, 32, 16
    rng = np.random.default_rng(2)
    windows = jnp.asarray(rng.standard_normal((M, T, D)).astype(np.float32))
    labels = jnp.asarray((np.arange(M) % 4).astype(np.int32))
    weights = jnp.ones(M, jnp.float32)
    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-3, hidden_size=8)
    model = Conv2dBiRNN(hidden_size=8, pred="emotion")
    tx = make_optimizer(cfg, steps_per_epoch=2)
    b0 = {"spec": windows[:B][..., None], "labels_emo": labels[:B],
          "labels_gen": labels[:B] % 2, "global": jnp.zeros((B, 88)),
          "weight": weights[:B]}
    state = init_state(model, tx, jax.random.PRNGKey(8), b0)
    run = make_epoch_runner(model, tx)
    s1, losses, correct, counts = run(
        state, windows, labels, weights,
        jnp.asarray(np.random.default_rng(0).permutation(M)),
        n_batches=2, batch_size=B,
    )
    assert np.all(np.isfinite(np.asarray(losses)))
    moved = any(
        float(jnp.max(jnp.abs(a - b))) > 0
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(s1.params))
    )
    assert moved


def test_device_ingest_pallas_bf16_frontend():
    """The throughput ingest mode (fused bf16 Pallas frontend) produces
    windows consistent with the parity mode within the documented tolerance."""
    from sept_tpu.data.device_pipeline import device_ingest

    rng = np.random.default_rng(3)
    waves = [rng.standard_normal(24000).astype(np.float32) for _ in range(8)]
    spk = np.arange(8, dtype=np.int32) % 4
    lab = np.arange(8, dtype=np.int32) % 4
    ds_a = device_ingest(waves, spk, lab, lab % 2, win_len=100, shift_len=25)
    ds_b = device_ingest(waves, spk, lab, lab % 2, win_len=100, shift_len=25,
                         frontend="pallas_bf16")
    a, b = np.asarray(ds_a.windows), np.asarray(ds_b.windows)
    assert a.shape == b.shape
    # znormed features: deviation stays small in absolute terms
    assert np.percentile(np.abs(a - b), 99) < 0.05


def test_functional_extractors_on_chip():
    """eGeMAPS + emobase batch extractors through the shared-upload combined
    path on hardware: finite, right-shaped, and deterministic."""
    from sept_tpu.ops.emobase import N_EMOBASE, combined_functionals_batch
    from sept_tpu.ops.egemaps import N_GEMAPS

    rng = np.random.default_rng(0)
    waves = {
        f"u{i}": rng.standard_normal(SR + 531 * i).astype(np.float32)
        for i in range(4)
    }
    gem, emo = combined_functionals_batch(waves, batch_size=8)
    assert set(gem) == set(emo) == set(waves)
    for u in waves:
        assert gem[u].shape == (N_GEMAPS,) and np.isfinite(gem[u]).all()
        assert emo[u].shape == (N_EMOBASE,) and np.isfinite(emo[u]).all()
    gem2, emo2 = combined_functionals_batch(waves, batch_size=8)
    np.testing.assert_array_equal(gem["u1"], gem2["u1"])
    np.testing.assert_array_equal(emo["u1"], emo2["u1"])


def test_bf16_compute_epoch_on_chip():
    """The --compute_dtype bfloat16 training mode (the bench headline)
    compiles and trains on hardware: finite loss, f32 params moving."""
    from sept_tpu.models import Conv2dBiRNN, compute_dtype
    from sept_tpu.train import (
        ExperimentConfig,
        init_state,
        make_epoch_runner,
        make_optimizer,
    )

    T, D, M, B = 40, 32, 32, 16
    rng = np.random.default_rng(3)
    windows = jnp.asarray(rng.standard_normal((M, T, D)).astype(np.float32))
    labels = jnp.asarray((np.arange(M) % 4).astype(np.int32))
    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-3, hidden_size=8,
                           compute_dtype="bfloat16")
    model = Conv2dBiRNN(hidden_size=8, pred="emotion",
                        dtype=compute_dtype(cfg.compute_dtype))
    tx = make_optimizer(cfg, steps_per_epoch=2)
    b0 = {"spec": windows[:B][..., None], "labels_emo": labels[:B],
          "labels_gen": labels[:B] % 2, "global": jnp.zeros((B, 88)),
          "weight": jnp.ones(B)}
    state = init_state(model, tx, jax.random.PRNGKey(8), b0)
    # params stay f32 (bf16 is compute-only)
    assert all(x.dtype == jnp.float32
               for x in jax.tree.leaves(state.params))
    run = make_epoch_runner(model, tx)
    s1, losses, _, _ = run(
        state, windows, labels, jnp.ones(M, jnp.float32),
        jnp.asarray(np.random.default_rng(0).permutation(M)),
        n_batches=2, batch_size=B,
    )
    assert np.all(np.isfinite(np.asarray(losses)))
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(s1.params))


def test_fused_conv_block_compiled_parity():
    """The fused first-conv-block kernels (ops/pallas_conv.py) COMPILED via
    Mosaic on the real chip: train-mode fwd + grads vs the jnp oracle at
    bf16 tolerance (CPU CI only runs interpret mode)."""
    import numpy as np
    import jax.numpy as jnp

    from sept_tpu.ops.pallas_conv import block1_reference, fused_block1_train

    C = 32
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((4, 200, 128, 1)).astype(np.float32))
    k = jnp.asarray((rng.standard_normal((5, 5, 1, C)) * 0.2).astype(np.float32))
    bias = jnp.asarray((0.1 * rng.standard_normal(C)).astype(np.float32))
    gamma = jnp.asarray((1 + 0.1 * rng.standard_normal(C)).astype(np.float32))
    beta = jnp.asarray((0.1 * rng.standard_normal(C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((4, 100, 64, C)).astype(np.float32))

    @jax.jit
    def fwd_and_grads(x, k, bias, gamma, beta):
        def loss(k, bias, gamma, beta):
            p, m, v = fused_block1_train(x, k, bias, gamma, beta, C, False,
                                         jnp.bfloat16, None)
            return jnp.sum(p * w), (p, m, v)

        (l, (p, m, v)), g = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3), has_aux=True)(k, bias, gamma, beta)
        return p, m, v, g

    p, m, v, g = fwd_and_grads(x, k, bias, gamma, beta)
    pr = block1_reference(x, k, bias, gamma, beta, m, v)
    scale = float(jnp.abs(pr).max())
    assert float(jnp.abs(p - pr).max()) < 0.03 * scale  # bf16 conv rounding
    assert all(bool(jnp.all(jnp.isfinite(t))) for t in g)
    # grads against f32 autodiff of the train-mode (batch-stats BN) oracle
    def loss_ref(k, bias, gamma, beta):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias[None, None, None, :]
        mean = y.mean((0, 1, 2))
        var = ((y - mean) ** 2).mean((0, 1, 2))
        z = jax.nn.relu((y - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta)
        pooled = jax.lax.reduce_window(
            z, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        return jnp.sum(pooled * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(k, bias, gamma, beta)
    for name, a, b in zip(["dk", "db", "dgamma", "dbeta"], g, g_ref):
        s = max(float(jnp.abs(b).max()), 1.0)
        assert float(jnp.abs(a - b).max()) < 0.05 * s, name


def test_global_cloak_grl_scanned_epoch_on_chip():
    """The scanned cloak+GRL epoch with the 88-dim global concat (new in
    r3: use_global rides the device loop) compiles and trains on hardware:
    finite loss, noise moving, frozen emotion backbone bit-identical."""
    import functools

    from sept_tpu.models import CloakedModelGRL, Conv2dBiRNN
    from sept_tpu.train import ExperimentConfig, make_cloak_optimizer
    from sept_tpu.train.steps import TrainState, make_cloak_epoch_runner

    T, D, M, B = 40, 32, 16, 8
    rng = np.random.default_rng(5)
    windows = jnp.asarray(rng.standard_normal((M, T, D)).astype(np.float32))
    gdata = jnp.asarray(rng.standard_normal((M, 88)).astype(np.float32))
    labels = jnp.asarray((np.arange(M) % 4).astype(np.int32))
    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-2,
                           scale_lambda=0.1, hidden_size=8)
    model = CloakedModelGRL(
        emotion_backbone=Conv2dBiRNN(hidden_size=8, pred="emotion",
                                     dropout_rate=0.0),
        gender_backbone=Conv2dBiRNN(hidden_size=8, pred="gender",
                                    dropout_rate=0.0),
        grl_lambda=0.1, win_len=T, n_feats=D,
    )
    key = jax.random.PRNGKey(8)
    v = jax.jit(functools.partial(model.init, train=True))(
        {"params": key, "noise": key, "dropout": key},
        windows[:B][..., None], global_feature=gdata[:B])
    tx = make_cloak_optimizer(cfg, 10, v["params"],
                              ("noise", "gender_backbone"))
    state = TrainState(params=v["params"], batch_stats=v["batch_stats"],
                       opt_state=tx.init(v["params"]), rng=key,
                       step=jnp.zeros((), jnp.int32))
    run = make_cloak_epoch_runner(model, tx, scale_lambda=0.1, grl=True,
                                  use_global=True)
    s1, losses, _, _ = run(
        state, windows, labels, labels % 2, jnp.ones(M),
        jnp.asarray(np.arange(M)), None,
        n_batches=M // B, batch_size=B, globals_=gdata,
    )
    assert np.all(np.isfinite(np.asarray(losses)))
    assert float(jnp.max(jnp.abs(
        s1.params["noise"]["locs"] - state.params["noise"]["locs"]))) > 0
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     state.params["emotion_backbone"],
                     s1.params["emotion_backbone"])
    assert max(jax.tree.leaves(d)) == 0.0


def test_int16_pcm_staging_bit_equal_on_chip():
    """int16 PCM staging (half the H2D bytes) must be bit-equal to float32
    staging on the real backend: the on-device 2^-15 normalize is exact
    (ops/frontend.py::pcm_to_float) regardless of platform."""
    from sept_tpu.data.featurize import featurize_corpus
    from sept_tpu.ops.emobase import combined_functionals_batch

    rng = np.random.default_rng(11)
    pcm = {f"u{i}": rng.integers(-32768, 32768, 9000 + 1000 * i).astype(np.int16)
           for i in range(3)}
    f32 = {u: w.astype(np.float32) / 32768.0 for u, w in pcm.items()}
    a = featurize_corpus(pcm, feature_type="mel_spec", include_gemaps=False)
    b = featurize_corpus(f32, feature_type="mel_spec", include_gemaps=False)
    for u in pcm:
        np.testing.assert_array_equal(a[u]["mel1"], b[u]["mel1"])
        np.testing.assert_array_equal(a[u]["mel2"], b[u]["mel2"])
    ga, ea = combined_functionals_batch(pcm)
    gb, eb = combined_functionals_batch(f32)
    for u in pcm:
        np.testing.assert_array_equal(ga[u], gb[u])
        np.testing.assert_array_equal(ea[u], eb[u])


def test_serving_predictor_on_chip():
    """The serving program end to end on hardware (serve.py::Predictor —
    the program serving_bench.json times): the bucketed jit compiles on the
    real backend, outputs are calibrated probabilities, int16 PCM staging
    matches the pre-divided float32 path bit-for-bit through the WHOLE
    serving pipeline (featurize -> normalize -> window -> model -> vote),
    and the cloaked variant actually perturbs the output."""
    from sept_tpu.models import Conv2dBiRNN
    from sept_tpu.serve import CloakedPredictor, Predictor

    d, win = 32, 60
    model = Conv2dBiRNN(hidden_size=8, pred="emotion")
    v = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                            jnp.zeros((1, win, d, 1)))
    kw = dict(hidden_size=8, feature_len=d, win_len=win, shift_len=15)
    p = Predictor(v["params"], v["batch_stats"], **kw)
    rng = np.random.default_rng(3)
    pcm = [np.clip(np.rint(rng.standard_normal(12000 + 2000 * i) * 3000),
                   -32768, 32767).astype(np.int16) for i in range(3)]
    probs = p.predict(pcm)
    assert probs.shape == (3, 4)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    assert (probs >= 0).all()
    # int16 rows stage at half the H2D bytes and normalize on device; the
    # 2^-15 scale is exact in f32, so the results must be identical
    probs_f = p.predict([w.astype(np.float32) / 32768.0 for w in pcm])
    np.testing.assert_array_equal(probs, probs_f)
    # the privacy-preserving path: strong noise must move the output
    noise = {"locs": jnp.zeros((win, d)), "rhos": jnp.full((win, d), 2.0)}
    cloaked = CloakedPredictor(v["params"], v["batch_stats"],
                               noise_params=noise, max_scale=5.0,
                               **kw).predict(pcm)
    assert cloaked.shape == probs.shape
    assert float(np.abs(cloaked - probs).max()) > 1e-4

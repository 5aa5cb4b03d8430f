"""988-dimensional emobase-style functionals.

The reference extracts openSMILE's *emobase* functional set per utterance
alongside eGeMAPS and stores it in the feature pickle
(/root/reference/feature_extraction/audio_feature_extraction.py:76,188-189).
openSMILE emobase is 988 dims = 26 low-level descriptors x 2 (track + delta)
x 19 functionals; this module reproduces that SHAPE and spirit with a
framework-native catalog (openSMILE's exact LLD definitions — e.g. LSP
coefficients — are not re-implementable to parity without its code; the
divergences are documented below).  Everything runs on device: LLD tracks
come from the same MXU GEMM chain as the main frontend, the 19 functionals
are masked vectorized reductions over ALL 52 tracks at once
(sept_tpu.ops.functionals), and whole utterance buckets reduce in one
vmapped jitted program.

LLD catalog (26 tracks; [*] = divergence from openSMILE emobase):

  0  intensity (frame RMS)
  1  loudness (log-energy, dB)
  2  zero-crossing rate
  3  voicing probability (autocorr peak ratio)
  4  F0 (Hz, 0 when unvoiced)
  5  F0 envelope (running max-decay of F0)
  6..17  MFCC 0..11 (26-mel filterbank, ortho DCT)
 18..25  8 octave-spaced log band energies [*] (in place of 8 LSP coeffs)

Delta tracks: first-order frame difference of each LLD (leading frame 0),
giving 52 tracks.

Functionals per track (19, in order):

  max, min, range, relative argmax position, relative argmin position,
  arithmetic mean, absolute mean, linear-regression slope, offset and
  quadratic error (vs frame index), stddev, skewness, excess kurtosis,
  quartile1, median, quartile3, iqr(1-2), iqr(2-3), iqr(1-3)

Layout: dimension (lld * 19 + f) = functional f of track lld — all 19
functionals of a track are contiguous.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sept_tpu.ops import frontend as F
from sept_tpu.ops import functionals as FN
from sept_tpu.ops.egemaps import yin_pitch

__all__ = ["N_EMOBASE", "N_LLD", "N_FUNCTIONALS", "combined_functionals_batch",
           "emobase_functionals", "emobase_functionals_batch"]

N_LLD = 52  # 26 tracks + deltas
N_FUNCTIONALS = 19
N_EMOBASE = N_LLD * N_FUNCTIONALS  # 988, the openSMILE emobase width
_SR = 16000
# frame grid shared with egemaps — single source in ops.functionals
_NFFT = FN.NFFT
_HOP = FN.HOP
_NFREQ = FN.NFREQ
_n_frames = FN.n_frames


def _lsp_band_matrix() -> np.ndarray:
    """8 octave-spaced rectangular band filters (the LSP stand-ins).

    Distinct from egemaps' 13-band triangular ``_band_matrix`` — named
    apart so the two feature sets' filterbanks can't be confused.
    """
    edges = np.geomspace(100, 8000, 9)
    f = np.linspace(0, _SR / 2, _NFREQ)
    bands = np.zeros((_NFREQ, 8), dtype=np.float32)
    for b in range(8):
        bands[:, b] = ((f >= edges[b]) & (f < edges[b + 1])).astype(np.float32)
    return bands


def _lld(wave):
    """(n_frames, 52) emobase LLD + delta tracks for one padded waveform."""
    eps = 1e-10
    frames, spec = FN.lld_stft_preamble(wave)  # (T, _NFFT), (T, n_freq)

    intensity = jnp.sqrt(jnp.mean(frames**2, axis=1) + eps)
    loud = 10.0 * jnp.log10(jnp.sum(spec, axis=1) + eps)
    zcr = jnp.mean(
        (jnp.sign(frames[:, 1:]) != jnp.sign(frames[:, :-1])).astype(jnp.float32),
        axis=1,
    )

    f0_log, voiced, vprob = yin_pitch(frames)
    f0_hz = jnp.where(voiced > 0.5, jnp.exp2(f0_log / 12.0), 0.0)
    # F0 envelope: exponential-decay running max (emobase's env track analog);
    # a scan over frames — tiny (T steps of scalar work), fused by XLA
    def env_step(carry, x):
        e = jnp.maximum(x, 0.95 * carry)
        return e, e

    _, f0_env = jax.lax.scan(env_step, jnp.float32(0.0), f0_hz)

    mel_fb = jnp.asarray(F.melscale_fbanks(_NFREQ, 0.0, 8000.0, 26, _SR))
    dct = jnp.asarray(F.create_dct(12, 26, "ortho"))
    mel_db = 10.0 * jnp.log10(
        jnp.dot(spec, mel_fb, preferred_element_type=jnp.float32) + eps
    )
    mfcc = jnp.dot(mel_db, dct, preferred_element_type=jnp.float32)  # (T, 12)

    band_e = 10.0 * jnp.log10(
        jnp.dot(spec, jnp.asarray(_lsp_band_matrix()),
                preferred_element_type=jnp.float32) + eps
    )  # (T, 8)

    base = jnp.concatenate(
        [
            jnp.stack([intensity, loud, zcr, vprob, f0_hz, f0_env], axis=1),
            mfcc,
            band_e,
        ],
        axis=1,
    )  # (T, 26)
    delta = jnp.concatenate(
        [jnp.zeros((1, base.shape[1])), base[1:] - base[:-1]], axis=0
    )
    return jnp.concatenate([base, delta], axis=1)  # (T, 52)


def _reduce(tracks, t):
    """(t_pad, 52) padded tracks + valid count -> (988,) functional vector."""
    t_pad = tracks.shape[0]
    t = jnp.asarray(t, jnp.int32)
    m = FN.frame_mask(t_pad, t)
    x = tracks.T  # (52, T)

    mx = FN.masked_max(x, m)
    mn = FN.masked_min(x, m)
    maxpos = FN.masked_argmax_rel(x, m, t)
    minpos = FN.masked_argmin_rel(x, m, t)
    mean, std, skew, kurt = FN.masked_moments(x, m)
    absmean = FN.masked_mean(jnp.abs(x), m)
    slope, offset, err_q = FN.masked_linreg(x, m, t)
    s = FN.masked_sort(x, m)
    q1 = FN.percentile_sorted(s, t, 25.0)
    q2 = FN.percentile_sorted(s, t, 50.0)
    q3 = FN.percentile_sorted(s, t, 75.0)

    funcs = jnp.stack(
        [
            mx, mn, mx - mn, maxpos, minpos, mean, absmean,
            slope, offset, err_q, std, skew, kurt,
            q1, q2, q3, q2 - q1, q3 - q2, q3 - q1,
        ],
        axis=1,
    )  # (52, 19)
    return funcs.reshape(-1).astype(jnp.float32)


def _emobase_single(wave, t):
    return _reduce(_lld(F.pcm_to_float(wave)), t)


_emobase_batch = jax.jit(jax.vmap(_emobase_single))


def emobase_functionals_batch(
    waveforms: dict[str, np.ndarray],
    quantum: int = 8000,
    batch_size: int = 64,
) -> dict[str, np.ndarray]:
    """Featurize a corpus to (988,) emobase-style vectors, bucketed on device."""
    out: dict[str, np.ndarray] = {}
    for ids, W, ts, _ns in FN.chunked_wave_batches(
        waveforms, quantum, batch_size, _n_frames
    ):
        vecs = np.asarray(_emobase_batch(jnp.asarray(W), jnp.asarray(ts)))
        for row, u in enumerate(ids):
            out[u] = vecs[row]
    return out


def combined_functionals_batch(
    waveforms: dict[str, np.ndarray],
    quantum: int = 8000,
    batch_size: int = 64,
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """(gemaps, emobase) for a corpus from ONE wave upload per chunk.

    The corpus featurize time is transfer-dominated on this environment's
    tunneled chip (~280 ms H2D vs ~40 ms compute per 64x2.5 s chunk), and
    the separate batch extractors each upload the same waves.  Staging each
    chunk once and running BOTH cached per-set programs on the device array
    measures 7.0 s for 1024 utterances vs 13.2 s for the separate paths.
    (A single merged XLA program was also tried: 8.5 s steady-state plus a
    ~16-minute first compile — strictly worse than reusing the two cached
    executables.)  This is the production path of ``data.featurize`` when
    both feature sets are requested; the separate batch functions remain
    for single-set use and as the equivalence oracle
    (tests/test_functionals.py).
    """
    from sept_tpu.ops.egemaps import _gemaps_batch

    # dispatch-then-collect: JAX dispatch is async, so staging every chunk
    # and queueing both programs BEFORE any blocking np.asarray lets the
    # next chunk's H2D overlap the previous chunk's compute/D2H instead of
    # serializing 3 round-trips per chunk over the tunnel (measured: the
    # stage is ~94% transfer/dispatch, ~22 ms device compute per 64-utt
    # chunk).  Held device memory is bounded: waves + (B, 88)/(B, 988)
    # results per chunk.
    gem: dict[str, np.ndarray] = {}
    emo: dict[str, np.ndarray] = {}
    pending = []
    for ids, W, ts, ns in FN.chunked_wave_batches(
        waveforms, quantum, batch_size, _n_frames
    ):
        Wd, tsd = jnp.asarray(W), jnp.asarray(ts)
        pending.append(
            (ids, _gemaps_batch(Wd, tsd, jnp.asarray(ns)),
             _emobase_batch(Wd, tsd))
        )
    for ids, g, e in pending:
        g, e = np.asarray(g), np.asarray(e)
        for row, u in enumerate(ids):
            gem[u] = g[row]
            emo[u] = e[row]
    return gem, emo


def emobase_functionals(wave: np.ndarray) -> np.ndarray:
    """(n_samples,) float32 waveform -> (988,) emobase-style vector."""
    return emobase_functionals_batch({"_": np.asarray(wave, np.float32)})["_"]

"""Masked per-track functional statistics, fully vectorized for TPU.

The reference obtains its per-utterance functional descriptors from
openSMILE's C++ reducers (eGeMAPSv02 and emobase,
/root/reference/feature_extraction/audio_feature_extraction.py:74-78).  This
module provides the framework's device-side equivalent: every reducer is a
closed-form jnp expression over a *padded* time axis with an explicit
valid-frame count, so whole utterance buckets reduce in one vmapped, jitted
program — no per-utterance host loops, no data-dependent shapes.

All helpers take ``x`` with time as the LAST axis (tracks may be stacked on
leading axes), a boolean ``mask`` broadcastable to x, and the valid count
``t`` (traced scalar).  Percentiles reproduce np.percentile's linear
interpolation; std/skewness/kurtosis are population moments (np defaults).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sept_tpu.ops import frontend as F

__all__ = [
    "NFFT",
    "HOP",
    "NFREQ",
    "lld_stft_preamble",
    "n_frames",
    "bucket_indices",
    "chunked_wave_batches",
    "pow2_rows",
    "frame_mask",
    "masked_mean",
    "masked_std",
    "masked_sort",
    "percentile_sorted",
    "masked_min",
    "masked_max",
    "masked_argmax_rel",
    "masked_argmin_rel",
    "masked_moments",
    "masked_linreg",
    "run_stats",
    "diff_stats",
    "compact_order",
]

_BIG = 3.0e38  # fill for masked-out cells (finite: keeps sorts NaN-free)

# Shared frame/window convention of BOTH functional LLD extractors (eGeMAPS
# and emobase): 50ms Hann frames, 10ms hop, no centering — openSMILE's
# default frame grid at 16kHz.  A change here moves both feature sets in
# lockstep; combined_functionals_batch relies on their frame counts agreeing.
NFFT = 800
HOP = 160
NFREQ = NFFT // 2 + 1


def n_frames(n_samples: int, nfft: int = NFFT, hop: int = HOP) -> int:
    """Frames produced by the shared uncentered grid (host-side, static)."""
    return max(1, 1 + (n_samples - nfft) // hop)


def lld_stft_preamble(wave, nfft: int = NFFT, hop: int = HOP):
    """(frames, power spectrum) of one padded waveform on the shared grid.

    The LLD preamble common to both functional extractors: uncentered
    framing, Hann window, RDFT as two MXU GEMMs against the cos/sin
    matrices, |.|^2 power.  Returns the RAW (unwindowed) frames too —
    pitch/intensity/ZCR tracks consume those — alongside the (T, NFREQ)
    power spectrum.  Traceable; constants fold at compile time.
    """
    frames = F.frame_signal(wave, nfft, hop, center=False)
    win = jnp.asarray(F.hann_window(nfft))
    framed = frames * win[None, :]
    cos_m, sin_m = F._rdft_matrices(nfft)
    re = jnp.dot(framed, jnp.asarray(cos_m),
                 preferred_element_type=jnp.float32)
    im = jnp.dot(framed, jnp.asarray(sin_m),
                 preferred_element_type=jnp.float32)
    return frames, re * re + im * im


def pow2_rows(n: int, cap: int) -> int:
    """Round a chunk's row count up to the next power of two (capped).

    Batch dims, like bucket lengths, must come from a small closed set or
    every stray chunk size compiles its own executable (tens of seconds over
    a tunneled chip); padded rows carry weight/frame-count 0 and are dropped
    on the host side.
    """
    r = 1
    while r < min(n, cap):
        r *= 2
    return min(r, cap)


def bucket_indices(
    lengths, quantum: int = 8000, geometric: bool = True
) -> dict[int, list[int]]:
    """Group item indices into padded-length buckets (one jit shape each).

    Geometric buckets (quantum * 2^k) bound the number of distinct compiled
    shapes at log2(max_len/quantum) — compiles cost tens of seconds over a
    tunneled chip while the extra padded compute is nearly free on the MXU.
    Linear buckets (quantum multiples) minimize padding instead.
    """
    out: dict[int, list[int]] = {}
    for i, n in enumerate(lengths):
        if geometric:
            b = quantum
            while b < n:
                b *= 2
        else:
            b = ((n + quantum - 1) // quantum) * quantum
        out.setdefault(b, []).append(i)
    return out


def frame_mask(t_pad: int, t) -> jnp.ndarray:
    """(t_pad,) bool mask of valid frames given a traced count ``t``."""
    return jnp.arange(t_pad) < t


def _count(mask):
    return jnp.maximum(jnp.sum(mask, axis=-1), 1)


def masked_mean(x, mask):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=-1) / _count(mask)


def masked_std(x, mask):
    m = mask.astype(x.dtype)
    mu = masked_mean(x, mask)
    var = jnp.sum(m * (x - mu[..., None]) ** 2, axis=-1) / _count(mask)
    return jnp.sqrt(jnp.maximum(var, 0.0))


def masked_sort(x, mask):
    """Ascending sort with masked-out cells pushed past the valid region."""
    return jnp.sort(jnp.where(mask, x, _BIG), axis=-1)


def percentile_sorted(s, t, q: float):
    """np.percentile(x[:t], q) from an ascending masked sort ``s``.

    Linear interpolation at position q/100*(t-1), np's default method.
    """
    pos = (q / 100.0) * (jnp.asarray(t).astype(jnp.float32) - 1.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, s.shape[-1] - 1)
    hi = jnp.clip(lo + 1, 0, s.shape[-1] - 1)
    frac = (pos - lo.astype(jnp.float32)).astype(s.dtype)
    a = jnp.take_along_axis(s, jnp.broadcast_to(lo, s.shape[:-1])[..., None], -1)[..., 0]
    b = jnp.take_along_axis(s, jnp.broadcast_to(hi, s.shape[:-1])[..., None], -1)[..., 0]
    # when t == 1, pos == 0 and a == b: interpolation is exact either way
    return a * (1.0 - frac) + b * frac


def masked_min(x, mask):
    return jnp.min(jnp.where(mask, x, _BIG), axis=-1)


def masked_max(x, mask):
    return jnp.max(jnp.where(mask, x, -_BIG), axis=-1)


def masked_argmax_rel(x, mask, t):
    """Relative position (in [0, 1)) of the masked maximum."""
    idx = jnp.argmax(jnp.where(mask, x, -_BIG), axis=-1)
    return idx.astype(jnp.float32) / jnp.maximum(t, 1).astype(jnp.float32)


def masked_argmin_rel(x, mask, t):
    idx = jnp.argmin(jnp.where(mask, x, _BIG), axis=-1)
    return idx.astype(jnp.float32) / jnp.maximum(t, 1).astype(jnp.float32)


def masked_moments(x, mask, eps: float = 1e-6):
    """(mean, std, skewness, excess kurtosis) population moments."""
    m = mask.astype(x.dtype)
    n = _count(mask).astype(x.dtype)
    mu = jnp.sum(x * m, axis=-1) / n
    d = (x - mu[..., None]) * m
    var = jnp.sum(d**2, axis=-1) / n
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    m3 = jnp.sum(d**3, axis=-1) / n
    m4 = jnp.sum(d**4, axis=-1) / n
    safe = jnp.maximum(std, eps)
    skew = jnp.where(std > eps, m3 / safe**3, 0.0)
    kurt = jnp.where(std > eps, m4 / safe**4 - 3.0, 0.0)
    return mu, std, skew, kurt


def masked_linreg(x, mask, t):
    """(slope, offset, mean squared residual) of x against the frame index.

    The openSMILE linregc1/linregc2/linregerrQ analog, over valid frames.
    """
    i = jnp.arange(x.shape[-1], dtype=jnp.float32)
    m = mask.astype(x.dtype)
    n = _count(mask).astype(x.dtype)
    mi = jnp.sum(i * m, axis=-1) / n
    mx = jnp.sum(x * m, axis=-1) / n
    di = (i - mi[..., None]) * m
    cov = jnp.sum(di * x, axis=-1)
    var = jnp.sum(di**2, axis=-1)
    slope = jnp.where(var > 0, cov / jnp.maximum(var, 1e-20), 0.0)
    offset = mx - slope * mi
    resid = (x - slope[..., None] * i - offset[..., None]) * m
    err_q = jnp.sum(resid**2, axis=-1) / n
    return slope, offset, err_q


def run_stats(flag, mask):
    """(mean run length, run count) of True-runs of ``flag`` within ``mask``.

    mean(run lengths) == total True frames / number of runs, where a run
    starts at any True frame whose predecessor (within the valid region) is
    False — the vectorized form of the reference-era run-length loop.
    """
    v = flag & mask
    prev = jnp.concatenate(
        [jnp.zeros_like(v[..., :1]), v[..., :-1]], axis=-1
    )
    n_runs = jnp.sum(v & ~prev, axis=-1)
    total = jnp.sum(v, axis=-1)
    mean_len = jnp.where(
        n_runs > 0, total.astype(jnp.float32) / jnp.maximum(n_runs, 1), 0.0
    )
    return mean_len, n_runs


def compact_order(select, t_pad: int):
    """Stable permutation placing selected indices first (order preserved).

    Lets masked reducers see the *compacted* subsequence (e.g. consecutive
    voiced frames) the way a boolean-index gather would on host.
    """
    i = jnp.arange(t_pad)
    return jnp.argsort(jnp.where(select, i, t_pad + i))


def diff_stats(x, n_valid):
    """Stats over d = diff(x[:n_valid]) matching the host-side semantics:

    returns (mean rise, mean fall, mean |d|, std |d|) where rise/fall average
    the strictly positive / strictly negative diffs (0 when none exist), and
    |d| stats are population moments over the n_valid-1 diffs (0 when fewer
    than 2 valid elements).
    """
    d = x[..., 1:] - x[..., :-1]
    dm = jnp.arange(d.shape[-1]) < (n_valid - 1)
    rise_m = dm & (d > 0)
    fall_m = dm & (d < 0)
    rise = jnp.where(
        jnp.sum(rise_m, -1) > 0,
        jnp.sum(d * rise_m, -1) / jnp.maximum(jnp.sum(rise_m, -1), 1),
        0.0,
    )
    fall = jnp.where(
        jnp.sum(fall_m, -1) > 0,
        jnp.sum(d * fall_m, -1) / jnp.maximum(jnp.sum(fall_m, -1), 1),
        0.0,
    )
    ad = jnp.abs(d)
    n_d = jnp.sum(dm, -1)
    has = n_d > 0
    mu = jnp.where(has, jnp.sum(ad * dm, -1) / jnp.maximum(n_d, 1), 0.0)
    var = jnp.where(
        has,
        jnp.sum(dm * (ad - mu[..., None]) ** 2, -1) / jnp.maximum(n_d, 1),
        0.0,
    )
    return rise, fall, mu, jnp.sqrt(jnp.maximum(var, 0.0))


def chunked_wave_batches(waveforms, quantum, batch_size, n_frames_fn):
    """Yield (utt_ids, W, ts, ns) padded host chunks for device featurizing.

    Shared driver for the functional-feature batch extractors: buckets by
    padded length (one jit shape each), chunks to power-of-two row counts,
    zero-pads, and reports per-row frame/sample counts.  Padded rows carry
    frame count 1 and are dropped by the caller.

    If EVERY waveform is int16 PCM the staged chunks stay int16 — half the
    host->device bytes — and the consuming device programs normalize via
    ``frontend.pcm_to_float`` (exact, see its docstring).  Mixed dtypes fall
    back to float32 staging with int16 rows normalized on host.
    """
    utt_ids = list(waveforms)
    lengths = [len(waveforms[u]) for u in utt_ids]
    dtype = (np.int16
             if utt_ids and all(waveforms[u].dtype == np.int16 for u in utt_ids)
             else np.float32)
    for bucket_len, idxs in sorted(bucket_indices(lengths, quantum).items()):
        for lo in range(0, len(idxs), batch_size):
            chunk = idxs[lo : lo + batch_size]
            rows = pow2_rows(len(chunk), batch_size)
            W = np.zeros((rows, bucket_len), dtype)
            ts = np.ones(rows, np.int32)
            ns = np.ones(rows, np.int32)
            for row, i in enumerate(chunk):
                w = waveforms[utt_ids[i]]
                if w.dtype == np.int16 and dtype == np.float32:
                    w = w.astype(np.float32) * np.float32(1.0 / 32768.0)
                W[row, : len(w)] = w
                ts[row] = n_frames_fn(len(w))
                ns[row] = len(w)
            yield [utt_ids[i] for i in chunk], W, ts, ns

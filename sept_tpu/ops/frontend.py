"""Audio feature frontend, TPU-first.

Re-implements — to numerical parity — the spectral features the reference
pipeline computes with torchaudio (see
/root/reference/feature_extraction/audio_feature_extraction.py:15-46):

- ``mfcc`` replicates ``torchaudio.transforms.MFCC(sample_rate=16000, n_mfcc=40)``
  with its default MelSpectrogram (n_fft=400, hop=200, n_mels=128, HTK mel,
  power 2.0, center/reflect padding) and AmplitudeToDB('power', top_db=80).
- ``mfcc_with_deltas`` replicates the reference's unconventional delta scheme:
  the MFCC of the waveform's 1st/2nd numpy-gradient, concatenated to 120 dims
  (audio_feature_extraction.py:20-26). Note ``np.gradient(x, 2)`` treats the 2
  as a *sample spacing*, not an order — we reproduce that exactly.
- ``mel_spectrogram`` replicates the reference's ``mel_spectrogram()`` helper
  (n_mels=128, hop=160, Hann, AmplitudeToDB with top_db=None), which is called
  with n_fft=800 ("mel1") and n_fft=1600 ("mel2").

Design: instead of translating torchaudio's FFT path, the STFT is expressed as
**framing + DFT-matrix matmul** so the whole chain
``frames @ DFT -> power -> @ mel_fbank -> log10 -> @ DCT``
lands on the MXU as a sequence of GEMMs that XLA fuses with the elementwise
stages.  An ``mode='fft'`` path via ``jnp.fft.rfft`` is kept as the numerical
oracle / CPU fallback.  All constant matrices are float32 numpy arrays baked
into the jaxpr at trace time.

Everything here is shape-static and jit/vmap-friendly.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

# Parity-critical GEMMs (DFT / mel / DCT) run at full float32 MXU precision by
# default: the TPU MXU's default precision downcasts inputs to bfloat16 passes,
# which costs ~1e-3 relative error vs. the torchaudio oracle.  Set to
# ``jax.lax.Precision.DEFAULT`` for maximum-throughput featurization where
# bit-parity is not required.
PARITY_PRECISION = jax.lax.Precision.HIGHEST

__all__ = [
    "hann_window",
    "hz_to_mel",
    "mel_to_hz",
    "melscale_fbanks",
    "create_dct",
    "frame_signal",
    "stft_power",
    "amplitude_to_db",
    "mel_spectrogram",
    "mfcc",
    "mfcc_with_deltas",
    "np_gradient",
    "pcm_to_float",
]


def pcm_to_float(x):
    """Normalize int16 PCM to float32 in [-1, 1); float input passes through.

    Multiplying by the exact power-of-two reciprocal 2^-15 reproduces
    torchaudio's int16 load normalization bit-for-bit (every int16/32768 is
    exactly representable in float32), so pipelines may stage raw PCM16 to
    the device — HALF the host->device bytes of float32 waves, the dominant
    cost of the featurize stage on this environment (docs/ARCHITECTURE.md
    §2) — and convert on device with no parity loss.  Called at the top of
    every jitted program that consumes staged waveforms; jit specializes on
    dtype, so the float path is unchanged.
    """
    if x.dtype == jnp.int16:
        return x.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
    return x


# ---------------------------------------------------------------------------
# Constant matrices (numpy, float64 internally, cast to float32 at the edge)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    """Hann window matching ``torch.hann_window(win_length, periodic=True)``."""
    n = win_length if periodic else win_length - 1
    k = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * math.pi * k / n)
    return w.astype(np.float32)


def hz_to_mel(freq, mel_scale: str = "htk"):
    """HTK mel scale: 2595 * log10(1 + f/700). (Slaney also supported.)"""
    freq = np.asarray(freq, dtype=np.float64)
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3.0
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(
        freq >= min_log_hz, min_log_mel + np.log(freq / min_log_hz) / logstep, mels
    )


def mel_to_hz(mels, mel_scale: str = "htk"):
    mels = np.asarray(mels, dtype=np.float64)
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3.0
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(
        mels >= min_log_mel, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )


@functools.lru_cache(maxsize=None)
def melscale_fbanks(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
    norm: str | None = None,
    mel_scale: str = "htk",
) -> np.ndarray:
    """Triangular mel filterbank, (n_freqs, n_mels).

    Matches ``torchaudio.functional.melscale_fbanks``; note torchaudio uses
    ``linspace(0, sample_rate // 2, n_freqs)`` (integer floor-div).
    """
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min = hz_to_mel(f_min, mel_scale)
    m_max = hz_to_mel(f_max, mel_scale)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = mel_to_hz(m_pts, mel_scale)

    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down_slopes = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb *= enorm[None, :]
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=None)
def create_dct(n_mfcc: int, n_mels: int, norm: str | None = "ortho") -> np.ndarray:
    """DCT-II basis, (n_mels, n_mfcc), matching ``torchaudio.functional.create_dct``."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)[:, None]
    dct = np.cos(math.pi / n_mels * (n + 0.5) * k)  # (n_mfcc, n_mels)
    if norm is None:
        dct *= 2.0
    else:
        if norm != "ortho":
            raise ValueError(f"unsupported DCT norm: {norm!r}")
        dct[0] *= 1.0 / math.sqrt(2.0)
        dct *= math.sqrt(2.0 / n_mels)
    return dct.T.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _rdft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT cos/sin matrices, each (n_fft, n_fft//2 + 1).

    ``frames @ cos`` = Re(rfft), ``frames @ (-sin)`` = Im(rfft).
    """
    n_freq = n_fft // 2 + 1
    t = np.arange(n_fft, dtype=np.float64)[:, None]
    f = np.arange(n_freq, dtype=np.float64)[None, :]
    ang = 2.0 * math.pi * t * f / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


# ---------------------------------------------------------------------------
# STFT / spectrogram
# ---------------------------------------------------------------------------


def frame_signal(
    wave: jax.Array,
    n_fft: int,
    hop_length: int,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jax.Array:
    """Slice a 1-D waveform into overlapping frames, (n_frames, n_fft).

    With ``center=True`` the signal is padded by n_fft//2 on each side
    (reflect), matching ``torch.stft``; n_frames = 1 + len(wave)//hop.
    """
    if center:
        pad = n_fft // 2
        wave = jnp.pad(wave, (pad, pad), mode=pad_mode)
    length = wave.shape[-1]
    n_frames = 1 + (length - n_fft) // hop_length
    starts = np.arange(n_frames) * hop_length
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    return wave[idx]


def stft_power(
    wave: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    power: float = 2.0,
    center: bool = True,
    pad_mode: str = "reflect",
    mode: str = "matmul",
    precision=PARITY_PRECISION,
) -> jax.Array:
    """Power spectrogram of a 1-D waveform, (n_freq, n_frames).

    Matches ``torchaudio.transforms.Spectrogram`` semantics (Hann window,
    onesided, not normalized).  ``mode='matmul'`` runs the DFT as two GEMMs on
    the MXU; ``mode='fft'`` uses ``jnp.fft.rfft`` (numerical oracle).
    """
    if win_length is None:
        win_length = n_fft
    window = hann_window(win_length)
    if win_length < n_fft:  # torchaudio center-pads the window to n_fft
        left = (n_fft - win_length) // 2
        window = np.pad(window, (left, n_fft - win_length - left))

    frames = frame_signal(wave, n_fft, hop_length, center, pad_mode)
    frames = frames * jnp.asarray(window)[None, :]

    if mode == "fft":
        spec = jnp.fft.rfft(frames, axis=-1)
        p = jnp.abs(spec) ** power
    elif mode == "matmul":
        cos_m, sin_m = _rdft_matrices(n_fft)
        re = jnp.dot(frames, jnp.asarray(cos_m), precision=precision,
                     preferred_element_type=jnp.float32)
        im = jnp.dot(frames, jnp.asarray(sin_m), precision=precision,
                     preferred_element_type=jnp.float32)
        sq = re * re + im * im
        p = sq if power == 2.0 else jnp.power(jnp.sqrt(sq), power)
    else:
        raise ValueError(f"unknown stft mode: {mode!r}")
    return p.T  # (n_freq, n_frames)


def amplitude_to_db(
    x: jax.Array,
    stype: str = "power",
    top_db: float | None = None,
    amin: float = 1e-10,
    ref: float = 1.0,
) -> jax.Array:
    """``torchaudio.transforms.AmplitudeToDB`` semantics.

    db = multiplier * log10(clamp(x, amin)) - multiplier * log10(max(amin, ref));
    with ``top_db`` the result is floored at (max over the whole spectrogram
    excluding leading batch dims beyond 3) - top_db.  For the shapes used here
    (mel, time) or (channel, mel, time) that is a global max, matching the
    reference's per-utterance processing.
    """
    multiplier = 10.0 if stype == "power" else 20.0
    db = multiplier * jnp.log10(jnp.maximum(x, amin))
    db = db - multiplier * math.log10(max(amin, ref))
    if top_db is not None:
        if x.ndim <= 3:
            floor = jnp.max(db) - top_db
            db = jnp.maximum(db, floor)
        else:  # batched: max over the trailing (channel, freq, time)
            floor = jnp.max(db, axis=(-3, -2, -1), keepdims=True) - top_db
            db = jnp.maximum(db, floor)
    return db


# ---------------------------------------------------------------------------
# Mel spectrogram / MFCC
# ---------------------------------------------------------------------------


def mel_spectrogram(
    wave: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 160,
    n_mels: int = 128,
    sample_rate: int = 16000,
    f_min: float = 0.0,
    f_max: float | None = None,
    power: float = 2.0,
    to_db: bool = True,
    top_db: float | None = None,
    mode: str = "matmul",
    precision=PARITY_PRECISION,
) -> jax.Array:
    """Log-mel spectrogram, (n_mels, n_frames).

    Defaults replicate the reference ``mel_spectrogram()``
    (audio_feature_extraction.py:29-46): hop 160, Hann, n_mels=feature_len,
    AmplitudeToDB with top_db=None; called with n_fft=800 and 1600.
    """
    if f_max is None:
        f_max = float(sample_rate // 2)
    spec = stft_power(wave, n_fft, hop_length, power=power, mode=mode,
                      precision=precision)
    fb = melscale_fbanks(n_fft // 2 + 1, f_min, f_max, n_mels, sample_rate)
    mel = jnp.dot(
        spec.T, jnp.asarray(fb), precision=precision,
        preferred_element_type=jnp.float32,
    ).T  # (n_mels, T)
    if to_db:
        mel = amplitude_to_db(mel, "power", top_db=top_db)
    return mel


def mfcc(
    wave: jax.Array,
    sample_rate: int = 16000,
    n_mfcc: int = 40,
    n_fft: int = 400,
    hop_length: int = 200,
    n_mels: int = 128,
    top_db: float = 80.0,
    mode: str = "matmul",
    precision=PARITY_PRECISION,
) -> jax.Array:
    """MFCC, (n_mfcc, n_frames), matching ``torchaudio.transforms.MFCC`` defaults.

    torchaudio's default MelSpectrogram inside MFCC uses n_fft=400,
    hop=n_fft//2=200, n_mels=128; log_mels=False means AmplitudeToDB('power',
    top_db=80); DCT-II with ortho norm (audio_feature_extraction.py:17).
    """
    mel = mel_spectrogram(
        wave,
        n_fft=n_fft,
        hop_length=hop_length,
        n_mels=n_mels,
        sample_rate=sample_rate,
        to_db=True,
        top_db=top_db,
        mode=mode,
        precision=precision,
    )
    dct = create_dct(n_mfcc, n_mels, "ortho")
    return jnp.dot(mel.T, jnp.asarray(dct), precision=precision,
                   preferred_element_type=jnp.float32).T


def np_gradient(x: jax.Array, spacing: float = 1.0) -> jax.Array:
    """``np.gradient`` on a 1-D array: central differences, one-sided edges.

    The reference passes ``np.gradient(audio, 2)`` for its "second derivative"
    (audio_feature_extraction.py:21) — numpy treats that 2 as a *spacing*, so
    the result is simply gradient/2.  Reproduced faithfully.
    """
    interior = (x[2:] - x[:-2]) / (2.0 * spacing)
    left = (x[1] - x[0]) / spacing
    right = (x[-1] - x[-2]) / spacing
    return jnp.concatenate([left[None], interior, right[None]])


def mfcc_with_deltas(wave: jax.Array, mode: str = "matmul") -> jax.Array:
    """The reference's 120-dim MFCC stack: [mfcc; mfcc(grad); mfcc(grad, h=2)].

    Replicates audio_feature_extraction.py:15-26: the "delta" features are the
    MFCC *of the numerically differentiated waveform*, not delta-MFCCs.
    Returns (120, n_frames).
    """
    base = mfcc(wave, mode=mode)
    d1 = mfcc(np_gradient(wave, 1.0), mode=mode)
    d2 = mfcc(np_gradient(wave, 2.0), mode=mode)
    return jnp.concatenate([base, d1, d2], axis=0)

"""On-device ingest: waveforms -> features -> windows -> normalized batches,
entirely in HBM.

The reference pipeline bounces every stage through host pickles
(/root/reference/preprocess_data/, SURVEY.md §1 "Data flows exclusively
through pickled Python dicts").  On TPU — especially over a tunneled chip
where device->host readback is orders of magnitude slower than host->device —
the right design streams raw waveforms to HBM once and keeps every
intermediate (spectrogram, windows, normalization statistics) on device:

    host:   reflect-pad + zero-pad waveforms to a shared length   (cheap)
    device: STFT/mel GEMM chain -> (N, T, D) features
            per-speaker mean/std via segment sums                  (znorm)
            window gather -> (N*W, win, D) training windows
    train:  batches sliced on device; only scalar metrics return

All shapes static; one jit for the whole ingest.  Semantics match the host
pipeline (sept_tpu.data.pipeline) exactly for utterances that fit a single
window (<= win_len frames); parity is covered by
tests/test_device_pipeline.py.  For LONGER utterances the per-speaker
normalization statistics deliberately differ: the host path replicates the
reference's accumulation over every WRITTEN window row (interior frames of
overlapping windows are counted up to win_len/shift_len times,
preprocess_adversary_data.py:357-390), while the device path counts each
valid frame exactly once — an intentional simplification that keeps the
segment-sum formulation one pass, documented here so nobody swaps paths
expecting bit-equal stats at corpus scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sept_tpu.ops import frontend as F

__all__ = ["prepare_waves", "device_ingest", "DeviceDataset"]

_HOP = 160


def prepare_waves(
    waveforms: list[np.ndarray], n_fft: int = 800
) -> tuple[np.ndarray, np.ndarray]:
    """Host prep: reflect-pad each wave at its true boundary (preserving
    center-STFT parity), zero-pad to the batch max.  Returns
    (padded (N, Lmax+n_fft), n_frames (N,)).

    int16 PCM input stays int16 (reflect-pad is a permutation, exact in any
    dtype); the device program normalizes with ``F.pcm_to_float``, so PCM16
    corpora cross host->device at half the bytes of float32 with bit-equal
    results."""
    pad = n_fft // 2
    lengths = np.asarray([len(w) for w in waveforms])
    lmax = int(lengths.max())
    frames = (1 + lengths // _HOP).astype(np.int32)
    dtype = (np.int16 if all(w.dtype == np.int16 for w in waveforms)
             else np.float32)
    if dtype == np.float32:
        # mixed-dtype fallback: normalize any int16 rows on host
        waveforms = [
            w.astype(np.float32) * np.float32(1.0 / 32768.0)
            if w.dtype == np.int16 else w
            for w in waveforms
        ]
    if (lengths == lmax).all():
        # equal-length fast path: one vectorized reflect-pad
        stacked = np.ascontiguousarray(
            np.stack(waveforms).astype(dtype, copy=False)
        )
        return np.pad(stacked, ((0, 0), (pad, pad)), mode="reflect"), frames
    out = np.zeros((len(waveforms), lmax + n_fft), dtype=dtype)
    for i, w in enumerate(waveforms):
        out[i, : len(w) + n_fft] = np.pad(w, (pad, pad), mode="reflect")
    return out, frames


class DeviceDataset:
    """Device-resident training windows + labels, sliceable per batch."""

    def __init__(self, windows, labels_emo, labels_gen, weight):
        self.windows = windows  # (M, win, D) device array
        self.labels_emo = labels_emo
        self.labels_gen = labels_gen
        self.weight = weight  # (M,) 0 for masked/padding windows

    def __len__(self):
        return self.windows.shape[0]

    def batch(self, idx: jax.Array) -> dict:
        """Gather a batch by (device-resident) indices; stays on device."""
        return {
            "spec": self.windows[idx][..., None],
            "labels_emo": self.labels_emo[idx],
            "labels_gen": self.labels_gen[idx],
            "global": jnp.zeros((idx.shape[0], 88), jnp.float32),
            "weight": self.weight[idx],
        }


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "n_mels", "win_len", "shift_len", "n_speakers",
                     "max_windows", "frontend"),
)
def _ingest(
    padded_waves,  # (N, L + n_fft) — already reflect-padded at true boundary
    n_frames,  # (N,) true frame counts
    speaker_idx,  # (N,) int32 in [0, n_speakers)
    labels_emo,  # (N,)
    labels_gen,  # (N,)
    *,
    n_fft: int,
    n_mels: int,
    win_len: int,
    shift_len: int,
    n_speakers: int,
    max_windows: int,
    frontend: str = "xla",
):
    n = padded_waves.shape[0]
    padded_waves = F.pcm_to_float(padded_waves)  # int16 PCM staging: exact

    if frontend == "pallas_bf16":
        # throughput mode: the fused Pallas kernel with bf16 MXU GEMMs +
        # f32 accumulation — measured 1.47x the XLA f32 chain on v5e
        # (docs/ARCHITECTURE.md); ~6e-2 dB p99 deviation from the
        # torchaudio oracle (hardware bound asserted < 0.1 dB in
        # tests_tpu/), acceptable for bulk training ingest
        from sept_tpu.ops.pallas_frontend import pallas_mel_spectrogram

        feats = pallas_mel_spectrogram(
            padded_waves, n_fft=n_fft, hop=_HOP, n_mels=n_mels, bf16=True,
            interpret=jax.default_backend() == "cpu",  # no Mosaic on CPU
        )  # (N, Tmax, D)
    else:  # parity mode (default): XLA GEMM chain at Precision.HIGHEST
        def one_mel(w):
            spec = F.stft_power(w, n_fft, _HOP, center=False)
            fb = jnp.asarray(F.melscale_fbanks(n_fft // 2 + 1, 0.0, 8000.0,
                                               n_mels, 16000))
            mel = jnp.dot(spec.T, fb, precision=F.PARITY_PRECISION,
                          preferred_element_type=jnp.float32)
            return F.amplitude_to_db(mel.T, "power", None).T  # (T, n_mels)

        feats = jax.vmap(one_mel)(padded_waves)  # (N, Tmax, D)
    tmax = feats.shape[1]
    frame_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (n, tmax), 1) < n_frames[:, None]
    )

    # per-speaker znorm stats over VALID frames (segment sums via one-hot GEMM)
    onehot = jax.nn.one_hot(speaker_idx, n_speakers, dtype=jnp.float32)  # (N, S)
    fmask = frame_valid.astype(jnp.float32)[..., None]  # (N, T, 1)
    counts = jnp.einsum("ns,nt->s", onehot, fmask[..., 0]) + 1e-8  # frames/spk
    sums = jnp.einsum("ns,ntd->sd", onehot, feats * fmask)
    means = sums / counts[:, None]
    # centered two-pass variance: dB-scale features make E[x^2]-E[x]^2
    # cancel badly in float32
    centered = (feats - means[speaker_idx][:, None, :]) * fmask
    sq = jnp.einsum("ns,ntd->sd", onehot, centered**2)
    stds = jnp.sqrt(jnp.maximum(sq / counts[:, None], 0.0))

    normed = (feats - means[speaker_idx][:, None, :]) / (
        stds[speaker_idx][:, None, :] + 1e-5
    )
    normed = normed * fmask  # zero padding rows (matches host zero-pad)

    # short-corpus edge: ensure at least win_len frames so the window gather
    # never clamps out of range (pad rows are zeros, matching host zero-pad)
    if tmax < win_len:
        normed = jnp.pad(normed, ((0, 0), (0, win_len - tmax), (0, 0)))

    # windows: (N, max_windows, win, D) gather, then flatten
    starts = jnp.arange(max_windows) * shift_len  # (W,)
    widx = starts[:, None] + jnp.arange(win_len)[None, :]  # (W, win)
    windows = normed[:, widx, :]  # (N, W, win, D)
    n_valid = jnp.maximum((n_frames - win_len) // shift_len, 0) + 1
    wvalid = (
        jax.lax.broadcasted_iota(jnp.int32, (n, max_windows), 1)
        < n_valid[:, None]
    )

    m = n * max_windows
    return (
        windows.reshape(m, win_len, n_mels),
        jnp.repeat(labels_emo, max_windows),
        jnp.repeat(labels_gen, max_windows),
        wvalid.reshape(m).astype(jnp.float32),
    )


def device_ingest(
    waveforms: list[np.ndarray],
    speaker_idx: np.ndarray,
    labels_emo: np.ndarray,
    labels_gen: np.ndarray,
    n_fft: int = 800,
    n_mels: int = 128,
    win_len: int = 200,
    shift_len: int = 50,
    frontend: str = "xla",
) -> DeviceDataset:
    """Full waveforms->normalized-windows ingest in one jitted device program.

    Only the padded waveforms cross host->device; nothing returns to host.
    ``frontend``: "xla" (parity, default) or "pallas_bf16" (fused Pallas
    kernel, bf16 MXU passes — the measured-fastest mel path on v5e).
    """
    padded, n_frames = prepare_waves(waveforms, n_fft)
    tmax = int(n_frames.max())
    max_windows = max(0, (tmax - win_len) // shift_len) + 1
    n_speakers = int(np.max(speaker_idx)) + 1
    windows, le, lg, wv = _ingest(
        jnp.asarray(padded),
        jnp.asarray(n_frames),
        jnp.asarray(speaker_idx, dtype=jnp.int32),
        jnp.asarray(labels_emo, dtype=jnp.int32),
        jnp.asarray(labels_gen, dtype=jnp.int32),
        n_fft=n_fft,
        n_mels=n_mels,
        win_len=win_len,
        shift_len=shift_len,
        n_speakers=n_speakers,
        max_windows=max_windows,
        frontend=frontend,
    )
    return DeviceDataset(windows, le, lg, wv)

"""Fused Pallas TPU kernel for the audio frontend's hot path.

One kernel fuses the whole per-frame chain of the reference's featurization
(/root/reference/feature_extraction/audio_feature_extraction.py:29-46):

    frame tiles (HBM --blocked pipeline--> VMEM)
      -> Hann window      (VPU)
      -> real DFT         (two MXU GEMMs against cos/sin matrices in VMEM)
      -> power            (VPU)
      -> mel filterbank   (MXU GEMM)
      -> 10*log10         (VPU)

Framing (the overlapped im2col) stays OUTSIDE the kernel as an XLA gather:
Mosaic's tiling constraints reject every in-kernel expression of a
hop=160-strided overlap (1-D->2-D shape casts, lane-concats at non-128
offsets, and DMA lane-slices of width 160 all fail to lower), and the gather
is a bandwidth-trivial fraction of the op.  The kernel then streams frame
tiles through VMEM via ordinary blocked IO with the DFT/mel matrices
resident, which is where the fusion actually pays.

The input waveform must be host reflect-padded at its true boundary
(center-STFT semantics), exactly like sept_tpu.data.device_pipeline.

Grid: (frame-tiles,) over the flattened (batch * frames) axis.

Status / measurements (TPU v5e via the axon tunnel, 2026-08-16): compiles
through Mosaic; f32 parity 2.2e-4 dB vs the jnp HIGHEST-precision path.  In
f32 the XLA-fused GEMM chain (sept_tpu.data.device_pipeline / featurize)
remains the parity default — XLA already fuses window/power/log into the
DFT GEMMs and pipelines constant operands across tiles.  The
``dtype=bfloat16`` throughput mode (bf16 MXU GEMMs, f32 accumulation)
measured 1.47x the XLA f32 chain on-device (~6e-2 dB p99 vs the oracle) and
is the opt-in ``device_ingest(frontend="pallas_bf16")`` path;
``pallas_mfcc`` fuses the top_db floor + DCT as a second VMEM kernel.
Numbers and the decision record: docs/ARCHITECTURE.md section 5b; hardware
regression tests: tests_tpu/.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sept_tpu.ops import frontend as F

__all__ = ["pallas_mel_spectrogram", "pallas_mfcc"]


def _mel_kernel(
    frames_ref,  # (TILE, n_fft) VMEM block of windowless frames
    window_ref,  # (1, n_fft) VMEM
    cos_ref,  # (n_fft, n_freq) VMEM
    sin_ref,  # (n_fft, n_freq) VMEM
    fb_ref,  # (n_freq, n_mels) VMEM
    out_ref,  # (TILE, n_mels) VMEM block
    *,
    amin: float,
):
    frames = frames_ref[:, :] * window_ref[0, :][None, :]
    # parity mode (f32 operands): full-f32 MXU passes — default precision
    # costs ~0.5 relative error on the power spectrum (1.9 dB after log),
    # breaking torchaudio parity.  throughput mode (bf16 operands): the MXU's
    # native bf16 systolic passes with f32 accumulation
    # (preferred_element_type) — ~1e-2 dB deviation, ~4x the GEMM rate.
    hi = (jax.lax.Precision.HIGHEST if frames_ref.dtype == jnp.float32
          else jax.lax.Precision.DEFAULT)
    re = jnp.dot(frames, cos_ref[:, :], precision=hi,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:, :], precision=hi,
                 preferred_element_type=jnp.float32)
    power = re * re + im * im  # f32 regardless of input dtype
    power = power.astype(fb_ref.dtype)
    mel = jnp.dot(power, fb_ref[:, :], precision=hi,
                  preferred_element_type=jnp.float32)
    out_ref[:, :] = 10.0 * jnp.log10(jnp.maximum(mel, amin))


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop", "n_mels", "tile", "bf16", "interpret"),
)
def pallas_mel_spectrogram(
    padded_waves: jax.Array,  # (B, L) — host reflect-padded, L >= frames*hop+n_fft
    n_fft: int = 800,
    hop: int = 160,
    n_mels: int = 128,
    tile: int = 128,
    bf16: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Fused mel spectrogram, (B, n_frames, n_mels), dB (top_db=None).

    n_frames = (L - n_fft) // hop rounded down to a multiple of ``tile``
    worth of full tiles plus the remainder handled by padding L upward; pad
    the input generously and trim the output to the true frame count.

    ``bf16``: throughput mode — the DFT/mel GEMMs run as native bf16 MXU
    passes with f32 accumulation (output stays f32 dB).  Use for bulk
    featurization where ~1e-2 dB deviation from the torchaudio oracle is
    acceptable; the default f32 mode holds parity to ~2e-4 dB.
    """
    b, l = padded_waves.shape
    n_frames_total = (l - n_fft) // hop + 1
    n_tiles = -(-(b * n_frames_total) // tile)

    # XLA im2col: (B, T, n_fft) overlapped frames, flattened over (B, T)
    starts = jnp.arange(n_frames_total) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    frames = padded_waves[:, idx]  # (B, T, n_fft)
    frames = frames.reshape(b * n_frames_total, n_fft)
    pad_rows = n_tiles * tile - frames.shape[0]
    if pad_rows:
        frames = jnp.pad(frames, ((0, pad_rows), (0, 0)))

    dt = jnp.bfloat16 if bf16 else jnp.float32
    frames = frames.astype(dt)
    n_freq = n_fft // 2 + 1
    window = jnp.asarray(F.hann_window(n_fft)).astype(dt)[None, :]
    cos_m, sin_m = F._rdft_matrices(n_fft)
    cos_m, sin_m = cos_m.astype(dt), sin_m.astype(dt)
    fb = jnp.asarray(
        F.melscale_fbanks(n_freq, 0.0, 8000.0, n_mels, 16000)
    ).astype(dt)

    kernel = functools.partial(_mel_kernel, amin=1e-10)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, n_fft), lambda t_: (t_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_fft), lambda t_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freq), lambda t_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freq), lambda t_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freq, n_mels), lambda t_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, n_mels), lambda t_: (t_, 0), memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, n_mels), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * tile * n_fft * n_freq * 2
            + 2 * n_tiles * tile * n_freq * n_mels,
            bytes_accessed=n_tiles * tile * (n_fft + n_mels) * 4,
            transcendentals=n_tiles * tile * n_mels,
        ),
        interpret=interpret,
    )(frames, window, jnp.asarray(cos_m), jnp.asarray(sin_m), fb)
    return out[: b * n_frames_total].reshape(b, n_frames_total, n_mels)


def _floor_dct_kernel(
    mel_ref,  # (TILE, n_mels) un-floored mel-dB block
    floor_ref,  # (TILE, 1) per-row top_db floor
    dct_ref,  # (n_mels, n_mfcc)
    out_ref,  # (TILE, n_mfcc)
):
    floored = jnp.maximum(mel_ref[:, :], floor_ref[:, :])
    out_ref[:, :] = jnp.dot(
        floored, dct_ref[:, :], precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_mfcc", "n_fft", "hop", "n_mels", "tile", "top_db",
                     "bf16", "interpret"),
)
def pallas_mfcc(
    padded_waves: jax.Array,  # (B, L) host reflect-padded (pad = n_fft//2)
    n_mfcc: int = 40,
    n_fft: int = 400,
    hop: int = 200,
    n_mels: int = 128,
    tile: int = 128,
    top_db: float = 80.0,
    bf16: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Fused MFCC, (B, n_frames, n_mfcc), torchaudio-default semantics.

    Two fused kernels: (1) the mel kernel producing un-floored mel-dB tiles;
    (2) a floor+DCT kernel.  The top_db floor depends on the
    utterance-GLOBAL max of the mel-dB spectrogram, so it cannot live inside
    a tile-local kernel — the per-utterance max is a cheap XLA reduction
    between the two pallas calls, broadcast back per row into kernel 2 where
    the clamp fuses with the DCT GEMM in VMEM.
    """
    b, l = padded_waves.shape
    n_frames_total = (l - n_fft) // hop + 1
    dct = jnp.asarray(F.create_dct(n_mfcc, n_mels, "ortho"))

    mel_db = pallas_mel_spectrogram(
        padded_waves, n_fft=n_fft, hop=hop, n_mels=n_mels, tile=tile,
        bf16=bf16, interpret=interpret,
    )  # (B, T, n_mels) un-floored
    mel_db = mel_db[:, :n_frames_total, :]
    if top_db is None:
        return jnp.dot(mel_db, dct, precision=F.PARITY_PRECISION,
                       preferred_element_type=jnp.float32)

    floor = jnp.max(mel_db, axis=(1, 2), keepdims=True) - top_db  # (B,1,1)
    rows = b * n_frames_total
    n_tiles = -(-rows // tile)
    pad_rows = n_tiles * tile - rows
    mel_flat = mel_db.reshape(rows, n_mels)
    floor_flat = jnp.broadcast_to(floor, (b, n_frames_total, 1)).reshape(rows, 1)
    if pad_rows:
        mel_flat = jnp.pad(mel_flat, ((0, pad_rows), (0, 0)))
        floor_flat = jnp.pad(floor_flat, ((0, pad_rows), (0, 0)))

    out = pl.pallas_call(
        _floor_dct_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, n_mels), lambda t_: (t_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda t_: (t_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_mels, n_mfcc), lambda t_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, n_mfcc), lambda t_: (t_, 0), memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, n_mfcc), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(mel_flat, floor_flat, dct)
    return out[:rows].reshape(b, n_frames_total, n_mfcc)

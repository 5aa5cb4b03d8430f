"""Batched corpus featurization on TPU.

TPU-native replacement for the reference's per-utterance CPU loop
(/root/reference/feature_extraction/audio_feature_extraction.py:176-189):
waveforms are bucketed by length, host-side *reflect*-padded at their true
boundary (preserving torch.stft center-pad parity for the trailing frames —
zero-padding to the bucket length only touches frames beyond the utterance's
true frame count, which are trimmed), then featurized as one vmapped, jitted
GEMM chain per bucket shape.

Produces the reference feature-store schema: per utterance
``mfcc`` (120, T), ``mel1`` (128, T; n_fft=800), ``mel2`` (128, T;
n_fft=1600), plus the 88-dim ``gemaps`` functionals
(sept_tpu.ops.egemaps, our TPU functional frontend standing in for the
openSMILE C++ dependency).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sept_tpu.ops import frontend as F
from sept_tpu.ops.functionals import pow2_rows

__all__ = ["featurize_corpus", "feature_frames"]

_HOP = 160  # reference mel hop (audio_feature_extraction.py:32)
_MFCC_HOP = 200  # torchaudio MFCC default hop


def feature_frames(n_samples: int, hop: int) -> int:
    """Frame count for a center-padded STFT: 1 + n//hop."""
    return 1 + n_samples // hop


def _reflect_pad(wave: np.ndarray, pad: int) -> np.ndarray:
    return np.pad(wave, (pad, pad), mode="reflect")


@functools.lru_cache(maxsize=None)
def _bucket_featurizer(bucket_len: int, feature_type: str, feature_len: int):
    """Build the jitted per-bucket featurizer for a given padded length."""

    if feature_type == "mel_spec":

        def single(wave_padded_800, wave_padded_1600):
            mel1 = F.stft_power(wave_padded_800, 800, _HOP, center=False)
            mel2 = F.stft_power(wave_padded_1600, 1600, _HOP, center=False)
            fb = jnp.asarray(F.melscale_fbanks(401, 0.0, 8000.0, feature_len, 16000))
            fb2 = jnp.asarray(F.melscale_fbanks(801, 0.0, 8000.0, feature_len, 16000))
            m1 = jnp.dot(mel1.T, fb, precision=F.PARITY_PRECISION,
                         preferred_element_type=jnp.float32)
            m2 = jnp.dot(mel2.T, fb2, precision=F.PARITY_PRECISION,
                         preferred_element_type=jnp.float32)
            # AmplitudeToDB(top_db=None): per-utterance global op, safe batched
            return (
                F.amplitude_to_db(m1.T, "power", None),
                F.amplitude_to_db(m2.T, "power", None),
            )

        return jax.jit(jax.vmap(single))

    if feature_type == "mfcc":
        # inputs arrive host reflect-padded (center=False framing), keeping
        # torch.stft center parity for trailing frames under bucket zero-pad
        def one_mfcc(w_padded):
            spec = F.stft_power(w_padded, 400, _MFCC_HOP, center=False)
            fb = jnp.asarray(F.melscale_fbanks(201, 0.0, 8000.0, 128, 16000))
            mel = jnp.dot(spec.T, fb, precision=F.PARITY_PRECISION,
                          preferred_element_type=jnp.float32).T
            mel_db = F.amplitude_to_db(mel, "power", top_db=80.0)
            dct = jnp.asarray(F.create_dct(40, 128, "ortho"))
            return jnp.dot(mel_db.T, dct, precision=F.PARITY_PRECISION,
                           preferred_element_type=jnp.float32).T

        def single(w, w_d1, w_d2):
            return jnp.concatenate(
                [one_mfcc(w), one_mfcc(w_d1), one_mfcc(w_d2)], axis=0
            )

        return jax.jit(jax.vmap(single))

    raise ValueError(f"unknown feature_type: {feature_type!r}")


def _buckets(lengths: list[int], quantum: int = 8000) -> dict[int, list[int]]:
    """Group utterance indices into padded-length buckets.

    Geometric (quantum * 2^k) buckets: compiles over a tunneled chip cost
    tens of seconds each, so the number of distinct jit shapes is bounded at
    log2(max_len/quantum) and the extra padded GEMM work is absorbed by the
    MXU (outputs are trimmed to each utterance's true frame count anyway).
    """
    from sept_tpu.ops.functionals import bucket_indices

    return bucket_indices(lengths, quantum, geometric=True)


def featurize_corpus(
    waveforms: dict[str, np.ndarray],
    feature_type: str = "mel_spec",
    feature_len: int = 128,
    include_gemaps: bool = True,
    include_emobase: bool | None = None,
    quantum: int = 8000,
    batch_size: int = 64,
) -> dict[str, dict[str, np.ndarray]]:
    """Featurize every waveform; returns the reference feature-store dict.

    mel_spec path emits {'mel1': (feature_len, T), 'mel2': ...}; mfcc path
    emits {'mfcc': (120, T)}.  T = 1 + len//hop per utterance (trimmed).
    Functional descriptors follow the reference store schema
    (audio_feature_extraction.py:188-189): 88-dim ``gemaps`` and 988-dim
    ``emobase`` per utterance (emobase defaults to tracking
    ``include_gemaps``, matching the reference extracting both together).
    """
    if include_emobase is None:
        include_emobase = include_gemaps
    utt_ids = list(waveforms)
    lengths = [len(waveforms[u]) for u in utt_ids]
    store: dict[str, dict[str, np.ndarray]] = {u: {} for u in utt_ids}

    for bucket_len, idxs in sorted(_buckets(lengths, quantum).items()):
        fn = _bucket_featurizer(bucket_len, feature_type, feature_len)
        for lo in range(0, len(idxs), batch_size):
            chunk = idxs[lo : lo + batch_size]
            # pow2 row padding: chunk shapes come from a small closed set so
            # partial chunks never compile fresh executables
            rows = pow2_rows(len(chunk), batch_size)
            if feature_type == "mel_spec":
                # host reflect-pad at the true boundary for each n_fft, then
                # zero-pad to the shared bucket length
                w800 = np.zeros((rows, bucket_len + 800), dtype=np.float32)
                w1600 = np.zeros((rows, bucket_len + 1600), dtype=np.float32)
                for row, i in enumerate(chunk):
                    w = waveforms[utt_ids[i]]
                    w800[row, : len(w) + 800] = _reflect_pad(w, 400)
                    w1600[row, : len(w) + 1600] = _reflect_pad(w, 800)
                m1, m2 = fn(jnp.asarray(w800), jnp.asarray(w1600))
                m1, m2 = np.asarray(m1), np.asarray(m2)
                for row, i in enumerate(chunk):
                    t = feature_frames(lengths[i], _HOP)
                    store[utt_ids[i]]["mel1"] = m1[row, :, :t]
                    store[utt_ids[i]]["mel2"] = m2[row, :, :t]
            else:
                w = np.zeros((rows, bucket_len + 400), dtype=np.float32)
                d1 = np.zeros_like(w)
                d2 = np.zeros_like(w)
                for row, i in enumerate(chunk):
                    wave = waveforms[utt_ids[i]]
                    n = len(wave) + 400
                    w[row, :n] = _reflect_pad(wave, 200)
                    d1[row, :n] = _reflect_pad(np.gradient(wave), 200)
                    d2[row, :n] = _reflect_pad(
                        np.gradient(wave, 2).astype(np.float32), 200
                    )
                out = np.asarray(fn(jnp.asarray(w), jnp.asarray(d1), jnp.asarray(d2)))
                for row, i in enumerate(chunk):
                    t = feature_frames(lengths[i], _MFCC_HOP)
                    store[utt_ids[i]]["mfcc"] = out[row, :, :t]

    if include_gemaps and include_emobase:
        # one device program per chunk: shared STFT, half the wave uploads
        from sept_tpu.ops.emobase import combined_functionals_batch

        gemaps, emobase = combined_functionals_batch(waveforms)
        for u in utt_ids:
            store[u]["gemaps"] = gemaps[u]
            store[u]["emobase"] = emobase[u]
    elif include_gemaps:
        from sept_tpu.ops.egemaps import egemaps_functionals_batch

        gemaps = egemaps_functionals_batch(waveforms)
        for u in utt_ids:
            store[u]["gemaps"] = gemaps[u]
    elif include_emobase:
        from sept_tpu.ops.emobase import emobase_functionals_batch

        emobase = emobase_functionals_batch(waveforms)
        for u in utt_ids:
            store[u]["emobase"] = emobase[u]
    return store

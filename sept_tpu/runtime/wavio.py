"""ctypes bindings for the native septio library + numpy fallback.

Replaces the reference's torchaudio load/resample calls
(/root/reference/feature_extraction/audio_feature_extraction.py:139-141,163,182)
with our own native decoder: RIFF parse, mono mix, Kaiser-windowed-sinc
resample to 16 kHz, pthread-pooled batch decode.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["have_native", "decode_wav", "decode_batch", "narrow_pcm16",
           "write_wav"]

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "csrc", "septio.cpp")
_BUILD_DIR = os.path.join(_REPO, "build")
_SO = os.path.join(_BUILD_DIR, "libseptio.so")

_lib = None
_lock = threading.Lock()


def _compile() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    # link to a per-process temp name and rename atomically: a concurrent
    # process ctypes-loading a half-written .so would get OSError and
    # silently pin itself to the numpy fallback (linear resampler) for its
    # whole lifetime — a nondeterministic cross-decoder feature mismatch
    tmp = f"{_SO}.{os.getpid()}.tmp"
    for cc in ("c++", "g++", "clang++"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp, _SRC,
                 "-lpthread", "-lm"],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, _SO)
            return True
        except (OSError, subprocess.CalledProcessError):
            continue
        finally:
            if os.path.exists(tmp):
                try:
                    os.remove(tmp)
                except OSError:
                    pass
    return False


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            stale = (not os.path.exists(_SO)
                     or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
        except OSError:
            # csrc/ absent (shipped build/ without the source tree): use
            # the existing .so if there is one, else the numpy fallback
            stale = not os.path.exists(_SO)
        if stale:
            if not _compile():
                _lib = False
                return _lib
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _lib = False
            return _lib
        lib.septio_decode.restype = ctypes.c_int
        lib.septio_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
        ]
        lib.septio_decode_batch.restype = None
        lib.septio_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.septio_write_wav.restype = ctypes.c_int
        lib.septio_write_wav.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def have_native() -> bool:
    return bool(_load())


# ---------------------------------------------------------------------------
# numpy fallback (stdlib wave module handles PCM16 only)
# ---------------------------------------------------------------------------


def _decode_fallback(path: str, target_sr: int):
    import wave

    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"fallback decoder supports 8/16-bit PCM, got {8*width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    if target_sr and sr != target_sr:
        # linear-resample fallback
        t_out = np.arange(int(len(x) * target_sr / sr)) * (sr / target_sr)
        x = np.interp(t_out, np.arange(len(x)), x).astype(np.float32)
        sr = target_sr
    return x.astype(np.float32), sr


def decode_wav(path: str, target_sr: int = 16000, max_seconds: float = 120.0):
    """Decode one WAV to mono float32 at ``target_sr``.  Returns (wave, sr).

    ``max_seconds`` caps the OUTPUT at exactly ``max_seconds * target_sr``
    samples on every path (native, numpy fallback, and decode_batch agree)
    — the cap used to depend on which decoder ran, so the same corpus
    produced different window counts across hosts.
    """
    max_len = int(max_seconds * target_sr)
    lib = _load()
    if not lib:
        w, sr = _decode_fallback(path, target_sr)
        return w[:max_len], sr
    buf = np.zeros(max_len, dtype=np.float32)
    out_len = ctypes.c_int64(0)
    out_sr = ctypes.c_int(0)
    ok = lib.septio_decode(
        path.encode(), target_sr,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_len,
        ctypes.byref(out_len), ctypes.byref(out_sr),
    )
    if not ok:
        raise IOError(f"septio failed to decode {path}")
    return buf[: out_len.value].copy(), out_sr.value


def decode_batch(
    paths: list[str],
    target_sr: int = 16000,
    max_seconds: float = 120.0,
    n_threads: int = 8,
):
    """Threaded batch decode.  Returns (mat (N, max_len), lengths (N,)).

    Failed rows have length 0.
    """
    lib = _load()
    if not lib:
        lens = []
        max_len = int(max_seconds * target_sr)
        mat = np.zeros((len(paths), max_len), dtype=np.float32)
        for i, p in enumerate(paths):
            try:
                w, _ = _decode_fallback(p, target_sr)
                n = min(len(w), max_len)
                mat[i, :n] = w[:n]
                lens.append(n)
            except Exception:
                lens.append(0)
        return mat, np.asarray(lens, dtype=np.int64)

    max_len = int(max_seconds * target_sr)
    mat = np.zeros((len(paths), max_len), dtype=np.float32)
    lengths = np.zeros(len(paths), dtype=np.int64)
    rates = np.zeros(len(paths), dtype=np.int32)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    lib.septio_decode_batch(
        arr, len(paths), target_sr,
        mat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_len,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    return mat, lengths


def narrow_pcm16(wave: np.ndarray) -> np.ndarray:
    """Return ``wave`` as int16 iff the narrowing is LOSSLESS, else unchanged.

    A decoded 16-bit PCM source at the target rate comes out of the decoder
    as exactly n/32768 floats (both the native path, septio.cpp, and the
    numpy fallback divide by 32768); those narrow back to int16 bit-exactly.
    Resampled or mixed-down audio generally does not, and passes through as
    float32 — this helper never loses precision.  Downstream, int16
    waveforms are staged to the device at half the host->device bytes and
    normalized on device (``ops.frontend.pcm_to_float``), the dominant cost
    of the featurize stage on this environment (docs/ARCHITECTURE.md §2).
    """
    if wave.dtype == np.int16:
        return wave
    if wave.dtype != np.float32 or wave.ndim != 1:
        return wave
    scaled = wave * np.float32(32768.0)
    rounded = np.rint(scaled)
    if (
        (scaled == rounded).all()
        and (rounded >= -32768).all()
        and (rounded <= 32767).all()
    ):
        return rounded.astype(np.int16)
    return wave


def write_wav(path: str, samples: np.ndarray, sample_rate: int = 16000) -> None:
    samples = np.ascontiguousarray(samples, dtype=np.float32)
    lib = _load()
    if lib:
        ok = lib.septio_write_wav(
            path.encode(),
            samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(samples), sample_rate,
        )
        if not ok:
            raise IOError(f"septio failed to write {path}")
        return
    import wave

    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        pcm = np.clip(samples, -1, 1)
        # round-to-nearest like the native path's lrintf — a plain int cast
        # truncates toward zero and differs by 1 LSB on half the values
        w.writeframes(np.rint(pcm * 32767.0).astype("<i2").tobytes())

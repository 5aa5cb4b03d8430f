"""Native IO runtime tests: WAV round-trip, resampling, batch decode."""

import os

import numpy as np
import pytest

from sept_tpu.runtime import decode_batch, decode_wav, have_native, write_wav


def test_native_library_builds():
    assert have_native(), "csrc/septio.cpp failed to compile"


def test_wav_roundtrip(tmp_path, rng):
    w = (0.5 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)).astype(np.float32)
    path = str(tmp_path / "a.wav")
    write_wav(path, w, 16000)
    out, sr = decode_wav(path, target_sr=16000)
    assert sr == 16000
    assert len(out) == len(w)
    np.testing.assert_allclose(out, w, atol=1.0 / 32000)  # PCM16 quantization


def test_resample_tone_preserves_frequency(tmp_path):
    """Decode a 44.1 kHz tone at 16 kHz; dominant frequency must survive."""
    sr_in, f0 = 44100, 1000.0
    t = np.arange(int(sr_in * 0.5)) / sr_in
    w = (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    path = str(tmp_path / "b.wav")
    write_wav(path, w, sr_in)
    out, sr = decode_wav(path, target_sr=16000)
    assert sr == 16000
    assert abs(len(out) - int(len(w) * 16000 / 44100)) <= 2
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    freqs = np.fft.rfftfreq(len(out), 1 / 16000)
    assert abs(freqs[np.argmax(spec)] - f0) < 10.0
    # amplitude preserved within 5%
    assert np.percentile(np.abs(out), 99) == pytest.approx(0.5, rel=0.08)


def test_batch_decode_threads(tmp_path, rng):
    paths = []
    waves = []
    for i in range(12):
        w = np.clip(
            rng.standard_normal(8000 + 500 * i).astype(np.float32) * 0.3, -1, 1
        )
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, w, 16000)
        paths.append(p)
        waves.append(w)
    paths.append(str(tmp_path / "missing.wav"))
    mat, lens = decode_batch(paths, target_sr=16000, max_seconds=2.0, n_threads=4)
    assert mat.shape[0] == 13
    assert lens[-1] == 0  # missing file
    for i, w in enumerate(waves):
        assert lens[i] == len(w)
        np.testing.assert_allclose(mat[i, : len(w)], w, atol=1.0 / 16000)


def test_decoder_rejects_malformed_files_without_crashing(tmp_path, rng):
    """Adversarial WAV inputs must yield a clean Python error or a valid,
    bounded decode — never a native crash (which would kill this process)
    or non-finite/oversized output.  Covers truncations at every header
    byte, lying chunk sizes, zero/absurd fmt fields, and random garbage
    with and without the RIFF magic (csrc/septio.cpp parser)."""
    from sept_tpu.runtime.wavio import decode_wav, write_wav

    base = tmp_path / "ok.wav"
    write_wav(str(base), (rng.standard_normal(2000) * 0.1).astype(np.float32),
              8000)
    data = bytearray(base.read_bytes())

    cases = []
    for cut in list(range(0, 64)) + [len(data) // 2]:  # truncations
        cases.append(bytes(data[:cut]))
    # lying fmt/data chunk sizes (offsets of the canonical 44-byte header)
    for off, val in [(16, 0xFFFFFFFF), (16, 0), (40, 0xFFFFFFFF)]:
        m = bytearray(data)
        m[off:off + 4] = int(val).to_bytes(4, "little")
        cases.append(bytes(m))
    # zero channels / zero sample rate / absurd bit widths
    for off, val, w in [(22, 0, 2), (24, 0, 4), (34, 3, 2), (34, 255, 2)]:
        m = bytearray(data)
        m[off:off + w] = int(val).to_bytes(w, "little")
        cases.append(bytes(m))
    for _ in range(8):  # random garbage
        g = rng.integers(0, 256, 512).astype(np.uint8).tobytes()
        cases.append(g)
        cases.append(b"RIFF" + g)

    p = tmp_path / "fuzz.wav"
    decoded = 0
    for blob in cases:
        p.write_bytes(blob)
        try:
            w, sr = decode_wav(str(p), target_sr=16000, max_seconds=1.0)
        except Exception:
            continue  # clean rejection
        decoded += 1
        assert len(w) <= 16000
        assert np.all(np.isfinite(w))
    # the unmutated file must still decode (sanity that the harness works)
    w, sr = decode_wav(str(base), target_sr=16000, max_seconds=1.0)
    assert sr == 16000 and 0 < len(w) <= 16000


def test_decoder_rejects_compressed_formats(tmp_path):
    """mu-law/a-law/ADPCM fmt tags must be REJECTED, not decoded as linear
    PCM garbage (csrc/septio.cpp fmt check): a fmt=7 (mu-law) file with
    bits=8 previously sailed through the bits check and produced severely
    distorted waveforms silently."""
    import struct

    import pytest

    from sept_tpu.runtime.wavio import decode_wav, have_native

    if not have_native():
        pytest.skip("no native decoder to exercise (fallback rejects via "
                    "the stdlib wave module)")
    data = bytes(range(64)) * 4  # 256 "mu-law" bytes
    for fmt in (2, 6, 7):  # ADPCM, a-law, mu-law
        hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
               + b"fmt " + struct.pack("<IHHIIHH", 16, fmt, 1, 8000,
                                       8000, 1, 8)
               + b"data" + struct.pack("<I", len(data)))
        p = tmp_path / f"fmt{fmt}.wav"
        p.write_bytes(hdr + data)
        with pytest.raises(Exception):
            decode_wav(str(p), target_sr=16000)


def test_decoder_accepts_float64_wav(tmp_path):
    """IEEE-float WAVs with bits=64 (fmt=3) are legal and produced by some
    tools (scipy.io.wavfile with float64 input); decode them rather than
    recording a silent 0-length row (csrc/septio.cpp fmt whitelist)."""
    import struct

    import pytest

    from sept_tpu.runtime.wavio import decode_wav, have_native

    if not have_native():
        pytest.skip("no native decoder to exercise")
    sr = 16000
    w = 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)  # float64
    data = w.astype("<f8").tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, sr, sr * 8, 8, 64)
           + b"data" + struct.pack("<I", len(data)))
    p = tmp_path / "f64.wav"
    p.write_bytes(hdr + data)
    out, out_sr = decode_wav(str(p), target_sr=sr)
    assert out_sr == sr and len(out) == sr
    np.testing.assert_allclose(out, w.astype(np.float32), atol=1e-6)


def test_write_wav_fallback_matches_native_bytes(tmp_path, rng, monkeypatch):
    """The numpy write fallback must produce the SAME PCM bytes as the
    native lrintf path (round-to-nearest, not truncation): fixtures written
    on hosts without a compiler must stay bit-identical."""
    from sept_tpu.runtime import wavio

    if not wavio.have_native():
        import pytest

        pytest.skip("no native lib to compare against")
    # include exact .5 LSB values where truncate-vs-round differ
    samples = np.concatenate([
        (rng.standard_normal(500) * 0.5).astype(np.float32),
        np.asarray([16383.5 / 32767.0, -16383.5 / 32767.0, 0.99999],
                   np.float32),
    ])
    a, b = tmp_path / "native.wav", tmp_path / "fallback.wav"
    wavio.write_wav(str(a), samples, 16000)
    monkeypatch.setattr(wavio, "_load", lambda: False)
    wavio.write_wav(str(b), samples, 16000)
    assert a.read_bytes()[44:] == b.read_bytes()[44:]  # same PCM payload

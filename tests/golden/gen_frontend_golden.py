"""Generate tests/golden/frontend_golden.npz — vendored frontend vectors.

The target semantics are the reference's torchaudio features
(/root/reference/feature_extraction/audio_feature_extraction.py:15-46):
MFCC-40 of the waveform and of its np.gradient 1st/2nd derivatives
(concatenated to 120 dims), and MelSpectrogram+AmplitudeToDB at
n_fft=800/1600, hop 160, 128 mels.

PROVENANCE: run with real ``torchaudio`` installed and the vectors are the
actual torchaudio outputs (``source == 'torchaudio'`` in the npz).  This
environment does not ship torchaudio, so the vendored file is generated
from the next-best oracle — ``torch.stft`` (the same C++ STFT kernel
torchaudio's Spectrogram calls) plus the numpy transcription of
``melscale_fbanks`` / ``create_dct`` / ``amplitude_to_DB`` in
tests/test_frontend_parity.py (``source == 'torch.stft+transcription'``).
The npz records which path produced it; regenerate on a machine with
torchaudio to upgrade the file in place:

    python tests/golden/gen_frontend_golden.py
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))  # tests/ for test_frontend_parity

OUT = os.path.join(HERE, "frontend_golden.npz")


def make_waves():
    """Three deterministic 16 kHz test signals: tone-dominated, noise-
    dominated, and low-level.  All carry a dither floor well above the
    AmplitudeToDB 1e-10 power clamp — real recordings always do, and AT the
    clamp the dB value of a bin is log10 of float rounding error, which no
    two implementations (or precisions) reproduce."""
    rng = np.random.default_rng(8)
    t = np.arange(11113) / 16000.0
    dither = rng.standard_normal(t.shape)
    tonal = (0.3 * np.sin(2 * np.pi * 220 * t)
             + 0.2 * np.sin(2 * np.pi * 1333 * t)
             + 0.003 * dither).astype(np.float32)
    noisy = (0.1 * rng.standard_normal(t.shape)
             + 0.05 * np.sin(2 * np.pi * 97 * t)).astype(np.float32)
    quiet = (0.01 * np.sin(2 * np.pi * 440 * t)
             + 0.002 * dither).astype(np.float32)
    return {"tonal": tonal, "noisy": noisy, "quiet": quiet}


def torchaudio_features(wave):
    import torch
    import torchaudio

    mfcc_t = torchaudio.transforms.MFCC(sample_rate=16000, n_mfcc=40)
    mel1_t = torchaudio.transforms.MelSpectrogram(
        sample_rate=16000, n_fft=800, hop_length=160, n_mels=128)
    mel2_t = torchaudio.transforms.MelSpectrogram(
        sample_rate=16000, n_fft=1600, hop_length=160, n_mels=128)
    to_db = torchaudio.transforms.AmplitudeToDB()

    def mfcc120(w):
        # audio_feature_extraction.py:15-26: MFCC of wave, grad, grad(,2)
        parts = [np.asarray(mfcc_t(torch.from_numpy(x.astype(np.float32))))
                 for x in (w, np.gradient(w), np.gradient(w, 2))]
        return np.concatenate(parts, axis=0)

    def mel(w, tr):
        return np.asarray(to_db(tr(torch.from_numpy(w.astype(np.float32)))))

    return {
        "mfcc120": mfcc120(wave),
        "mel1": mel(wave, mel1_t),
        "mel2": mel(wave, mel2_t),
    }, "torchaudio"


def oracle_features(wave):
    import test_frontend_parity as O

    return {
        "mfcc120": O.oracle_mfcc_with_deltas(wave),
        "mel1": O.oracle_mel_spectrogram(wave, n_fft=800),
        "mel2": O.oracle_mel_spectrogram(wave, n_fft=1600),
    }, "torch.stft+transcription"


def main():
    waves = make_waves()
    try:
        import torchaudio  # noqa: F401

        compute = torchaudio_features
    except ImportError:
        compute = oracle_features

    flat, source = {}, None
    for name, wave in waves.items():
        feats, source = compute(wave)
        flat[f"{name}|wave"] = wave
        for k, v in feats.items():
            flat[f"{name}|{k}"] = np.asarray(v, dtype=np.float32)
    flat["source"] = np.asarray(source)
    np.savez_compressed(OUT, **flat)
    print(f"wrote {OUT} (source={source})")


if __name__ == "__main__":
    main()

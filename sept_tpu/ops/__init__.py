"""TPU-native compute ops: audio frontend + autodiff primitives."""

from sept_tpu.ops.frontend import (
    amplitude_to_db,
    create_dct,
    frame_signal,
    hann_window,
    hz_to_mel,
    mel_to_hz,
    mel_spectrogram,
    melscale_fbanks,
    mfcc,
    mfcc_with_deltas,
    np_gradient,
    stft_power,
)
from sept_tpu.ops.grl import gradient_reversal

__all__ = [
    "amplitude_to_db",
    "create_dct",
    "frame_signal",
    "gradient_reversal",
    "hann_window",
    "hz_to_mel",
    "mel_to_hz",
    "mel_spectrogram",
    "melscale_fbanks",
    "mfcc",
    "mfcc_with_deltas",
    "np_gradient",
    "stft_power",
]

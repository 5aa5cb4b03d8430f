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
from sept_tpu.ops.egemaps import (
    N_GEMAPS,
    egemaps_functionals,
    egemaps_functionals_batch,
)
from sept_tpu.ops.emobase import (
    N_EMOBASE,
    emobase_functionals,
    emobase_functionals_batch,
)
from sept_tpu.ops.grl import gradient_reversal
from sept_tpu.ops.pallas_frontend import pallas_mel_spectrogram, pallas_mfcc

__all__ = [
    "amplitude_to_db",
    "create_dct",
    "frame_signal",
    "N_GEMAPS",
    "N_EMOBASE",
    "egemaps_functionals",
    "egemaps_functionals_batch",
    "emobase_functionals",
    "emobase_functionals_batch",
    "gradient_reversal",
    "pallas_mel_spectrogram",
    "pallas_mfcc",
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

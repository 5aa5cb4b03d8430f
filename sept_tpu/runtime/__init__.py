"""Native IO runtime: C++ WAV decode / resample / batch reader via ctypes.

Builds csrc/septio.cpp on first use (cached in the repo's build dir) and
exposes it through numpy-friendly wrappers.  A pure-numpy fallback keeps the
framework functional when no compiler is available.
"""

from sept_tpu.runtime.wavio import (
    decode_batch,
    decode_wav,
    have_native,
    narrow_pcm16,
    write_wav,
)

__all__ = ["decode_batch", "decode_wav", "have_native", "narrow_pcm16",
           "write_wav"]

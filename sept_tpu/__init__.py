"""sept_tpu — TPU-native speech-emotion-recognition privacy framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
usc-sail/speech-emotion-privacy-trust (ICASSP 2022: "Enhancing Privacy Through
Domain Adaptive Noise Injection For Speech Emotion Recognition"):

- ``ops``      — fused audio frontend (STFT -> mel -> log -> DCT as MXU matmuls,
                 Pallas kernels for the hot path) + gradient-reversal custom_vjp.
- ``data``     — corpus manifests, speaker-disjoint K-fold splits, windowing,
                 per-speaker normalization, class-balancing augmentation;
                 fixed-shape array outputs (XLA-friendly by construction).
- ``models``   — Flax Linen model zoo: Conv2dBiRNN backbone family, CloakNoise,
                 cloak / cloak+GRL composite models.
- ``train``    — jitted train steps (baseline, cloak, cloak+GRL minimax in one
                 fused backward), optax optimizers, 5-fold drivers, checkpoints.
- ``eval``     — vmapped sliding-window vote, UAR/acc/confusion metrics,
                 the utility-privacy suppression sweep.
- ``parallel`` — device mesh setup, NamedSharding data parallelism, collectives.
- ``runtime``  — native (C++) IO: WAV decode, resampling, feature store.
- ``serve``    — deployment surface: bucketed batch predictors, JSON-over-HTTP
                 server (pcm16 wire format, micro-batching, /metrics, streaming
                 sessions), cloaked (privacy-preserving) serving.
- ``cli``      — entry points mirroring the reference scripts, plus serve /
                 predict deployment tools.

The reference implementation (PyTorch/torchaudio/openSMILE) is documented in
SURVEY.md; file:line citations in docstrings point into /root/reference.
"""

__version__ = "0.1.0"

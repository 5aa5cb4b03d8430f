"""Typed experiment configuration.

One dataclass replaces the reference's four overlapping argparse flag sets
(e.g. /root/reference/training/training_cloak.py:193-218) plus its in-script
hyperparameter grid (:229-241).  Presets mirror each reference entry point's
defaults, including the subtle per-script learning-rate differences
(SURVEY.md §5 "Config / flag system").
"""

from __future__ import annotations

import dataclasses
from typing import Optional

__all__ = ["ExperimentConfig", "preset"]


@dataclasses.dataclass
class ExperimentConfig:
    # data
    dataset: str = "iemocap"
    feature_type: str = "mel_spec"
    feature_len: int = 128  # --input_spec_size
    win_len: int = 200
    shift: bool = True
    norm: str = "znorm"
    aug: Optional[str] = "emotion"
    adv: bool = False  # train on the adversary splits

    # model
    model_type: str = "2d-cnn-lstm"
    pred: str = "emotion"
    hidden_size: int = 64
    filter_size: int = 64
    attention_size: int = 128
    att: Optional[str] = None
    global_feature: bool = False
    # "bfloat16" runs conv/RNN compute in bf16 with f32 params/accumulation
    # (the TPU analog of mixed-precision training; no reference counterpart
    # — the reference trains f32 eager); measured epoch 0.82 -> 0.59 s
    compute_dtype: str = "float32"
    # first conv block backend for the 2d-cnn-lstm family: "xla" |
    # "fused1" (the hand-fused Pallas kernel pair, ops/pallas_conv.py) |
    # "auto" (fused1 when it applies: bf16 compute, standard 200x128
    # window geometry, non-CPU backend; measured 9.3 -> 6.8 ms/step)
    conv_backend: str = "auto"
    # rematerialize the encoder in the backward pass (jax.checkpoint):
    # trades FLOPs (cheap — the step runs at ~10% MXU) for the HBM
    # round-trips of the conv activations, the step's binding constraint
    # (docs/ARCHITECTURE.md §2b′ roofline); 2d-cnn-lstm family only
    remat: bool = False
    # jax PRNG implementation (None = jax default, threefry2x32); "rbg"
    # measured ~5% faster epochs — recorded so an artifact's manifest says
    # which random streams trained it
    prng_impl: str | None = None

    # optimization
    optimizer: str = "sgd"
    learning_rate: float = 1e-4
    momentum: float = 0.9
    weight_decay: float = 1e-4
    batch_size: int = 32
    num_epochs: int = 30
    # StepLR params (sgd) — baselines: step 5 gamma 0.5
    # (training_adversary_baselines.py:426); cloak: step 10
    # (training_cloak.py:379)
    lr_step_epochs: int = 5
    lr_gamma: float = 0.5
    # scheduler.step() calls per epoch — the baseline and plain-cloak
    # trainers step at the end of BOTH the train and the validate pass
    # (training_adversary_baselines.py:210 at :443-444), halving the
    # effective step_size; the GRL trainer steps once (train/optim.py
    # make_schedule docstring).  cloak_grl preset sets 1.
    lr_sched_steps_per_epoch: int = 2
    # ReduceLROnPlateau params (adam)
    plateau_patience: int = 5
    plateau_factor: float = 0.2
    early_stop_patience: int = 10
    min_select_epoch: int = 10  # best-by-val-acc only after epoch 10 (:404)
    # the baseline trainer only BREAKS on early stopping for non-SGD
    # (training_adversary_baselines.py:477-479); the cloak trainer always
    # breaks (training_cloak.py:440)
    early_stop_with_sgd: bool = True

    # cloak
    scale_lambda: float = 0.0
    suppression_ratio: int = 0
    grl: bool = False
    grl_lambda: float = 0.1
    gender_lambda: float = 0.1
    noise_min_scale: float = 0.01
    noise_max_scale: float = 10.0  # 5.0 at evaluation (adversary_cloak_evaluation.py:205)
    # antithetic +eps/-eps loss pairs: variance-reduced sigma gradients so
    # the per-cell scales differentiate (framework extension; same expected
    # loss as the reference's single-draw estimator)
    antithetic_noise: bool = False
    # first-order saliency-aligned scale shaping for the GRL game (framework
    # extension, steps.saliency_alignment_loss); 0 = reference behavior
    saliency_align: float = 0.0
    # percentile-mask direction for ratio-matched cloak TRAINING.  The
    # reference trains suppression-r cloaks replacing the top-r% noisiest
    # cells (training_cloak.py:364-371) but EVALUATES them replacing the
    # top-(100-r)% (adversary_cloak_evaluation.py:262-267) — a train/eval
    # mismatch that leaves the locs untrained in most eval-replaced cells.
    # "train" = reference behavior; "eval" = train under the same mask the
    # sweep will apply (framework extension; evaluation is unchanged).
    mask_direction: str = "train"

    # infra
    seed: int = 8
    n_folds: int = 5
    output_dir: str = "results"

    @property
    def shift_len(self) -> int:
        return self.win_len // 4

    def resolved_conv_backend(self) -> str:
        """Resolve ``conv_backend='auto'`` against this config + backend.

        fused1 requires bf16 compute (the f32 banded GEMM matrix exceeds
        VMEM), the standard (200, 128) window geometry the kernels are
        shaped for, a 2d-cnn-lstm-family model, and a real accelerator
        (interpret-mode Pallas on CPU is for tests, not training).
        """
        if self.conv_backend != "auto":
            return self.conv_backend
        import jax

        ok = (
            self.compute_dtype == "bfloat16"
            and self.model_type in ("2d-cnn-lstm", "cnn-lstm-att",
                                    "deep-2d-cnn-lstm")
            and self.win_len == 200
            and self.feature_len == 128
            and jax.default_backend() != "cpu"
        )
        return "fused1" if ok else "xla"


_PRESETS = {
    # training_adversary_baselines.py: SGD lr 1e-4 StepLR(5, 0.5), 100 epochs
    # when sgd (:424-439); adam lr 5e-5 + Plateau(patience=3, factor=0.2)
    # (:429)
    "baseline": dict(optimizer="sgd", learning_rate=1e-4, lr_step_epochs=5,
                     num_epochs=100, pred="emotion", adv=False,
                     early_stop_with_sgd=False,
                     plateau_patience=3, plateau_factor=0.2),
    "adversary": dict(optimizer="sgd", learning_rate=1e-4, lr_step_epochs=5,
                      num_epochs=100, pred="gender", adv=True,
                      early_stop_with_sgd=False,
                      plateau_patience=3, plateau_factor=0.2),
    # training_cloak.py: SGD lr 1e-3 StepLR(10, 0.5) (:377-379); adam 5e-4
    # + Plateau(patience=5, factor=0.2) (:382)
    "cloak": dict(optimizer="sgd", learning_rate=1e-3, lr_step_epochs=10,
                  num_epochs=30, pred="emotion", scale_lambda=0.1,
                  plateau_patience=5, plateau_factor=0.2),
    # training_cloak_with_grl.py: same cloak StepLR but stepped only on the
    # validate pass (:186-191 -> once per epoch) + Plateau(patience=3,
    # factor=0.5) (:421); GRL game (:227-228)
    "cloak_grl": dict(optimizer="sgd", learning_rate=1e-3, lr_step_epochs=10,
                      num_epochs=30, pred="emotion", scale_lambda=0.1,
                      grl=True, grl_lambda=0.1, gender_lambda=0.1,
                      lr_sched_steps_per_epoch=1,
                      plateau_patience=3, plateau_factor=0.5),
}


def preset(name: str, **overrides) -> ExperimentConfig:
    cfg = dict(_PRESETS[name])
    cfg.update(overrides)
    return ExperimentConfig(**cfg)

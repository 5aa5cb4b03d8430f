"""Training stack: configs, optimizers, jitted steps, fold drivers."""

from sept_tpu.train.config import ExperimentConfig, preset
from sept_tpu.train.loop import (
    EarlyStopping,
    FitResult,
    fit,
    run_eval_epoch,
    run_test,
    run_train_epoch,
    speaker_weights,
)
from sept_tpu.train.optim import (
    PlateauScheduler,
    make_cloak_optimizer,
    make_optimizer,
    partition_labels,
    set_lr_scale,
)
from sept_tpu.train.steps import (
    TrainState,
    cloak_scales,
    init_state,
    make_baseline_step,
    make_cloak_grl_step,
    make_epoch_runner,
    make_cloak_step,
    make_eval_logits_fn,
    weighted_ce,
)

__all__ = [
    "EarlyStopping",
    "ExperimentConfig",
    "FitResult",
    "PlateauScheduler",
    "TrainState",
    "cloak_scales",
    "fit",
    "init_state",
    "make_baseline_step",
    "make_cloak_grl_step",
    "make_epoch_runner",
    "make_cloak_optimizer",
    "make_cloak_step",
    "make_eval_logits_fn",
    "make_optimizer",
    "partition_labels",
    "preset",
    "run_eval_epoch",
    "run_test",
    "run_train_epoch",
    "set_lr_scale",
    "speaker_weights",
    "weighted_ce",
]

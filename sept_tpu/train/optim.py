"""Optimizers, LR schedules, and parameter-partition freezing.

Replaces the reference's torch optimizer setups:

- SGD(momentum=0.9, weight_decay=1e-4) + StepLR
  (training_adversary_baselines.py:424-426, training_cloak.py:377-379)
- Adam(betas=(0.9, 0.98), eps=1e-9, weight_decay=1e-4) + ReduceLROnPlateau
  (training_adversary_baselines.py:427-429, training_cloak.py:380-382)

The reference freezes the cloak's backbone by mutating ``requires_grad`` and
filtering the optimizer's parameter list (training_cloak.py:377-384).  The
TPU-native expression is an ``optax.multi_transform`` over a parameter-path
partition: frozen subtrees get ``optax.set_to_zero()`` while gradients still
flow *through* them into the trainable noise parameters (SURVEY.md §7 hard
part 3).

Learning-rate scale for ReduceLROnPlateau is injected host-side through
``optax.inject_hyperparams`` — the plateau decision is control flow around
the jitted step, never inside it.
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax
import optax

from sept_tpu.train.config import ExperimentConfig

__all__ = [
    "make_optimizer",
    "make_cloak_optimizer",
    "partition_labels",
    "PlateauScheduler",
    "set_lr_scale",
]


def _base_tx(cfg: ExperimentConfig, schedule) -> optax.GradientTransformation:
    if cfg.optimizer == "sgd":
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(learning_rate=schedule, momentum=cfg.momentum),
        )
    if cfg.optimizer == "adam":
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.adam(learning_rate=schedule, b1=0.9, b2=0.98, eps=1e-9),
        )
    raise ValueError(f"unknown optimizer: {cfg.optimizer!r}")


def make_schedule(cfg: ExperimentConfig, steps_per_epoch: int):
    """StepLR for SGD (epoch-granular staircase decay); constant base LR for
    Adam (plateau scaling happens via lr_scale injection).

    Reference quirk (``lr_sched_steps_per_epoch``): the baseline and plain
    cloak trainers call ``scheduler.step()`` at the end of train() for BOTH
    the training and the validation pass (training_adversary_baselines.py:
    204-210 called at :443-444; training_cloak.py:175-181 at :394-395), so
    ``StepLR(step_size=s)`` effectively decays every ``s/2`` epochs there.
    Only the GRL trainer steps once per epoch (training_cloak_with_grl.py:
    186-191 gates on mode=='validate').  Both steps land AFTER the epoch's
    training, so the LR is constant within each training epoch:
    ``lr(epoch) = lr0 * gamma ** ((k * epoch) // s)`` with k scheduler
    steps per epoch.
    """
    if cfg.optimizer == "sgd":
        spe = max(1, steps_per_epoch)
        k = cfg.lr_sched_steps_per_epoch
        s = max(1, cfg.lr_step_epochs)

        def schedule(count):
            import jax.numpy as jnp

            epoch = count // spe
            decays = (k * epoch) // s
            return cfg.learning_rate * jnp.power(
                jnp.asarray(cfg.lr_gamma, jnp.float32), decays)

        return schedule
    return cfg.learning_rate


@optax.inject_hyperparams
def _scaled(lr_scale: float) -> optax.GradientTransformation:
    return optax.scale(lr_scale)


def make_optimizer(
    cfg: ExperimentConfig, steps_per_epoch: int
) -> optax.GradientTransformation:
    """Full-model optimizer (baseline / adversary training)."""
    return optax.chain(
        _base_tx(cfg, make_schedule(cfg, steps_per_epoch)), _scaled(1.0)
    )


def partition_labels(params, trainable_prefixes: Iterable[str],
                     freeze_rhos: bool = False):
    """Label each parameter leaf 'trainable' or 'frozen' by path.

    Top-level subtrees in ``trainable_prefixes`` are trainable; with
    ``freeze_rhos`` the noise/rhos leaf is frozen anyway — suppression runs
    load the suppression_0 cloak and train ONLY the means
    (training_cloak.py:367 sets rhos.requires_grad = False).
    """
    import jax.tree_util as jtu

    prefixes = tuple(trainable_prefixes)

    def label(path, _leaf):
        keys = tuple(
            k.key if isinstance(k, jtu.DictKey) else getattr(k, "name", str(k))
            for k in path
        )
        if keys and keys[0] in prefixes:
            if freeze_rhos and keys[:2] == ("noise", "rhos"):
                return "frozen"
            return "trainable"
        return "frozen"

    return jtu.tree_map_with_path(label, params)


def make_cloak_optimizer(
    cfg: ExperimentConfig,
    steps_per_epoch: int,
    params,
    trainable_prefixes: Iterable[str] = ("noise",),
    freeze_rhos: bool = False,
) -> optax.GradientTransformation:
    """Optimizer updating only the cloak-trainable partition.

    For the plain cloak: only 'noise'.  For the GRL game: ('noise',
    'gender_backbone') — the frozen emotion backbone gets zero updates
    (training_cloak_with_grl.py:416-421).  ``freeze_rhos`` pins the noise
    scales for suppression runs (training_cloak.py:367).
    """
    labels = partition_labels(params, trainable_prefixes, freeze_rhos)
    return optax.chain(
        optax.multi_transform(
            {
                "trainable": _base_tx(cfg, make_schedule(cfg, steps_per_epoch)),
                "frozen": optax.set_to_zero(),
            },
            labels,
        ),
        _scaled(1.0),
    )


def set_lr_scale(opt_state, scale: float):
    """Host-side plateau scaling: rewrite the injected lr_scale hyperparam.

    The injected transform is an element of the top-level optax chain; its
    state carries a ``hyperparams`` dict holding ``lr_scale``.
    """
    import jax.numpy as jnp

    new_states = []
    for s in opt_state:
        if hasattr(s, "hyperparams") and "lr_scale" in s.hyperparams:
            hp = dict(s.hyperparams)
            hp["lr_scale"] = jnp.asarray(scale, dtype=hp["lr_scale"].dtype)
            s = s._replace(hyperparams=hp)
        new_states.append(s)
    return tuple(new_states)


class PlateauScheduler:
    """Host-side ReduceLROnPlateau (mode='min').

    Mirrors torch's semantics as used by the reference: patience epochs
    without val-loss improvement -> multiply LR by ``factor``
    (training_adversary_baselines.py:429, training_cloak.py:382).
    """

    def __init__(self, patience: int = 5, factor: float = 0.2,
                 min_scale: float = 1e-4, threshold: float = 1e-4):
        self.patience = patience
        self.factor = factor
        self.min_scale = min_scale
        # torch's default threshold=1e-4, threshold_mode='rel': a loss only
        # counts as improved when it beats best * (1 - threshold)
        self.threshold = threshold
        self.best: Optional[float] = None
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, val_loss: float) -> float:
        """Record an epoch's validation loss; returns the current LR scale."""
        if self.best is None or val_loss < self.best * (1.0 - self.threshold):
            self.best = val_loss
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.bad_epochs = 0
        return self.scale

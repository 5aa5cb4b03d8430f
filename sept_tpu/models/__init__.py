"""Flax model zoo: baseline SER/adversary classifiers + cloak privacy models."""

from sept_tpu.models.backbone import (
    NUM_EMO_CLASSES,
    NUM_GENDER_CLASSES,
    AttentionPool,
    Conv2dBiRNN,
    DeepConv2dBiRNN,
    OneDConvNet,
    PlainConv2d,
    StackedBiRNN,
)
from sept_tpu.models.cloak import CloakedModel, CloakedModelGRL, CloakNoise

__all__ = [
    "NUM_EMO_CLASSES",
    "NUM_GENDER_CLASSES",
    "AttentionPool",
    "CloakNoise",
    "CloakedModel",
    "CloakedModelGRL",
    "Conv2dBiRNN",
    "DeepConv2dBiRNN",
    "OneDConvNet",
    "PlainConv2d",
    "StackedBiRNN",
]


# Knobs only the 2d-cnn-lstm family understands: build_backbone silently
# drops these (and ONLY these) for model types whose class lacks the field,
# so trainers can pass their full knob set for any --model_type.  Anything
# else unknown still raises — typos must not be swallowed.
_FAMILY_KNOBS = frozenset({
    "hidden_size", "rnn_cell", "att", "attention_size", "dtype",
    "conv_backend", "remat", "bn_axis_name",
})


def build_backbone(model_type: str, **kwargs):
    """Model factory mirroring the reference trainers' --model_type switch
    (training_cloak.py:314-349)."""
    import dataclasses

    classes = {
        "cnn-lstm-att": Conv2dBiRNN,
        "2d-cnn-lstm": Conv2dBiRNN,
        "deep-2d-cnn-lstm": DeepConv2dBiRNN,
        "1d-cnn-lstm-att": OneDConvNet,
        "2d-cnn": PlainConv2d,
    }
    cls = classes.get(model_type)
    if cls is None:
        raise ValueError(f"unknown model_type: {model_type!r}")
    fields = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in kwargs.items()
                  if k in fields or k not in _FAMILY_KNOBS})


def compute_dtype(name: str):
    """--compute_dtype value -> the model ``dtype`` knob (None = f32)."""
    import jax.numpy as jnp

    return {"float32": None, "bfloat16": jnp.bfloat16}[name]


def pooling_for(model_type: str):
    """Temporal-pooling convention per --model_type: the 'deep' variants
    flatten the full RNN sequence (pooling=None — the reference passes
    pooling=None for 'deep' model types, training_cloak.py:132); every
    other type mean-pools.  Single source of truth: training steps, epoch
    runners, evaluation, and serving must all apply the SAME pooling or
    dense1's input width mismatches at inference (see
    tests/test_epoch_runner.py::test_deep_model_pooling_consistent_train_eval).
    """
    return None if "deep" in model_type else "mean"

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


def build_backbone(model_type: str, **kwargs):
    """Model factory mirroring the reference trainers' --model_type switch
    (training_cloak.py:314-349)."""
    if model_type in ("cnn-lstm-att", "2d-cnn-lstm"):
        return Conv2dBiRNN(**kwargs)
    if model_type == "deep-2d-cnn-lstm":
        return DeepConv2dBiRNN(**kwargs)
    if model_type == "1d-cnn-lstm-att":
        kwargs.pop("hidden_size", None)
        kwargs.pop("rnn_cell", None)
        kwargs.pop("dtype", None)  # f32-only variants
        kwargs.pop("conv_backend", None)  # 2d-cnn-lstm-family knobs
        kwargs.pop("remat", None)
        return OneDConvNet(**kwargs)
    if model_type == "2d-cnn":
        kwargs.pop("hidden_size", None)
        kwargs.pop("rnn_cell", None)
        kwargs.pop("att", None)
        kwargs.pop("attention_size", None)
        kwargs.pop("dtype", None)
        kwargs.pop("conv_backend", None)
        kwargs.pop("remat", None)
        return PlainConv2d(**kwargs)
    raise ValueError(f"unknown model_type: {model_type!r}")


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

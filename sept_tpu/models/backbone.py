"""Baseline SER / adversary model zoo (Flax Linen, NHWC, TPU-first).

Re-implements the capabilities of /root/reference/model/baseline_models.py:

- ``Conv2dBiRNN``      = ``two_d_cnn_lstm``       (baseline_models.py:143-260)
- ``DeepConv2dBiRNN``  = ``deep_two_d_cnn_lstm``  (:264-385) and its LSTM-default
                         clone ``deep_two_d_cnn_lstm_tmp`` (:388-509, select via
                         ``rnn_cell='lstm'``)
- ``OneDConvNet``      = ``one_d_cnn_lstm``       (:19-140)
- ``PlainConv2d``      = ``two_d_cnn``            (:512-596)

Input convention is TPU-idiomatic NHWC: spectrogram windows are
``(batch, time=200, freq=128, channels=1)`` (the reference uses NCHW
``(B, 1, 200, 128)``).  After the conv stack the features are flattened
channel-major — ``(B, T', C*D')`` — matching the reference's
``transpose(1, 2).reshape`` layout (baseline_models.py:226-228).

Documented, deliberate divergences from reference quirks (SURVEY.md §2.6),
fixed idiomatically:

- ``init_weight`` in the reference is a no-op (iterates ``_modules`` string
  keys, :213-220), so its effective init is the framework default; here we
  likewise use Flax's default initializers.
- ``one_d_cnn_lstm.forward`` never calls its RNN (:109) — ``OneDConvNet``
  reproduces the *effective* conv-only architecture and does not build dead
  RNN parameters.
- ``two_d_cnn`` has a latent channel mismatch (conv block 5 outputs 32ch,
  block 6 expects 64, :548-552) that crashes if used; ``PlainConv2d`` uses
  64->64 so the model actually runs.
- BatchNorm running stats use torch's default EMA rate (flax
  ``momentum=0.9`` = torch ``momentum=0.1``); torch additionally stores
  the UNBIASED batch variance in the running stat while flax stores the
  biased one — a factor n/(n-1) on running var, < 2e-6 relative at the
  conv BNs' n = B*H*W sample counts here, accepted as negligible.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "StackedBiRNN",
    "AttentionPool",
    "Conv2dBiRNN",
    "DeepConv2dBiRNN",
    "OneDConvNet",
    "PlainConv2d",
    "NUM_EMO_CLASSES",
    "NUM_GENDER_CLASSES",
]

NUM_EMO_CLASSES = 4  # neu / hap / sad / ang (utils/training_tools.py:9)
NUM_GENDER_CLASSES = 2  # F / M (utils/training_tools.py:10)


class StackedBiRNN(nn.Module):
    """Multi-layer bidirectional GRU/LSTM over (B, T, F) sequences.

    Equivalent of ``nn.GRU(..., num_layers=2, bidirectional=True,
    dropout=0.2)`` (baseline_models.py:191-193): inter-layer dropout on every
    layer's output except the last.  Uses ``nn.RNN`` (lax.scan under jit —
    static T, compiler-friendly).
    """

    hidden_size: int
    num_layers: int = 2
    cell_type: str = "gru"
    dropout_rate: float = 0.2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.cell_type == "gru":
            make_cell = lambda: nn.GRUCell(  # noqa: E731
                features=self.hidden_size, dtype=self.dtype)
        elif self.cell_type == "lstm":
            make_cell = lambda: nn.OptimizedLSTMCell(  # noqa: E731
                features=self.hidden_size, dtype=self.dtype)
        else:
            raise ValueError(f"Unsupported RNN cell: {self.cell_type!r}")

        for layer in range(self.num_layers):
            bidi = nn.Bidirectional(
                nn.RNN(make_cell()), nn.RNN(make_cell()), name=f"bidi_{layer}"
            )
            x = bidi(x)
            if layer < self.num_layers - 1:
                x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x  # (B, T, 2*hidden)


class AttentionPool(nn.Module):
    """Multi-head additive self-attention pooling.

    ``att = softmax_T(W2 tanh(W1 x))``; pooled ``z = mean_heads(att @ x)``
    (baseline_models.py:231-242).  ``use_bias`` is False for the 2-D models
    (:197-199) and True for the 1-D model (:69-71).
    """

    d_att: int = 128
    n_heads: int = 16
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        att = nn.Dense(self.d_att, use_bias=self.use_bias, name="att_linear1")(x)
        att = jnp.tanh(att)
        att = nn.Dense(self.n_heads, use_bias=self.use_bias, name="att_linear2")(att)
        att = jnp.swapaxes(att, -1, -2)  # (B, n_heads, T)
        att = jax.nn.softmax(att, axis=-1)
        z = jnp.matmul(att, x)  # (B, n_heads, F)
        return jnp.mean(z, axis=-2)  # (B, F)


def _conv_block(
    x: jax.Array,
    features: int,
    train: bool,
    dropout: float,
    pool: bool = True,
    name: str = "",
    dtype=None,
    bn_axis_name=None,
) -> jax.Array:
    """Conv5x5(SAME) -> BatchNorm -> ReLU -> MaxPool2x2 -> Dropout2d.

    The trailing dropout is CHANNEL dropout (``nn.Dropout2d`` in the
    reference, baseline_models.py:176-188): whole feature maps are zeroed
    per (sample, channel), i.e. the mask broadcasts over H and W.  Besides
    parity, this matters for speed — an elementwise mask on the
    (B, 200, 128, 32) activation costs more threefry RNG than the rest of
    the training step combined (measured, docs/ARCHITECTURE.md).

    ``bn_axis_name`` enables sync-BN: batch statistics are all-reduced over
    the named mesh axis (required for exact DP equivalence under shard_map,
    where reductions are shard-local by default).
    """
    x = nn.Conv(features, kernel_size=(5, 5), padding="SAME", name=f"conv{name}",
                dtype=dtype)(x)
    # momentum 0.9: the flax-convention equivalent of torch BatchNorm2d's
    # default momentum=0.1 (ra = 0.9*ra + 0.1*batch) — the reference uses
    # torch defaults (baseline_models.py:173-185); flax's own default 0.99
    # would track running stats 10x slower and desync eval-mode behavior
    x = nn.BatchNorm(use_running_average=not train, name=f"bn{name}",
                     momentum=0.9, dtype=dtype, axis_name=bn_axis_name)(x)
    x = nn.relu(x)
    if pool:
        x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
    x = nn.Dropout(dropout, broadcast_dims=(1, 2),
                   deterministic=not train)(x)
    return x


class _FusedConv0(nn.Module):
    """Parameter holder for the fused first conv block (path ``conv0/``).

    Declares exactly the parameters ``nn.Conv(name="conv0")`` would — same
    names, shapes, and initializers — so checkpoints move freely between the
    XLA and fused (ops/pallas_conv.py) conv backends.
    """

    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (5, 5, 1, self.features))
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return k, b


class _FusedBN0(nn.Module):
    """BatchNorm state for the fused first block (path ``bn0/``).

    Mirrors ``nn.BatchNorm(name="bn0")``'s parameters and batch_stats
    (scale/bias, mean/var, momentum 0.9 = torch BatchNorm2d's default
    0.1 in flax convention, like _conv_block) while the normalization
    itself runs inside the fused Pallas kernel; this module owns the
    running-stat update.  ``run_train(scale, bias) -> (pooled, mean, var)``
    and ``run_eval(scale, bias, mean, var) -> pooled`` close over the
    input.
    """

    features: int
    momentum: float = 0.9

    @nn.compact
    def __call__(self, run_train, run_eval, train: bool):
        f = self.features
        scale = self.param("scale", nn.initializers.ones_init(), (f,))
        bias = self.param("bias", nn.initializers.zeros_init(), (f,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((f,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((f,), jnp.float32))
        if train:
            pooled, bm, bv = run_train(scale, bias)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * bm
                ra_var.value = m * ra_var.value + (1.0 - m) * bv
        else:
            pooled = run_eval(scale, bias, ra_mean.value, ra_var.value)
        return pooled


def _flatten_channel_major(x: jax.Array) -> jax.Array:
    """(B, T', D', C) -> (B, T', C*D') with channel-major ordering.

    Matches the reference's NCHW ``x.transpose(1, 2).reshape(B, T', C*D')``
    layout (baseline_models.py:226-228).
    """
    b, t, d, c = x.shape
    return jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, c * d)


class _Heads(nn.Module):
    """dense1 -> ReLU -> Dropout -> emotion/gender/multitask head(s)."""

    pred: str = "emotion"
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = False):
        z = nn.Dense(128, name="dense1")(z)
        z = nn.relu(z)
        z = nn.Dropout(self.dropout_rate, deterministic=not train)(z)
        if self.pred == "multitask":
            return (
                nn.Dense(NUM_EMO_CLASSES, name="pred_emotion")(z),
                nn.Dense(NUM_GENDER_CLASSES, name="pred_gender")(z),
            )
        if self.pred == "emotion":
            return nn.Dense(NUM_EMO_CLASSES, name="pred_emotion")(z)
        return nn.Dense(NUM_GENDER_CLASSES, name="pred_gender")(z)


class Conv2dBiRNN(nn.Module):
    """The workhorse 2-D CNN + bidirectional RNN classifier.

    = ``two_d_cnn_lstm`` (baseline_models.py:143-260): three 5x5 conv blocks
    (32/64/128ch, BN, 2x2 maxpool, dropout 0.2), channel-major flatten, 2-layer
    biGRU, mean-pool or 16-head attention pooling, 128-d dense, task head(s).
    Trainer default hyperparameters: hidden=64, att_size=128
    (training_cloak.py:229-241).
    """

    hidden_size: int = 64
    num_rnn_layers: int = 2
    rnn_cell: str = "gru"
    pred: str = "emotion"
    att: Optional[str] = None
    attention_size: int = 128
    dropout_rate: float = 0.2
    # TPU perf knobs: dtype=jnp.bfloat16 runs conv/RNN compute in bf16
    # (params stay f32); remat=True rematerializes the encoder in the
    # backward pass (jax.checkpoint), trading FLOPs for HBM.
    dtype: Optional[jnp.dtype] = None
    remat: bool = False
    # sync-BN axis for shard_map data parallelism (parallel/shard_map_dp.py)
    bn_axis_name: Optional[str] = None
    # "xla" (default) or "fused1": run the first conv block (conv0+bn0+relu+
    # pool) as the fused Pallas kernel pair (ops/pallas_conv.py) — the block
    # that dominates the training epoch on v5e.  Requires dtype=bfloat16 on
    # TPU (VMEM); parameters and checkpoints are backend-interchangeable.
    conv_backend: str = "xla"

    def pool(self, x: jax.Array, pooling: Optional[str] = "mean") -> jax.Array:
        """Temporal pooling after the RNN; overridden usage in cloak wrappers."""
        if self.att is None:
            if pooling is None:
                return x.reshape(x.shape[0], -1)  # flatten (deep-model path)
            return jnp.mean(x, axis=1)
        if self.att == "self_att":
            return AttentionPool(
                d_att=self.attention_size, n_heads=16, use_bias=False, name="att_pool"
            )(x)
        raise ValueError(f"unknown att: {self.att!r}")

    def _fused_first_block(self, x: jax.Array, train: bool) -> jax.Array:
        """conv0+bn0+relu+pool as the fused Pallas kernels (conv_backend)."""
        from sept_tpu.ops.pallas_conv import (
            fused_block1_eval, fused_block1_train,
        )

        if x.shape[1:] != (200, 128, 1):
            raise ValueError(
                "conv_backend='fused1' supports the standard window geometry "
                f"(win_len 200, feature_len 128) only; got {x.shape[1:]}. "
                "Use conv_backend='xla' (or leave --conv_backend auto)."
            )
        interpret = jax.default_backend() == "cpu"
        cdtype = self.dtype or jnp.float32
        if cdtype == jnp.float32 and not interpret:
            raise ValueError(
                "conv_backend='fused1' requires dtype=bfloat16 on TPU "
                "(the f32 banded GEMM matrix exceeds VMEM); use "
                "--compute_dtype bfloat16 or conv_backend='xla'."
            )
        k, b = _FusedConv0(32, name="conv0")()

        def run_train(scale, bias_):
            return fused_block1_train(x, k, b, scale, bias_, 32, interpret,
                                      cdtype, self.bn_axis_name)

        def run_eval(scale, bias_, mean, var):
            return fused_block1_eval(x, k, b, scale, bias_, mean, var, 32,
                                     interpret, cdtype)

        return _FusedBN0(32, name="bn0")(run_train, run_eval, train)

    # DeepConv2dBiRNN flips this (plain class attr, not a dataclass field):
    # a 4th un-pooled 128->128 conv block before the flatten
    _extra_conv_block = False

    def encode(self, x: jax.Array, train: bool = False) -> jax.Array:
        """Conv stack + RNN: (B, T, D, 1) -> (B, T/8, 2*hidden)."""

        def _enc(mdl, x):
            # everything routes through ``mdl``, NOT a closure over ``self``:
            # under nn.remat flax rebinds the module into the checkpoint
            # scope, and parameters declared via the outer instance (the
            # fused block's _FusedConv0 param reads) leak tracers out of the
            # transform (UnexpectedTracerError at grad time).
            blocks = list(enumerate((32, 64, 128)))
            if mdl.conv_backend == "fused1":
                x = mdl._fused_first_block(x, train)
                x = nn.Dropout(mdl.dropout_rate, broadcast_dims=(1, 2),
                               deterministic=not train)(x)
                blocks = blocks[1:]
            for i, ch in blocks:
                x = _conv_block(x, ch, train, mdl.dropout_rate, name=str(i),
                                dtype=mdl.dtype,
                                bn_axis_name=mdl.bn_axis_name)
            if mdl._extra_conv_block:
                x = _conv_block(x, 128, train, mdl.dropout_rate, pool=False,
                                name="3", dtype=mdl.dtype,
                                bn_axis_name=mdl.bn_axis_name)
            x = _flatten_channel_major(x)
            x = StackedBiRNN(
                hidden_size=mdl.hidden_size,
                num_layers=mdl.num_rnn_layers,
                cell_type=mdl.rnn_cell,
                dropout_rate=mdl.dropout_rate,
                dtype=mdl.dtype,
                name="rnn",
            )(x, train=train)
            return x.astype(jnp.float32)

        if self.remat:
            return nn.remat(_enc)(self, x)
        return _enc(self, x)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        global_feature: Optional[jax.Array] = None,
        train: bool = False,
        pooling: Optional[str] = "mean",
    ):
        x = self.encode(x, train=train)
        z = self.pool(x, pooling)
        if global_feature is not None:
            z = jnp.concatenate([z, global_feature], axis=-1)
        return _Heads(pred=self.pred, dropout_rate=self.dropout_rate, name="heads")(
            z, train=train
        )


class DeepConv2dBiRNN(Conv2dBiRNN):
    """Deep variant: a 4th (un-pooled) 128->128 conv block; flatten pooling.

    = ``deep_two_d_cnn_lstm`` (baseline_models.py:264-385).  With ``att=None``
    the full RNN sequence is flattened instead of mean-pooled (:356-358), hence
    trainers pass ``pooling=None`` for 'deep' model types
    (training_cloak.py:132).  ``rnn_cell='lstm'`` gives the
    ``deep_two_d_cnn_lstm_tmp`` clone (:388-509).
    """

    # the deep variant's first block is identical to the base one, so the
    # fused kernel pair applies unchanged; encode() is inherited wholesale
    _extra_conv_block = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        global_feature: Optional[jax.Array] = None,
        train: bool = False,
        pooling: Optional[str] = None,
    ):
        x = self.encode(x, train=train)
        z = self.pool(x, pooling)
        if global_feature is not None:
            z = jnp.concatenate([z, global_feature], axis=-1)
        return _Heads(pred=self.pred, dropout_rate=self.dropout_rate, name="heads")(
            z, train=train
        )


class OneDConvNet(nn.Module):
    """1-D CNN over the frequency axis.

    = the *effective* ``one_d_cnn_lstm`` (baseline_models.py:19-140): the
    reference builds an RNN but never calls it (:109 is commented out), so the
    runnable architecture is conv1d 128->256->512 (maxpool 2/5/5), flatten or
    8-head attention, then the ``classifier`` MLP (512*4 -> 128) and heads.
    """

    pred: str = "emotion"
    att: Optional[str] = None
    attention_size: int = 128
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        global_feature: Optional[jax.Array] = None,
        train: bool = False,
        pooling: Optional[str] = None,
    ):
        # (B, T, D, 1) -> (B, T, D); conv over time with D input features
        x = x[..., 0]
        for ch, pool in ((128, 2), (256, 5), (512, 5)):
            x = nn.Conv(ch, kernel_size=(5,), padding="SAME")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, window_shape=(pool,), strides=(pool,))
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        # T=200 -> 200/2/5/5 = 4 steps of 512ch
        if self.att is None:
            z = x.reshape(x.shape[0], -1)  # (B, 512*4)
        elif self.att == "self_att":
            z = AttentionPool(
                d_att=self.attention_size, n_heads=8, use_bias=True, name="att_pool"
            )(x)
        else:
            raise ValueError(f"unknown att: {self.att!r}")
        if global_feature is not None:
            z = jnp.concatenate([z, global_feature], axis=-1)
        z = nn.Dense(128, name="classifier")(z)
        z = nn.relu(z)
        z = nn.Dropout(self.dropout_rate, deterministic=not train)(z)
        if self.pred == "multitask":
            return (
                nn.Dense(NUM_EMO_CLASSES, name="pred_emotion")(z),
                nn.Dense(NUM_GENDER_CLASSES, name="pred_gender")(z),
            )
        if self.pred == "emotion":
            return nn.Dense(NUM_EMO_CLASSES, name="pred_emotion")(z)
        return nn.Dense(NUM_GENDER_CLASSES, name="pred_gender")(z)


class PlainConv2d(nn.Module):
    """VGG-ish plain 2-D CNN with per-class temporal projection.

    = ``two_d_cnn`` (baseline_models.py:512-596) with the latent channel
    mismatch fixed (64->64 in block 5, see module docstring).  Output is the
    temporal mean of a learned per-class projection of the flattened features
    (:585-594).
    """

    pred: str = "emotion"
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        global_feature: Optional[jax.Array] = None,
        train: bool = False,
        pooling: Optional[str] = None,
    ):
        spec = [
            (32, False, False),
            (48, True, True),
            (64, False, False),
            (64, True, True),
            (64, False, False),
            (64, True, True),
        ]
        for i, (ch, bn, pool) in enumerate(spec):
            x = nn.Conv(ch, kernel_size=(3, 3), padding="SAME", name=f"conv{i}")(x)
            if bn:
                # torch-default running-stat EMA (see _conv_block)
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, name=f"bn{i}")(x)
            x = nn.relu(x)
            if pool:
                x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
            # channel dropout, as in the reference's nn.Dropout2d (:519-545)
            x = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2),
                           deterministic=not train)(x)
        x = _flatten_channel_major(x)  # (B, T/8, 64*D/8)
        x = jnp.swapaxes(x, 1, 2)  # (B, F, T/8)
        n_out = NUM_EMO_CLASSES if self.pred == "emotion" else NUM_GENDER_CLASSES
        w = self.param(
            "w1" if self.pred == "emotion" else "w2",
            nn.initializers.uniform(1.0),
            (x.shape[-1], n_out),
        )
        x = jnp.matmul(x, w)  # (B, F, n_out) per-feature class scores
        return jnp.mean(x, axis=1)

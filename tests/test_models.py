"""Model zoo unit tests: shapes, cloak noise math, GRL minimax gradient signs.

Reference semantics: /root/reference/model/{baseline_models,cloak_models}.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sept_tpu.models import (
    CloakNoise,
    CloakedModel,
    CloakedModelGRL,
    Conv2dBiRNN,
    DeepConv2dBiRNN,
    OneDConvNet,
    PlainConv2d,
    build_backbone,
)

B, T, D = 2, 200, 128
KEY = jax.random.PRNGKey(8)


def _x():
    return jax.random.normal(KEY, (B, T, D, 1), dtype=jnp.float32)


def _init_apply(model, *args, train=False, **kwargs):
    variables = model.init(
        {"params": KEY, "dropout": KEY, "noise": KEY}, *args, train=train, **kwargs
    )
    out = model.apply(
        variables,
        *args,
        train=train,
        rngs={"dropout": KEY, "noise": KEY},
        mutable=["batch_stats"] if train else False,
        **kwargs,
    )
    if train:
        out = out[0]
    return out, variables


@pytest.mark.parametrize("pred,n_out", [("emotion", 4), ("gender", 2)])
@pytest.mark.slow
def test_conv2d_birnn_shapes(pred, n_out):
    model = Conv2dBiRNN(hidden_size=64, pred=pred)
    logits, variables = _init_apply(model, _x())
    assert logits.shape == (B, n_out)
    # rnn input is channel-major 128 * D/8 = 2048 (baseline_models.py:161)
    kernel = variables["params"]["rnn"]["GRUCell_0"]["in"]["kernel"]
    assert kernel.shape[0] == 128 * (D // 8)


def test_conv2d_birnn_multitask_and_global():
    model = Conv2dBiRNN(hidden_size=64, pred="multitask")
    g = jnp.zeros((B, 88))
    (emo, gen), _ = _init_apply(model, _x(), global_feature=g)
    assert emo.shape == (B, 4) and gen.shape == (B, 2)


def test_conv2d_birnn_attention_pooling():
    model = Conv2dBiRNN(hidden_size=64, att="self_att", attention_size=128)
    logits, variables = _init_apply(model, _x())
    assert logits.shape == (B, 4)
    assert "att_pool" in variables["params"]


def test_deep_variant_flatten_pooling():
    model = DeepConv2dBiRNN(hidden_size=64)
    logits, variables = _init_apply(model, _x(), pooling=None)
    assert logits.shape == (B, 4)
    # flatten mode: dense1 input = 2*hidden*T/8 = 128*25 (baseline_models.py:334)
    assert variables["params"]["heads"]["dense1"]["kernel"].shape[0] == 2 * 64 * (T // 8)


@pytest.mark.slow
def test_one_d_and_plain_2d_models_run():
    logits, _ = _init_apply(OneDConvNet(), _x())
    assert logits.shape == (B, 4)
    logits, _ = _init_apply(PlainConv2d(), _x())
    assert logits.shape == (B, 4)


def test_build_backbone_factory():
    assert isinstance(build_backbone("cnn-lstm-att", hidden_size=64), Conv2dBiRNN)
    assert isinstance(build_backbone("deep-2d-cnn-lstm"), DeepConv2dBiRNN)
    assert isinstance(build_backbone("1d-cnn-lstm-att"), OneDConvNet)
    assert isinstance(build_backbone("2d-cnn"), PlainConv2d)
    with pytest.raises(ValueError):
        build_backbone("nope")


# ---------------------------------------------------------------------------
# CloakNoise math (cloak_models.py:24-58)
# ---------------------------------------------------------------------------


def test_cloak_noise_scales_init():
    noise = CloakNoise(win_len=T, n_feats=D, min_scale=0.01, max_scale=10.0)
    variables = noise.init({"params": KEY, "noise": KEY}, jnp.zeros((1, T, D)))
    rhos = variables["params"]["rhos"]
    np.testing.assert_allclose(np.asarray(rhos), -2.0)
    scales = noise.apply(variables, method=CloakNoise.scales)
    # (1 + tanh(-2))/2 * (10 - 0.01) + 0.01
    expect = (1 + np.tanh(-2.0)) / 2 * 9.99 + 0.01
    np.testing.assert_allclose(np.asarray(scales), expect, rtol=1e-3)


def test_cloak_noise_statistics():
    noise = CloakNoise(win_len=T, n_feats=D)
    variables = noise.init({"params": KEY, "noise": KEY}, jnp.zeros((1, T, D)))
    x = jnp.zeros((64, T, D))
    out = noise.apply(variables, x, rngs={"noise": jax.random.PRNGKey(3)})
    # effective std = eps_std * scales = 0.1 * 0.129 ~= 0.0129
    expect_std = 0.1 * ((1 + np.tanh(-2.0)) / 2 * 9.99 + 0.01)
    assert abs(float(jnp.std(out)) - expect_std) < 0.05 * expect_std
    # one shared draw per call: all batch elements get identical noise
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_cloak_noise_mask_gates_eps_not_locs():
    """mask zeros the input and epsilon, but mu is still added (quirk 7)."""
    noise = CloakNoise(win_len=4, n_feats=4)
    variables = noise.init({"params": KEY, "noise": KEY}, jnp.zeros((1, 4, 4)))
    variables = jax.tree.map(lambda v: v, variables)
    locs = jnp.full((4, 4), 7.0)
    variables = {"params": {"locs": locs, "rhos": variables["params"]["rhos"]}}
    mask = jnp.zeros((4, 4))
    x = jnp.ones((1, 4, 4)) * 100.0
    out = noise.apply(variables, x, mask, rngs={"noise": KEY})
    # input*0 + (locs + scales*eps*0) = locs
    np.testing.assert_allclose(np.asarray(out[0]), 7.0, atol=1e-6)


# ---------------------------------------------------------------------------
# Composite cloak models
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_cloaked_model_outputs_and_noisy_stopgrad():
    backbone = Conv2dBiRNN(hidden_size=32, pred="emotion")
    model = CloakedModel(backbone=backbone, win_len=T, n_feats=D)
    x = _x()
    variables = model.init({"params": KEY, "noise": KEY}, x)
    logits, noisy = model.apply(variables, x, rngs={"noise": KEY})
    assert logits.shape == (B, 4)
    assert noisy.shape == x.shape

    # noisy must carry no gradient to the noise params (it is detached)
    def loss_via_noisy(params):
        _, ny = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, rngs={"noise": KEY},
        )
        return jnp.sum(ny)

    g = jax.grad(loss_via_noisy)(variables["params"])
    assert float(jnp.max(jnp.abs(g["noise"]["locs"]))) == 0.0


@pytest.mark.slow
def test_cloaked_model_grads_flow_through_frozen_backbone():
    backbone = Conv2dBiRNN(hidden_size=32, pred="emotion")
    model = CloakedModel(backbone=backbone, win_len=T, n_feats=D)
    x = _x()
    variables = model.init({"params": KEY, "noise": KEY}, x)

    def loss(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, rngs={"noise": KEY},
        )
        return jnp.sum(logits**2)

    g = jax.grad(loss)(variables["params"])
    # gradients reach the noise parameters THROUGH the backbone
    assert float(jnp.max(jnp.abs(g["noise"]["locs"]))) > 0.0
    assert float(jnp.max(jnp.abs(g["noise"]["rhos"]))) > 0.0


@pytest.mark.slow
def test_cloaked_grl_gradient_signs():
    """The GRL game: gender loss gradient w.r.t. noise params is REVERSED.

    Compare d(gender_loss)/d(locs) computed through the GRL model against the
    same quantity with lambda=0 gradient flow replaced by a direct (no-GRL)
    path: they must have opposite sign (scaled by lambda).
    """
    emo = Conv2dBiRNN(hidden_size=16, pred="emotion")
    gen = Conv2dBiRNN(hidden_size=16, pred="gender")
    x = jax.random.normal(KEY, (2, T, D, 1))
    labels = jnp.array([0, 1])

    def make(lam):
        return CloakedModelGRL(
            emotion_backbone=emo, gender_backbone=gen, grl_lambda=lam,
            win_len=T, n_feats=D,
        )

    model = make(0.5)
    variables = model.init({"params": KEY, "noise": KEY}, x)

    def gender_loss(params, lam):
        m = make(lam)
        _, gl, _ = m.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, rngs={"noise": KEY},
        )
        onehot = jax.nn.one_hot(labels, 2)
        return -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(gl), axis=-1))

    g_rev = jax.grad(gender_loss)(variables["params"], 0.5)["noise"]["locs"]
    g_fwd = jax.grad(gender_loss)(variables["params"], -1.0)["noise"]["locs"]
    # lambda=-1 flips the reversal back to a (scaled) forward gradient:
    # g_rev = -0.5 * g_direct and g_fwd = +1.0 * g_direct
    np.testing.assert_allclose(
        np.asarray(g_rev), -0.5 * np.asarray(g_fwd), rtol=1e-4, atol=1e-7
    )
    # gender model's own params get NORMAL (non-reversed) gradients: equal
    # regardless of lambda? No — lambda scales them too through the input path;
    # but the head weights' grads do not pass the GRL at all.
    g_head_rev = jax.grad(gender_loss)(variables["params"], 0.5)
    g_head_fwd = jax.grad(gender_loss)(variables["params"], -1.0)
    h1 = g_head_rev["gender_backbone"]["heads"]["pred_gender"]["kernel"]
    h2 = g_head_fwd["gender_backbone"]["heads"]["pred_gender"]["kernel"]
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_bf16_and_remat_modes():
    """TPU perf knobs: bf16 compute keeps f32 params; remat grads match."""
    x = jax.random.normal(KEY, (2, 40, 32, 1))

    m_bf16 = Conv2dBiRNN(hidden_size=8, dtype=jnp.bfloat16)
    v = jax.jit(m_bf16.init)({"params": KEY}, x)
    assert v["params"]["conv0"]["kernel"].dtype == jnp.float32  # params f32
    out = m_bf16.apply(v, x)
    assert out.shape == (2, 4)

    m32 = Conv2dBiRNN(hidden_size=8, dropout_rate=0.0)
    m_remat = Conv2dBiRNN(hidden_size=8, dropout_rate=0.0, remat=True)
    v32 = jax.jit(m32.init)({"params": KEY}, x)

    def loss(m, params):
        return jnp.sum(
            m.apply({"params": params, "batch_stats": v32["batch_stats"]}, x) ** 2
        )

    g1 = jax.grad(lambda p: loss(m32, p))(v32["params"])
    g2 = jax.grad(lambda p: loss(m_remat, p))(v32["params"])
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_conv_block_dropout_is_channel_dropout():
    """The conv-block dropout zeroes whole (sample, channel) feature maps.

    The reference uses ``nn.Dropout2d`` after every 2-D conv block
    (baseline_models.py:176-188): the mask broadcasts over H and W.  Besides
    parity, this is a large TPU win — an elementwise mask on the conv
    activations costs more threefry RNG than the rest of the training step
    (docs/ARCHITECTURE.md).  Dropping the whole plane or keeping it intact
    (scaled by 1/(1-p)) is the observable contract.
    """
    import flax.linen as nn

    from sept_tpu.models.backbone import _conv_block

    class Wrap(nn.Module):
        rate: float

        @nn.compact
        def __call__(self, x, train=False):
            return _conv_block(x, 8, train, self.rate, name="0")

    p = 0.7
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 1))
    v = Wrap(p).init({"params": KEY, "dropout": KEY}, x, train=False)
    y, _ = Wrap(p).apply(v, x, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(3)})
    y0, _ = Wrap(0.0).apply(v, x, train=True, mutable=["batch_stats"],
                            rngs={"dropout": jax.random.PRNGKey(3)})
    y = np.asarray(y)
    y0 = np.asarray(y0)
    dropped = kept = 0
    for b in range(y.shape[0]):
        for c in range(y.shape[-1]):
            plane, ref = y[b, :, :, c], y0[b, :, :, c]
            if np.all(plane == 0.0) and np.any(ref != 0.0):
                dropped += 1
            else:
                np.testing.assert_allclose(plane, ref / (1.0 - p), rtol=1e-5)
                kept += 1
    # p=0.7 over 32 planes: both outcomes occur with overwhelming probability
    assert dropped > 0 and kept > 0


def test_build_backbone_accepts_full_trainer_knob_set():
    """Every --model_type builds under the trainers' FULL kwarg set.

    run_fold passes the whole knob set (hidden_size, att, bn_axis_name,
    dtype, conv_backend, remat, ...) regardless of model type; the factory
    must drop family-only knobs the target class lacks (bn_axis_name was
    missed by the old per-branch pop lists — 1d-cnn-lstm-att and 2d-cnn
    crashed at model build) while still raising on unknown typos.
    """
    from sept_tpu.models import build_backbone

    trainer_kwargs = dict(hidden_size=16, pred="emotion", att=None,
                          attention_size=128, bn_axis_name=None,
                          dtype=None, conv_backend="xla", remat=False)
    for mt in ("2d-cnn-lstm", "cnn-lstm-att", "deep-2d-cnn-lstm",
               "1d-cnn-lstm-att", "2d-cnn"):
        build_backbone(mt, **trainer_kwargs)

    with pytest.raises(TypeError):
        build_backbone("2d-cnn-lstm", hiden_size=16)  # typo must not vanish
    with pytest.raises(ValueError):
        build_backbone("no-such-model")

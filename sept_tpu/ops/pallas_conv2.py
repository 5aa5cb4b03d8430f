"""Fused Pallas TPU kernels for the SECOND conv block of the workhorse model.

After the first block was fused (ops/pallas_conv.py) and the conv dropouts
became channel dropout, profiling the bf16 scanned epoch showed the second
conv block — conv 5x5 32->64 on (B, 100, 64), BatchNorm, ReLU, 2x2 max-pool
— as the remaining hotspot: XLA's transposed-conv dx lowering alone ran at
~12% MXU efficiency (0.86 ms/step), with dW, the forward conv, the pool's
select-and-scatter and its layout copies adding another ~1.2 ms.

These kernels use a different decomposition than block 1 (whose banded-GEMM
trick relies on c_in == 1).  Here the item is viewed FLAT: rows are the 6400
(h, w) output positions, lanes are channels.  The conv is exact-FLOP im2col:

  forward  K1: 25 masked sublane-rolls build (6400, 5*32) patch groups per
               h-tap; five (6400,160)@(160,64) MXU GEMMs accumulate the conv.
               Per-channel BN moment partials accumulate across the grid.
           K2: BN-apply + ReLU + 2x2 pool.  In the flat view the pool window
               {(h,w),(h,w+1),(h+1,w),(h+1,w+1)} is rows {r, r+1, r+64,
               r+65}, so the max is two sublane rolls; compaction to the
               pooled grid is a dim-split reshape to (50, 128, C) h-pair
               blocks and one 0/1 (128,32) selector dot per item.
  backward K3: recompute, route the pooled cotangent to the FIRST max of
               each window (select-and-scatter semantics) via the transposed
               selector dot, ReLU mask, BN-reduction partials.
           K4: dW as five (160,6400)@(6400,64) patch^T-cotangent GEMMs —
               exact-FLOP, no band extraction needed; db alongside.
           K5: dx via the transposed GEMMs and 25 shifted scatter-adds.

All heavy math is MXU bf16 with f32 accumulation.  ReLU-tie and pool-tie
semantics match ops/pallas_conv.py (first-max routing; exact equality holds
because pooled maxes are compute-dtype values carried exactly through the
0/1 selector GEMMs).

Reference behavior being fused: the second conv/BN/ReLU/pool block of
/root/reference/model/baseline_models.py:180-189 (``two_d_cnn_lstm``), as
re-implemented by models/backbone.py::_conv_block with features=64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from sept_tpu.ops.pallas_conv import (  # shared plumbing + oracle
    _EPS,
    _grid_call,
    _full,
    _per_item,
    block1_reference,
)

__all__ = ["fused_block2_train", "fused_block2_eval", "block2_reference"]

H, W = 100, 64  # input geometry: block-1 pooled output (win 200/2, mel 128/2)
N = H * W  # 6400 flat (h, w) rows
HP, WP = H // 2, W // 2
_TAPS = tuple(range(-2, 3))

block2_reference = block1_reference  # the jnp oracle is geometry-agnostic


# ---------------------------------------------------------------------------
# host-side 0/1 constants (over the 128-row h-pair blocks)


@functools.lru_cache(maxsize=None)
def _pool_selector():
    """(128, 32): S[rho, wp] = 1 iff rho == 2*wp (the window anchor row)."""
    rho = np.arange(2 * W)[:, None]
    wp = np.arange(WP)[None, :]
    return (rho == 2 * wp).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _pool_replicator():
    """(32, 128): R[wp, rho] = 1 iff (rho % 64) // 2 == wp."""
    wp = np.arange(WP)[:, None]
    rho = np.arange(2 * W)[None, :]
    return (((rho % W) // 2) == wp).astype(np.float32)


def _build_m(kernel: jax.Array, c_in: int, c_out: int) -> jax.Array:
    """(5, 5, CI, CO) conv kernel -> (25*CI, CO) tap-major GEMM matrix."""
    return kernel.reshape(25 * c_in, c_out)


# ---------------------------------------------------------------------------
# in-kernel helpers


def _tap_masks(c_in):
    """Validity masks over the flat (N, CI) view for every (dh, dw) tap."""
    r = jax.lax.broadcasted_iota(jnp.int32, (N, c_in), 0)
    h = r // W
    w = r % W
    return h, w


def _patch_group(x, h, w, dh, cdtype):
    """(N, CI) -> (N, 5*CI): the five dw-shifts of the dh-rolled input."""
    parts = []
    for dw in _TAPS:
        s = dh * W + dw
        xs = x if s == 0 else jnp.roll(x, -s, axis=0)
        valid = ((h + dh >= 0) & (h + dh < H)
                 & (w + dw >= 0) & (w + dw < W))
        parts.append(jnp.where(valid, xs, 0).astype(cdtype))
    return jnp.concatenate(parts, axis=1)


def _k1_conv_stats(x_ref, m_ref, bias_ref, conv_ref, stats_ref, *, cdtype,
                   c_in, c_out):
    b = pl.program_id(0)
    x = x_ref[0].astype(cdtype)  # (N, CI)
    h, w = _tap_masks(c_in)
    acc = jnp.zeros((N, c_out), jnp.float32)
    for i, dh in enumerate(_TAPS):
        p = _patch_group(x, h, w, dh, cdtype)  # (N, 5*CI)
        rows = m_ref[:, :][i * 5 * c_in:(i + 1) * 5 * c_in]
        acc = acc + jnp.dot(p, rows, preferred_element_type=jnp.float32)
    y = acc + bias_ref[0, :][None, :]
    y_st = y.astype(conv_ref.dtype)
    conv_ref[0] = y_st
    # moments of the STORED (rounded) activation, as in pallas_conv K1
    yr = y_st.astype(jnp.float32)
    s = jnp.sum(yr, axis=0, keepdims=True)
    ss = jnp.sum(yr * yr, axis=0, keepdims=True)
    sb = jnp.concatenate([s, ss], axis=0)  # (2, CO)

    @pl.when(b == 0)
    def _():
        stats_ref[:, :] = sb

    @pl.when(b > 0)
    def _():
        stats_ref[:, :] = stats_ref[:, :] + sb


def _window_max(z):
    """cdtype (50, 128, C): max over rows {rho, rho+1, rho+64, rho+65}.

    Valid at anchors (rho even, rho < 64); rolls stay inside each h-pair
    block, so no edge masking is needed for the anchor rows.
    """
    m1 = jnp.maximum(z, jnp.roll(z, -1, axis=1))
    return jnp.maximum(m1, jnp.roll(m1, -64, axis=1))


def _compact(m2, csel_ref, cdtype):
    """(50, 128, C) window maxes -> (50, C, 32) pooled, exact cdtype carry."""
    return jax.lax.dot_general(
        jnp.swapaxes(m2, 1, 2).astype(cdtype),
        csel_ref[:, :].astype(cdtype),
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (50, C, 32)


def _k2_norm_pool(conv_ref, a_ref, b2_ref, csel_ref, out_ref, *, cdtype,
                  c_out):
    y = conv_ref[0].astype(jnp.float32)  # (50, 128, CO)
    z = jnp.maximum(y * a_ref[0, :][None, None, :]
                    + b2_ref[0, :][None, None, :], 0.0)
    pooled = _compact(_window_max(z.astype(cdtype)), csel_ref, cdtype)
    # pooled maxes are cdtype values carried exactly through the 0/1 dot
    out_ref[0] = jnp.swapaxes(pooled, 1, 2).astype(out_ref.dtype)


def _replicate(p3, rrep_ref, cdtype):
    """(50, C, 32) pooled-grid values -> (50, 128, C) per-position f32."""
    up = jax.lax.dot_general(
        p3.astype(cdtype), rrep_ref[:, :].astype(cdtype),
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (50, C, 128)
    return jnp.swapaxes(up, 1, 2)


def _k3_route(conv_ref, dpool_ref, a_ref, b2_ref, mean_ref, inv_ref,
              csel_ref, rrep_ref, dy_ref, red_ref, *, cdtype, c_out):
    b = pl.program_id(0)
    y = conv_ref[0].astype(jnp.float32)  # (50, 128, CO)
    bn = y * a_ref[0, :][None, None, :] + b2_ref[0, :][None, None, :]
    z = jnp.maximum(bn, 0.0).astype(cdtype)
    pooled = _compact(_window_max(z), csel_ref, cdtype)  # (50, CO, 32) f32
    m_up = _replicate(pooled, rrep_ref, cdtype)  # (50, 128, CO)
    dpo = jnp.swapaxes(dpool_ref[0].astype(jnp.float32), 1, 2)
    d_up = _replicate(dpo, rrep_ref, cdtype)

    # first-max routing in window scan order (h,w),(h,w+1),(h+1,w),(h+1,w+1):
    # rows rho, rho+1, rho+64, rho+65 of each h-pair block
    eq = (z.astype(jnp.float32) == m_up).astype(jnp.float32)
    rho = jax.lax.broadcasted_iota(jnp.int32, (HP, 2 * W, c_out), 1)
    even_w = (rho % 2 == 0).astype(jnp.float32)
    even_h = (rho < W).astype(jnp.float32)
    am = eq * even_h * even_w
    bm = eq * even_h * (1.0 - even_w)
    cm = eq * (1.0 - even_h) * even_w
    dm = eq * (1.0 - even_h) * (1.0 - even_w)
    rr = lambda t, s: jnp.roll(t, s, axis=1)  # noqa: E731
    sel = am
    sel = sel + bm * (1.0 - rr(am, 1))
    sel = sel + cm * (1.0 - rr(am, 64)) * (1.0 - rr(bm, 63))
    sel = sel + dm * (1.0 - rr(am, 65)) * (1.0 - rr(bm, 64)) * (
        1.0 - rr(cm, 1))
    relu_g = (bn > 0.0).astype(jnp.float32)
    dy = d_up * sel * relu_g  # (50, 128, CO)
    dy_ref[0] = dy.astype(dy_ref.dtype)

    xhat = (y - mean_ref[0, :][None, None, :]) * inv_ref[0, :][None, None, :]
    s1 = jnp.sum(dy, axis=(0, 1))[None, :]
    s2 = jnp.sum(dy * xhat, axis=(0, 1))[None, :]
    sb = jnp.concatenate([s1, s2], axis=0)  # (2, CO)

    @pl.when(b == 0)
    def _():
        red_ref[:, :] = sb

    @pl.when(b > 0)
    def _():
        red_ref[:, :] = red_ref[:, :] + sb


def _dconv(conv_ref, dy_ref, ga_ref, mean_ref, inv_ref, m1_ref, m2_ref):
    """Recompute the pre-BN cotangent (N, CO) f32 from saved tensors."""
    y = conv_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    xhat = (y - mean_ref[0, :][None, :]) * inv_ref[0, :][None, :]
    return ga_ref[0, :][None, :] * (
        dy - m1_ref[0, :][None, :] - xhat * m2_ref[0, :][None, :])


def _k4_grads(x_ref, conv_ref, dy_ref, ga_ref, mean_ref, inv_ref, m1_ref,
              m2_ref, dw_ref, db_ref, *, cdtype, c_in, c_out):
    b = pl.program_id(0)
    dconv = _dconv(conv_ref, dy_ref, ga_ref, mean_ref, inv_ref, m1_ref,
                   m2_ref)
    dconv_c = dconv.astype(cdtype)
    x = x_ref[0].astype(cdtype)
    h, w = _tap_masks(c_in)
    db_b = jnp.sum(dconv, axis=0, keepdims=True)  # (1, CO)

    # one full-width GEMM: (N, 25*CI)^T-contract-(N, CO) -> (25*CI, CO)
    p = jnp.concatenate(
        [_patch_group(x, h, w, dh, cdtype) for dh in _TAPS], axis=1)
    g = jax.lax.dot_general(
        p, dconv_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (25*CI, CO)

    @pl.when(b == 0)
    def _():
        dw_ref[:, :] = g
        db_ref[:, :] = db_b

    @pl.when(b > 0)
    def _():
        dw_ref[:, :] = dw_ref[:, :] + g
        db_ref[:, :] = db_ref[:, :] + db_b


def _k5_dx(conv_ref, dy_ref, m_ref, ga_ref, mean_ref, inv_ref, m1_ref,
           m2_ref, dx_ref, *, cdtype, c_in, c_out):
    dconv_c = _dconv(conv_ref, dy_ref, ga_ref, mean_ref, inv_ref,
                     m2_ref=m2_ref, m1_ref=m1_ref).astype(cdtype)
    h, w = _tap_masks(c_in)
    # one full-width GEMM: (N, CO) @ (25*CI, CO)^T -> d-patches (N, 25*CI)
    dp = jax.lax.dot_general(
        dconv_c, m_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = jnp.zeros((N, c_in), jnp.float32)
    for i, dh in enumerate(_TAPS):
        for j, dw in enumerate(_TAPS):
            s = dh * W + dw
            t = dp[:, (i * 5 + j) * c_in:(i * 5 + j + 1) * c_in]
            valid = ((h + dh >= 0) & (h + dh < H)
                     & (w + dw >= 0) & (w + dw < W))
            t = jnp.where(valid, t, 0)
            acc = acc + (t if s == 0 else jnp.roll(t, s, axis=0))
    dx_ref[0] = acc.astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call plumbing


def _run_k1(x2, m, bias_row, b, c_in, c_out, cdtype, interpret):
    return _grid_call(
        _k1_conv_stats,
        [_per_item((N, c_in)), _full((25 * c_in, c_out)), _full((1, c_out))],
        [
            (_per_item((N, c_out)),
             jax.ShapeDtypeStruct((b, N, c_out), cdtype)),
            (_full((2, c_out)), jax.ShapeDtypeStruct((2, c_out), jnp.float32)),
        ],
        b, interpret, cdtype=cdtype, c_in=c_in, c_out=c_out,
    )(x2, m, bias_row)


def _run_k2(conv4, a_row, b2_row, b, c_out, cdtype, interpret):
    return _grid_call(
        _k2_norm_pool,
        [_per_item((HP, 2 * W, c_out)), _full((1, c_out)), _full((1, c_out)),
         _full((2 * W, WP))],
        [(_per_item((HP, WP, c_out)),
          jax.ShapeDtypeStruct((b, HP, WP, c_out), cdtype))],
        b, interpret, cdtype=cdtype, c_out=c_out,
    )(conv4, a_row, b2_row, jnp.asarray(_pool_selector()))[0]


def _rep_row(v: jax.Array) -> jax.Array:
    return v.astype(jnp.float32)[None, :]


def _core_bwd(res, d_pooled, train, c_in, c_out, interpret, cdtype,
              axis_name):
    """Shared backward: returns (dx2, dk, db, dgamma, dbeta)."""
    x2, conv_out, kernel, gamma, beta, mean, var = res
    b = x2.shape[0]
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + _EPS)
    ga = gamma.astype(jnp.float32) * inv
    a_row = _rep_row(ga)
    b2_row = _rep_row(beta.astype(jnp.float32) - mean * ga)
    mean_row = _rep_row(mean)
    inv_row = _rep_row(inv)
    conv4 = conv_out.reshape(b, HP, 2 * W, c_out)

    dy4, red = _grid_call(
        _k3_route,
        [_per_item((HP, 2 * W, c_out)), _per_item((HP, WP, c_out)),
         _full((1, c_out)), _full((1, c_out)),
         _full((1, c_out)), _full((1, c_out)),
         _full((2 * W, WP)), _full((WP, 2 * W))],
        [
            (_per_item((HP, 2 * W, c_out)),
             jax.ShapeDtypeStruct((b, HP, 2 * W, c_out), cdtype)),
            (_full((2, c_out)), jax.ShapeDtypeStruct((2, c_out), jnp.float32)),
        ],
        b, interpret, cdtype=cdtype, c_out=c_out,
    )(conv4, d_pooled, a_row, b2_row, mean_row, inv_row,
      jnp.asarray(_pool_selector()), jnp.asarray(_pool_replicator()))
    dy = dy4.reshape(b, N, c_out)

    dbeta = red[0]
    dgamma = red[1]
    if train:
        n = b * N
        m1 = red[0] / n
        m2 = red[1] / n
        if axis_name is not None:
            m1 = jax.lax.pmean(m1, axis_name)
            m2 = jax.lax.pmean(m2, axis_name)
    else:
        m1 = jnp.zeros_like(dbeta)
        m2 = jnp.zeros_like(dgamma)
    m1_row = _rep_row(m1)
    m2_row = _rep_row(m2)

    dw, db_row = _grid_call(
        _k4_grads,
        [_per_item((N, c_in)), _per_item((N, c_out)), _per_item((N, c_out)),
         _full((1, c_out)), _full((1, c_out)),
         _full((1, c_out)), _full((1, c_out)), _full((1, c_out))],
        [
            (_full((25 * c_in, c_out)),
             jax.ShapeDtypeStruct((25 * c_in, c_out), jnp.float32)),
            (_full((1, c_out)), jax.ShapeDtypeStruct((1, c_out), jnp.float32)),
        ],
        b, interpret, cdtype=cdtype, c_in=c_in, c_out=c_out,
    )(x2, conv_out, dy, a_row, mean_row, inv_row, m1_row, m2_row)

    dk = dw.reshape(5, 5, c_in, c_out).astype(kernel.dtype)
    db = db_row[0]

    m = _build_m(kernel, c_in, c_out).astype(cdtype)
    dx2 = _grid_call(
        _k5_dx,
        [_per_item((N, c_out)), _per_item((N, c_out)),
         _full((25 * c_in, c_out)),
         _full((1, c_out)), _full((1, c_out)),
         _full((1, c_out)), _full((1, c_out)), _full((1, c_out))],
        # emit the cotangent in the primal x's dtype directly (bf16 when fed
        # by block 1) — accumulation stays f32 in VMEM
        [(_per_item((N, c_in)), jax.ShapeDtypeStruct((b, N, c_in),
                                                     x2.dtype))],
        b, interpret, cdtype=cdtype, c_in=c_in, c_out=c_out,
    )(conv_out, dy, m, a_row, mean_row, inv_row, m1_row, m2_row)[0]

    return dx2, dk, db, dbeta, dgamma


def _fwd_shared(x, kernel, bias, c_in, c_out, interpret, cdtype):
    b = x.shape[0]
    x2 = x.reshape(b, N, c_in)
    m = _build_m(kernel, c_in, c_out).astype(cdtype)
    return _run_k1(x2, m, _rep_row(bias), b, c_in, c_out, cdtype, interpret)


# ---------------------------------------------------------------------------
# public primitives


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def fused_block2_train(x, kernel, bias, gamma, beta, c_in=32, c_out=64,
                       interpret=False, compute_dtype=jnp.bfloat16,
                       axis_name=None):
    """Training-mode fused second block: batch-stat BN.

    (B, 100, 64, CI) -> (pooled, mean, var) with pooled NHWC (B, 50, 32, CO).
    Same contract as pallas_conv.fused_block1_train: the custom VJP
    implements the full batch-statistics BatchNorm backward; ``axis_name``
    synchronizes the moments over the mesh axis (sync-BN); cotangents of
    (mean, var) are ignored (they feed only running-average updates).
    """
    out, _ = _train_fwd(x, kernel, bias, gamma, beta, c_in, c_out, interpret,
                        compute_dtype, axis_name)
    return out


def _train_fwd(x, kernel, bias, gamma, beta, c_in, c_out, interpret, cdtype,
               axis_name):
    b = x.shape[0]
    conv_out, col_stats = _fwd_shared(x, kernel, bias, c_in, c_out, interpret,
                                      cdtype)
    n = b * N
    mean = col_stats[0] / n
    msq = col_stats[1] / n
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        msq = jax.lax.pmean(msq, axis_name)
    var = jnp.maximum(msq - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + _EPS)
    ga = gamma.astype(jnp.float32) * inv
    conv4 = conv_out.reshape(b, HP, 2 * W, c_out)
    pooled = _run_k2(conv4, _rep_row(ga),
                     _rep_row(beta.astype(jnp.float32) - mean * ga),
                     b, c_out, cdtype, interpret)
    res = (x.reshape(b, N, c_in), conv_out, kernel, gamma, beta, mean, var)
    return (pooled, mean, var), res


def _train_bwd(c_in, c_out, interpret, cdtype, axis_name, res, cts):
    d_pooled, _d_mean, _d_var = cts
    dx2, dk, db, dbeta, dgamma = _core_bwd(
        res, d_pooled, True, c_in, c_out, interpret, cdtype, axis_name)
    x_shaped = dx2.reshape(dx2.shape[0], H, W, c_in)
    return (x_shaped, dk, db, dgamma, dbeta)


fused_block2_train.defvjp(_train_fwd, _train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_block2_eval(x, kernel, bias, gamma, beta, mean, var, c_in=32,
                      c_out=64, interpret=False, compute_dtype=jnp.bfloat16):
    """Eval-mode fused second block: normalize with the given running stats.

    Differentiable w.r.t. x/kernel/bias/gamma/beta (the frozen-backbone
    cloak path); (mean, var) get zero cotangents, matching flax.
    """
    pooled, _ = _eval_fwd(x, kernel, bias, gamma, beta, mean, var, c_in,
                          c_out, interpret, compute_dtype)
    return pooled


def _eval_fwd(x, kernel, bias, gamma, beta, mean, var, c_in, c_out,
              interpret, cdtype):
    b = x.shape[0]
    conv_out, _ = _fwd_shared(x, kernel, bias, c_in, c_out, interpret, cdtype)
    mean32 = mean.astype(jnp.float32)
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + _EPS)
    ga = gamma.astype(jnp.float32) * inv
    conv4 = conv_out.reshape(b, HP, 2 * W, c_out)
    pooled = _run_k2(conv4, _rep_row(ga),
                     _rep_row(beta.astype(jnp.float32) - mean32 * ga),
                     b, c_out, cdtype, interpret)
    res = (x.reshape(b, N, c_in), conv_out, kernel, gamma, beta,
           mean32, var.astype(jnp.float32))
    return pooled, res


def _eval_bwd(c_in, c_out, interpret, cdtype, res, d_pooled):
    dx2, dk, db, dbeta, dgamma = _core_bwd(
        res, d_pooled, False, c_in, c_out, interpret, cdtype, None)
    x_shaped = dx2.reshape(dx2.shape[0], H, W, c_in)
    mean_z = jnp.zeros_like(res[5])
    var_z = jnp.zeros_like(res[6])
    return (x_shaped, dk, db, dgamma, dbeta, mean_z, var_z)


fused_block2_eval.defvjp(_eval_fwd, _eval_bwd)

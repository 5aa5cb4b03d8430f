"""Fused Pallas TPU kernels for the first conv block of the workhorse model.

Profiling the bf16 scanned training epoch on v5e (docs/ARCHITECTURE.md,
2026-08-17) showed the FIRST conv block — conv 5x5 1->32 on (B, 200, 128),
BatchNorm, ReLU, 2x2 max-pool, and XLA's layout copies around reduce-window /
select-and-scatter — costing ~75% of the whole epoch.  These kernels fuse
that block, forward and backward, keeping the (B, 200, 128, 32) activation
out of every XLA layout negotiation:

  forward  K1: conv as ONE banded MXU GEMM  (200,640)@(640,4096) per item
               + per-column BN moment partials accumulated across the grid
           K2: BN-apply + ReLU + 2x2 first-max pool (rolls + 0/1-matrix
               compaction GEMMs), emitting NHWC (B, 100, 64, 32)
  backward K3: recompute post-BN activations, route the pooled cotangent to
               the FIRST max of each window (select-and-scatter semantics),
               ReLU mask, BN-reduction partials
           K4: finalize the BN backward, band-extract dW, accumulate db
           K5: dx via the transposed banded GEMM — a SEPARATE pallas call so
               XLA dead-code-eliminates it when x is training data (grads
               are only taken w.r.t. parameters); it runs only for upstream
               trainable inputs (the cloak noise path)

The banded-matrix trick: a 5-tap conv along the 128-lane frequency axis is a
GEMM against a (640, C*128) block-banded matrix M built from the kernel
(M[dh*128+wi, c*128+wo] = k[dh, wi-wo+2, 0, c]); the five H-taps become five
sublane rolls concatenated at 128-aligned lane offsets.  SAME zero padding
falls out of the band clipping and the roll edge masks.  All heavy math is
MXU bf16 with f32 accumulation — the same numerics class as the XLA
``dtype=bfloat16`` compute mode it replaces.  ReLU-tie subtlety: gradients at
exactly-zero pre-activations take the 0 branch (jnp.maximum ties give 0.5 in
XLA) — measure-zero on real data, asserted within tolerance by tests.

Reference behavior being fused: conv/BN/ReLU/pool of
/root/reference/model/baseline_models.py:171-189 (the ``two_d_cnn_lstm``
conv1 block), as re-implemented by models/backbone.py::_conv_block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_block1_train", "fused_block1_eval", "block1_reference"]

H, W = 200, 128  # fixed window geometry (win_len, feature_len)
HP, WP = H // 2, W // 2
_EPS = 1e-5  # flax BatchNorm default


# ---------------------------------------------------------------------------
# host-side 0/1 constants


@functools.lru_cache(maxsize=None)
def _band_selectors():
    """E (5, W, W): E[dw, wi, wo] = 1 iff wi == wo + dw - 2."""
    wi = np.arange(W)[:, None]
    wo = np.arange(W)[None, :]
    return np.stack([(wi == wo + dw - 2) for dw in range(5)]).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _row_even_selector():
    return (2 * np.arange(HP)[:, None] == np.arange(H)[None, :]).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _row_replicator():
    return (np.arange(H)[:, None] // 2 == np.arange(HP)[None, :]).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _lane_even_selector():
    return (np.arange(W)[:, None] == 2 * np.arange(WP)[None, :]).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _lane_replicator():
    return (np.arange(WP)[:, None] == np.arange(W)[None, :] // 2).astype(np.float32)


def _build_m(kernel: jax.Array, c_out: int) -> jax.Array:
    """(5,5,1,C) conv kernel -> (5W, C*W) block-banded GEMM matrix."""
    e = jnp.asarray(_band_selectors())  # (5, W, W)
    k = kernel[:, :, 0, :]  # (5, 5, C)
    m = jnp.einsum("awo,dac->dwco", e, k)  # (5, W, C, W)
    return m.reshape(5 * W, c_out * W)


def _rep_lanes(v: jax.Array) -> jax.Array:
    """(C,) per-channel vector -> (1, C*W) per-column row."""
    return jnp.repeat(v.astype(jnp.float32), W)[None, :]


def _fold_lanes(row: jax.Array, c_out: int) -> jax.Array:
    """(k, C*W) per-column sums -> (k, C) per-channel sums."""
    return row.reshape(row.shape[0], c_out, W).sum(-1)


# ---------------------------------------------------------------------------
# kernels


def _shift_concat(x2d, cdtype):
    """(H, W) -> (H, 5W): five H-rolls with edge masking, lane-concat."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    parts = []
    for dh in range(-2, 3):
        xs = x2d if dh == 0 else jnp.roll(x2d, -dh, axis=0)
        valid = (rows + dh >= 0) & (rows + dh < H)
        parts.append(jnp.where(valid, xs, 0).astype(cdtype))
    return jnp.concatenate(parts, axis=1)


def _k1_conv_stats(x_ref, m_ref, bias_ref, conv_ref, stats_ref, *, cdtype):
    b = pl.program_id(0)
    x = x_ref[0].astype(cdtype)  # (H, W)
    x5 = _shift_concat(x, cdtype)  # (H, 5W)
    y = jnp.dot(x5, m_ref[:, :], preferred_element_type=jnp.float32)
    y = y + bias_ref[0, :][None, :]  # (H, CW)
    y_st = y.astype(conv_ref.dtype)
    conv_ref[0] = y_st
    # moments of the STORED (rounded) activation, matching the XLA path where
    # BN sees the bf16 conv output
    yr = y_st.astype(jnp.float32)
    s = jnp.sum(yr, axis=0, keepdims=True)
    ss = jnp.sum(yr * yr, axis=0, keepdims=True)
    sb = jnp.concatenate([s, ss], axis=0)  # (2, CW)

    @pl.when(b == 0)
    def _():
        stats_ref[:, :] = sb

    @pl.when(b > 0)
    def _():
        stats_ref[:, :] = stats_ref[:, :] + sb


def _pool_first_max(z, rsel_ref, lsel_ref, cdtype, c_out):
    """(H, CW) post-BN-relu (cdtype) -> pooled (HP, C, WP) f32, 2x2 max."""
    hmax = jnp.maximum(z, jnp.roll(z, -1, axis=0))
    ev = jnp.dot(rsel_ref[:, :].astype(cdtype), hmax,
                 preferred_element_type=jnp.float32)  # (HP, CW)
    wmax = jnp.maximum(ev, jnp.roll(ev, -1, axis=1))
    blocks = wmax.astype(cdtype).reshape(HP, c_out, W)
    return jnp.dot(blocks, lsel_ref[:, :].astype(cdtype),
                   preferred_element_type=jnp.float32)  # (HP, C, WP)


def _k2_norm_pool(conv_ref, a_ref, b2_ref, rsel_ref, lsel_ref, out_ref, *,
                  cdtype, c_out):
    y = conv_ref[0].astype(jnp.float32)
    z = jnp.maximum(y * a_ref[0, :][None, :] + b2_ref[0, :][None, :], 0.0)
    pooled = _pool_first_max(z.astype(cdtype), rsel_ref, lsel_ref, cdtype,
                             c_out)
    # pooled maxes are cdtype values carried exactly through the 0/1 GEMMs,
    # so the cast back is lossless
    out_ref[0] = jnp.swapaxes(pooled, 1, 2).astype(out_ref.dtype)


def _k3_route(conv_ref, dpool_ref, a_ref, b2_ref, mean_ref, inv_ref,
              rsel_ref, lsel_ref, rrep_ref, lrep_ref, dy_ref, red_ref, *,
              cdtype, c_out):
    b = pl.program_id(0)
    y = conv_ref[0].astype(jnp.float32)
    bn = y * a_ref[0, :][None, :] + b2_ref[0, :][None, :]
    z = jnp.maximum(bn, 0.0).astype(cdtype)
    pooled = _pool_first_max(z, rsel_ref, lsel_ref, cdtype, c_out)

    def up(p):  # (HP, C, WP) f32 -> (H, CW) f32 replication
        lanes = jnp.dot(p.astype(cdtype), lrep_ref[:, :].astype(cdtype),
                        preferred_element_type=jnp.float32)  # (HP, C, W)
        flat = lanes.reshape(HP, c_out * W).astype(cdtype)
        return jnp.dot(rrep_ref[:, :].astype(cdtype), flat,
                       preferred_element_type=jnp.float32)  # (H, CW)

    m_up = up(pooled)
    dpo = jnp.swapaxes(dpool_ref[0].astype(jnp.float32), 1, 2)  # (HP, C, WP)
    d_up = up(dpo)

    # first-max routing: the pooling compared cdtype values accumulated to
    # f32 through 0/1 GEMMs, so equality against the replicated max is exact
    eq = (z.astype(jnp.float32) == m_up).astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, c_out * W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, c_out * W), 1)
    even_h = (rows % 2 == 0).astype(jnp.float32)
    even_w = (cols % 2 == 0).astype(jnp.float32)
    am = eq * even_h * even_w
    bm = eq * even_h * (1.0 - even_w)
    cm = eq * (1.0 - even_h) * even_w
    dm = eq * (1.0 - even_h) * (1.0 - even_w)
    rw = lambda t, s: jnp.roll(t, s, axis=1)  # noqa: E731
    rh = lambda t, s: jnp.roll(t, s, axis=0)  # noqa: E731
    sel = am
    sel = sel + bm * (1.0 - rw(am, 1))
    sel = sel + cm * (1.0 - rh(am, 1)) * (1.0 - rh(rw(bm, -1), 1))
    sel = sel + dm * (1.0 - rh(rw(am, 1), 1)) * (1.0 - rh(bm, 1)) * (
        1.0 - rw(cm, 1))
    relu_g = (bn > 0.0).astype(jnp.float32)
    dy = d_up * sel * relu_g  # (H, CW)
    dy_ref[0] = dy.astype(dy_ref.dtype)

    xhat = (y - mean_ref[0, :][None, :]) * inv_ref[0, :][None, :]
    s1 = jnp.sum(dy, axis=0, keepdims=True)
    s2 = jnp.sum(dy * xhat, axis=0, keepdims=True)
    sb = jnp.concatenate([s1, s2], axis=0)

    @pl.when(b == 0)
    def _():
        red_ref[:, :] = sb

    @pl.when(b > 0)
    def _():
        red_ref[:, :] = red_ref[:, :] + sb


def _dconv(conv_ref, dy_ref, ga_ref, mean_ref, inv_ref, m1_ref, m2_ref):
    """Recompute the pre-BN cotangent from saved tensors (VPU)."""
    y = conv_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    xhat = (y - mean_ref[0, :][None, :]) * inv_ref[0, :][None, :]
    return ga_ref[0, :][None, :] * (
        dy - m1_ref[0, :][None, :] - xhat * m2_ref[0, :][None, :])


def _k4_grads(x_ref, conv_ref, dy_ref, ga_ref, mean_ref, inv_ref, m1_ref,
              m2_ref, dw_ref, db_ref, *, cdtype, c_out):
    b = pl.program_id(0)
    dconv = _dconv(conv_ref, dy_ref, ga_ref, mean_ref, inv_ref, m1_ref,
                   m2_ref)
    dconv_c = dconv.astype(cdtype)

    x = x_ref[0].astype(cdtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    wi = jax.lax.broadcasted_iota(jnp.int32, (W, 1, W), 0)
    wo = jax.lax.broadcasted_iota(jnp.int32, (W, 1, W), 2)
    taps = []
    for dh in range(-2, 3):
        xs = x if dh == 0 else jnp.roll(x, -dh, axis=0)
        valid = (rows + dh >= 0) & (rows + dh < H)
        xs = jnp.where(valid, xs, 0).astype(cdtype)
        g = jax.lax.dot_general(
            xs, dconv_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (W, CW): [w_in, c*W + w_out]
        g5 = g.reshape(W, c_out, W)
        for dw in range(-2, 3):
            mask = (wi == wo + dw).astype(jnp.float32)
            taps.append(jnp.sum(g5 * mask, axis=(0, 2))[None, :])
    dw_b = jnp.concatenate(taps, axis=0)  # (25, C)
    db_b = jnp.sum(dconv, axis=0, keepdims=True)  # (1, CW)

    @pl.when(b == 0)
    def _():
        dw_ref[:, :] = dw_b
        db_ref[:, :] = db_b

    @pl.when(b > 0)
    def _():
        dw_ref[:, :] = dw_ref[:, :] + dw_b
        db_ref[:, :] = db_ref[:, :] + db_b


def _k5_dx(conv_ref, dy_ref, m_ref, ga_ref, mean_ref, inv_ref, m1_ref,
           m2_ref, dx_ref, *, cdtype, c_out):
    dconv_c = _dconv(conv_ref, dy_ref, ga_ref, mean_ref, inv_ref, m1_ref,
                     m2_ref).astype(cdtype)
    dx5 = jax.lax.dot_general(
        dconv_c, m_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, 5W) = dconv @ M^T
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    acc = jnp.zeros((H, W), jnp.float32)
    for i, dh in enumerate(range(-2, 3)):
        blk = dx5[:, i * W:(i + 1) * W]
        # forward read x[h+dh] into output row h: contribution lands at h+dh
        blk = blk if dh == 0 else jnp.roll(blk, dh, axis=0)
        valid = (rows - dh >= 0) & (rows - dh < H)
        acc = acc + jnp.where(valid, blk, 0)
    dx_ref[0] = acc


# ---------------------------------------------------------------------------
# pallas_call plumbing


def _vmem(block, index_map):
    return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)


def _full(shape):
    return _vmem(shape, lambda b: tuple(0 for _ in shape))


def _per_item(shape):
    return _vmem((1,) + shape, lambda b: (b,) + tuple(0 for _ in shape))


def _grid_call(kernel, in_specs, outs, b, interpret, **kw):
    return pl.pallas_call(
        functools.partial(kernel, **kw),
        grid=(b,),
        in_specs=in_specs,
        out_specs=[o[0] for o in outs],
        out_shape=[o[1] for o in outs],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the backward routing kernel keeps ~26 MB of (200, 4096) f32
            # temporaries live; the default 16 MB scoped-vmem stack is too
            # small (v5e VMEM is 128 MB)
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def _run_k1(x2, m, bias_row, b, c_out, cdtype, interpret):
    return _grid_call(
        _k1_conv_stats,
        [_per_item((H, W)), _full((5 * W, c_out * W)), _full((1, c_out * W))],
        [
            (_per_item((H, c_out * W)),
             jax.ShapeDtypeStruct((b, H, c_out * W), cdtype)),
            (_full((2, c_out * W)),
             jax.ShapeDtypeStruct((2, c_out * W), jnp.float32)),
        ],
        b, interpret, cdtype=cdtype,
    )(x2, m, bias_row)


def _run_k2(conv_out, a_row, b2_row, b, c_out, cdtype, interpret):
    return _grid_call(
        _k2_norm_pool,
        [_per_item((H, c_out * W)), _full((1, c_out * W)),
         _full((1, c_out * W)), _full((HP, H)), _full((W, WP))],
        [(_per_item((HP, WP, c_out)),
          jax.ShapeDtypeStruct((b, HP, WP, c_out), cdtype))],
        b, interpret, cdtype=cdtype, c_out=c_out,
    )(conv_out, a_row, b2_row,
      jnp.asarray(_row_even_selector()), jnp.asarray(_lane_even_selector()))[0]


def _core_bwd(res, d_pooled, train, c_out, interpret, cdtype, axis_name):
    """Shared backward: returns (dx_fn, dk, db, dgamma, dbeta)."""
    x2, conv_out, kernel, gamma, beta, mean, var = res
    b = x2.shape[0]
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + _EPS)
    ga = gamma.astype(jnp.float32) * inv
    a_row = _rep_lanes(ga)
    b2_row = _rep_lanes(beta.astype(jnp.float32) - mean * ga)
    mean_row = _rep_lanes(mean)
    inv_row = _rep_lanes(inv)

    dy, red = _grid_call(
        _k3_route,
        [_per_item((H, c_out * W)), _per_item((HP, WP, c_out)),
         _full((1, c_out * W)), _full((1, c_out * W)),
         _full((1, c_out * W)), _full((1, c_out * W)),
         _full((HP, H)), _full((W, WP)), _full((H, HP)), _full((WP, W))],
        [
            (_per_item((H, c_out * W)),
             jax.ShapeDtypeStruct((b, H, c_out * W), cdtype)),
            (_full((2, c_out * W)),
             jax.ShapeDtypeStruct((2, c_out * W), jnp.float32)),
        ],
        b, interpret, cdtype=cdtype, c_out=c_out,
    )(conv_out, d_pooled, a_row, b2_row, mean_row, inv_row,
      jnp.asarray(_row_even_selector()), jnp.asarray(_lane_even_selector()),
      jnp.asarray(_row_replicator()), jnp.asarray(_lane_replicator()))

    folded = _fold_lanes(red, c_out)  # (2, C): [sum dy, sum dy*xhat]
    dbeta = folded[0]
    dgamma = folded[1]

    if train:
        n = b * H * W
        m1 = folded[0] / n
        m2 = folded[1] / n
        if axis_name is not None:
            m1 = jax.lax.pmean(m1, axis_name)
            m2 = jax.lax.pmean(m2, axis_name)
    else:
        m1 = jnp.zeros_like(dbeta)
        m2 = jnp.zeros_like(dgamma)
    ga_row = a_row
    m1_row = _rep_lanes(m1)
    m2_row = _rep_lanes(m2)

    dw25, db_row = _grid_call(
        _k4_grads,
        [_per_item((H, W)), _per_item((H, c_out * W)),
         _per_item((H, c_out * W)),
         _full((1, c_out * W)), _full((1, c_out * W)),
         _full((1, c_out * W)), _full((1, c_out * W)),
         _full((1, c_out * W))],
        [
            (_full((25, c_out)), jax.ShapeDtypeStruct((25, c_out), jnp.float32)),
            (_full((1, c_out * W)),
             jax.ShapeDtypeStruct((1, c_out * W), jnp.float32)),
        ],
        b, interpret, cdtype=cdtype, c_out=c_out,
    )(x2, conv_out, dy, ga_row, mean_row, inv_row, m1_row, m2_row)

    dk = dw25.reshape(5, 5, 1, c_out).astype(kernel.dtype)
    db = _fold_lanes(db_row, c_out)[0]

    # dx in its own pallas call: DCE'd entirely when the caller does not use
    # the cotangent w.r.t. x (the baseline training epoch)
    m = _build_m(kernel, c_out).astype(cdtype)
    dx2 = _grid_call(
        _k5_dx,
        [_per_item((H, c_out * W)), _per_item((H, c_out * W)),
         _full((5 * W, c_out * W)),
         _full((1, c_out * W)), _full((1, c_out * W)),
         _full((1, c_out * W)), _full((1, c_out * W)),
         _full((1, c_out * W))],
        [(_per_item((H, W)), jax.ShapeDtypeStruct((b, H, W), jnp.float32))],
        b, interpret, cdtype=cdtype, c_out=c_out,
    )(conv_out, dy, m, ga_row, mean_row, inv_row, m1_row, m2_row)[0]

    return dx2, dk, db, dgamma, dbeta


def _fwd_core(x, kernel, bias, gamma, beta, mean, var, c_out, interpret,
              cdtype):
    b = x.shape[0]
    x2 = x.reshape(b, H, W).astype(jnp.float32)
    m = _build_m(kernel, c_out).astype(cdtype)
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + _EPS)
    ga = gamma.astype(jnp.float32) * inv
    conv_out, col_stats = _run_k1(x2, m, _rep_lanes(bias), b, c_out, cdtype,
                                  interpret)
    pooled = _run_k2(conv_out, _rep_lanes(ga),
                     _rep_lanes(beta.astype(jnp.float32) - mean * ga),
                     b, c_out, cdtype, interpret)
    return pooled, conv_out, col_stats, x2


# ---------------------------------------------------------------------------
# public primitives


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_block1_train(x, kernel, bias, gamma, beta, c_out=32,
                       interpret=False, compute_dtype=jnp.bfloat16,
                       axis_name=None):
    """Training-mode fused block: batch-stat BN.  (B,200,128,1)->(pooled,
    mean, var) with pooled NHWC (B,100,64,C).

    The custom VJP implements the full batch-statistics BatchNorm backward
    (the -mean(dy) - xhat*mean(dy*xhat) terms), so gradients w.r.t. every
    input including ``x`` match autodiff through the unfused ops.  With
    ``axis_name`` the moments (and their backward means) are synchronized
    over the mesh axis — the sync-BN contract of
    parallel/epoch_dp (models/backbone.py ``bn_axis_name``).
    Cotangents of the returned (mean, var) are ignored: they feed only the
    non-differentiated running-average update, as in flax BatchNorm.
    """
    out, _ = _train_fwd(x, kernel, bias, gamma, beta, c_out, interpret,
                        compute_dtype, axis_name)
    return out


def _train_fwd(x, kernel, bias, gamma, beta, c_out, interpret, cdtype,
               axis_name):
    b = x.shape[0]
    x2 = x.reshape(b, H, W).astype(jnp.float32)
    m = _build_m(kernel, c_out).astype(cdtype)
    conv_out, col_stats = _run_k1(x2, m, _rep_lanes(bias), b, c_out, cdtype,
                                  interpret)
    n = b * H * W
    s = _fold_lanes(col_stats, c_out)
    mean = s[0] / n
    msq = s[1] / n
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        msq = jax.lax.pmean(msq, axis_name)
    var = jnp.maximum(msq - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + _EPS)
    ga = gamma.astype(jnp.float32) * inv
    pooled = _run_k2(conv_out, _rep_lanes(ga),
                     _rep_lanes(beta.astype(jnp.float32) - mean * ga),
                     b, c_out, cdtype, interpret)
    res = (x2, conv_out, kernel, gamma, beta, mean, var)
    return (pooled, mean, var), res


def _train_bwd(c_out, interpret, cdtype, axis_name, res, cts):
    d_pooled, _d_mean, _d_var = cts  # mean/var cotangents: running stats only
    dx2, dk, db, dgamma, dbeta = _core_bwd(
        res, d_pooled, True, c_out, interpret, cdtype, axis_name)
    x_shaped = dx2.reshape(dx2.shape[0], H, W, 1)
    return (x_shaped, dk, db, dgamma, dbeta)


fused_block1_train.defvjp(_train_fwd, _train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_block1_eval(x, kernel, bias, gamma, beta, mean, var, c_out=32,
                      interpret=False, compute_dtype=jnp.bfloat16):
    """Eval-mode fused block: normalize with the given (running) stats.

    Differentiable w.r.t. x/kernel/bias/gamma/beta (the frozen-backbone
    cloak path takes gradients THROUGH eval-mode BN into upstream noise
    parameters); (mean, var) are treated as constants (zero cotangents),
    matching flax's non-differentiated running statistics.
    """
    pooled, _, _, _ = _fwd_core(x, kernel, bias, gamma, beta, mean, var,
                                c_out, interpret, compute_dtype)
    return pooled


def _eval_fwd(x, kernel, bias, gamma, beta, mean, var, c_out, interpret,
              cdtype):
    pooled, conv_out, _, x2 = _fwd_core(x, kernel, bias, gamma, beta, mean,
                                        var, c_out, interpret, cdtype)
    res = (x2, conv_out, kernel, gamma, beta,
           mean.astype(jnp.float32), var.astype(jnp.float32))
    return pooled, res


def _eval_bwd(c_out, interpret, cdtype, res, d_pooled):
    dx2, dk, db, dgamma, dbeta = _core_bwd(
        res, d_pooled, False, c_out, interpret, cdtype, None)
    x_shaped = dx2.reshape(dx2.shape[0], H, W, 1)
    mean_z = jnp.zeros_like(res[5])
    var_z = jnp.zeros_like(res[6])
    return (x_shaped, dk, db, dgamma, dbeta, mean_z, var_z)


fused_block1_eval.defvjp(_eval_fwd, _eval_bwd)


# ---------------------------------------------------------------------------
# oracle


def block1_reference(x, kernel, bias, gamma, beta, mean, var):
    """Pure-jnp oracle: conv+BN(given stats)+relu+maxpool, NHWC f32."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), kernel.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias[None, None, None, :]
    inv = jax.lax.rsqrt(var + _EPS)
    z = jax.nn.relu((y - mean) * inv * gamma + beta)
    return jax.lax.reduce_window(
        z, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

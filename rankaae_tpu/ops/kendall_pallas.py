"""Fused Pallas TPU kernel for the Kendall rank-correlation constraint.

The XLA fallback (``rankaae_tpu.ops.kendall``) materializes the (B, B, K)
pair tensor when ``activate=True`` — at batch 1024, K=5 that is ~21 MB of
HBM traffic per trial per step, x8 vmapped trials.  This kernel tiles the
pairwise computation over row blocks held in VMEM and never materializes the
pair tensor: one pass produces the four per-descriptor reductions
(sum/count of concordant and discordant products), and the custom-VJP
backward recomputes the weighted row sums in the same tiled fashion.

Math (reference ``sc/utils/functions.py:37-79``):

    t[i,j,k] = sign(d[i,k] - d[j,k]);  p[i,j,k] = s[i,k] - s[j,k]
    loss = -(1/norm) * sum_ijk w[i,j,k] * p[i,j,k] * t[i,j,k]
    w = 1, or (activate) n_opp/max(n_same, n_opp) on concordant pairs

    dL/ds[a,k] = -(2/norm) * sum_j w[a,j,k] * t[a,j,k]
    (by antisymmetry of both t and p in (i,j); w is symmetric in (i,j))

Layout: inputs are passed in BOTH (B, K) and (K, B) layouts (transposed on
the XLA side, ~20 KB each) so the kernel reads row blocks as (TB, 1) and
column vectors as (1, B) without any in-kernel lane<->sublane transposes.
Ragged batches are zero-padded to the block size and masked out inside the
kernels via the true-batch scalar (validation splits are rarely multiples
of 256).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rankaae_tpu.ops.kendall import activation_weights

_TB = 256  # row-block size (sublane dim of the (TB, B) pair tile)
_INTERPRET = False  # flipped by tests to run the kernels on CPU


def _onehot_col(block, k, n_col):
    """Extract column k of a (R, K) block as (R, 1) without dynamic lane
    indexing (unsupported strided load): one-hot mask + lane reduce."""
    mask = jax.lax.broadcasted_iota(jnp.int32, (1, n_col), 1) == k
    return jnp.sum(jnp.where(mask, block, 0.0), axis=1, keepdims=True)


def _fwd_kernel(n_ref, d_bk_ref, dt_ref, s_bk_ref, st_ref, sums_ref, cnts_ref):
    """grid = (K, n_blocks): partial reductions for descriptor k, row block ib.

    d_bk/s_bk: (B_pad, K); dt/st: (K, B_pad); n_ref: (1,) SMEM true batch
    size (padded rows/cols are masked out).  sums/cnts: (K, 2) SMEM
    accumulators — [:, 0] = concordant (product > 0), [:, 1] = discordant.
    """
    k = pl.program_id(0)
    ib = pl.program_id(1)
    n = n_ref[0]

    n_col = d_bk_ref.shape[1]
    b_pad = dt_ref.shape[1]
    d_cols = dt_ref[pl.ds(k, 1), :]                       # (1, B_pad)
    s_cols = st_ref[pl.ds(k, 1), :]
    d_rows = _onehot_col(d_bk_ref[pl.ds(ib * _TB, _TB), :], k, n_col)  # (TB, 1)
    s_rows = _onehot_col(s_bk_ref[pl.ds(ib * _TB, _TB), :], k, n_col)

    target = jnp.sign(d_rows - d_cols)                    # (TB, B_pad)
    pred = s_rows - s_cols
    product = pred * target
    row_ids = ib * _TB + jax.lax.broadcasted_iota(jnp.int32, (_TB, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, b_pad), 1)
    valid = (row_ids < n) & (col_ids < n)
    product = jnp.where(valid, product, 0.0)

    pos = product > 0
    neg = product < 0

    @pl.when(ib == 0)
    def _():
        sums_ref[k, 0] = 0.0
        sums_ref[k, 1] = 0.0
        cnts_ref[k, 0] = 0.0
        cnts_ref[k, 1] = 0.0

    sums_ref[k, 0] += jnp.sum(jnp.where(pos, product, 0.0))
    sums_ref[k, 1] += jnp.sum(jnp.where(neg, product, 0.0))
    cnts_ref[k, 0] += jnp.sum(pos.astype(jnp.float32))
    cnts_ref[k, 1] += jnp.sum(neg.astype(jnp.float32))


def _bwd_kernel(n_ref, d_bk_ref, dt_ref, s_bk_ref, st_ref, w_ref, grad_ref):
    """grid = (K, n_blocks): weighted row sums -> per-sample gradient rows.

    grad[a, k] = sum_j w_eff[a,j,k] * t[a,j,k], w_eff = w_k on concordant
    pairs, 1 elsewhere.  The tile is flipped — rows = all B samples
    (sublanes), cols = the TB-sample block (lanes) — so the needed row sums
    land in the lane dimension: by antisymmetry of t (and symmetry of w),
    sum_j w t[a,j] = -sum_i w t[i,a], i.e. minus the tile's column sums.
    Output grad_ref: (K, B); transposed to (B, K) on the XLA side.
    """
    k = pl.program_id(0)
    ib = pl.program_id(1)
    n = n_ref[0]

    n_col = d_bk_ref.shape[1]
    b_pad = d_bk_ref.shape[0]
    d_all = _onehot_col(d_bk_ref[:, :], k, n_col)         # (B_pad, 1)
    s_all = _onehot_col(s_bk_ref[:, :], k, n_col)
    d_blk = dt_ref[pl.ds(k, 1), pl.ds(ib * _TB, _TB)]     # (1, TB)
    s_blk = st_ref[pl.ds(k, 1), pl.ds(ib * _TB, _TB)]
    w_k = w_ref[k, 0]

    target = jnp.sign(d_all - d_blk)                      # (B_pad, TB)
    pred = s_all - s_blk
    # exactly-tied pairs (pred*target == 0) keep weight 1: the reference
    # scales only the product>0 entries in place (functions.py:69-76), so
    # torch autograd propagates the unscaled t through ties
    concordant = (pred * target) > 0
    weighted_t = jnp.where(concordant, w_k * target, target)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b_pad, 1), 0)
    col_ids = ib * _TB + jax.lax.broadcasted_iota(jnp.int32, (1, _TB), 1)
    valid = (row_ids < n) & (col_ids < n)
    weighted_t = jnp.where(valid, weighted_t, 0.0)
    grad_ref[pl.ds(k, 1), pl.ds(ib * _TB, _TB)] = -jnp.sum(
        weighted_t, axis=0, keepdims=True
    )


def _pair_sums_pallas(n, d_bk, d_t, s_bk, s_t):
    k_dim, b = d_t.shape
    n_blocks = b // _TB
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)  # scalar accumulators
    sums, cnts = pl.pallas_call(
        _fwd_kernel,
        grid=(k_dim, n_blocks),
        in_specs=[smem, vmem, vmem, vmem, vmem],
        out_specs=(smem, smem),
        out_shape=(
            jax.ShapeDtypeStruct((k_dim, 2), jnp.float32),
            jax.ShapeDtypeStruct((k_dim, 2), jnp.float32),
        ),
        interpret=_INTERPRET,
    )(jnp.asarray([n], jnp.int32), d_bk, d_t, s_bk, s_t)
    return sums, cnts


def _grad_rows_pallas(n, d_bk, d_t, s_bk, s_t, w):
    k_dim, b = d_t.shape
    n_blocks = b // _TB
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    grad_kb = pl.pallas_call(
        _bwd_kernel,
        grid=(k_dim, n_blocks),
        in_specs=[smem, vmem, vmem, vmem, vmem, smem],
        out_specs=vmem,
        out_shape=jax.ShapeDtypeStruct((k_dim, b), jnp.float32),
        interpret=_INTERPRET,
    )(jnp.asarray([n], jnp.int32), d_bk, d_t, s_bk, s_t, w.reshape(k_dim, 1))
    return jnp.swapaxes(grad_kb, 0, 1)


def _prepare(descriptors, styles):
    """Zero-pad to a block multiple; padded rows/cols are masked out inside
    the kernels via the true-batch scalar."""
    b, k = styles.shape
    b_pad = -(-b // _TB) * _TB
    d_bk = descriptors.astype(jnp.float32)
    s_bk = styles.astype(jnp.float32)
    if b_pad != b:
        pad = ((0, b_pad - b), (0, 0))
        d_bk = jnp.pad(d_bk, pad)
        s_bk = jnp.pad(s_bk, pad)
    return d_bk, jnp.swapaxes(d_bk, 0, 1), s_bk, jnp.swapaxes(s_bk, 0, 1), b, k


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def kendall_constraint_pallas(descriptors, styles, activate: bool = False):
    """Fused-kernel Kendall loss; numerically equal to
    ``rankaae_tpu.ops.kendall.kendall_constraint``."""
    loss, _ = _kendall_fwd(descriptors, styles, activate)
    return loss


def _kendall_fwd(descriptors, styles, activate):
    d_bk, d_t, s_bk, s_t, b, k = _prepare(descriptors, styles)
    sums, cnts = _pair_sums_pallas(b, d_bk, d_t, s_bk, s_t)
    if activate:
        w = activation_weights(cnts[:, 0], cnts[:, 1])
    else:
        w = jnp.ones((k,), jnp.float32)
    norm = (b * b - b) * k
    loss = -(jnp.sum(w * sums[:, 0]) + jnp.sum(sums[:, 1])) / norm
    return loss, (descriptors, styles, w)


def _kendall_bwd(activate, res, g):
    descriptors, styles, w = res
    d_bk, d_t, s_bk, s_t, b, k = _prepare(descriptors, styles)
    norm = (b * b - b) * k
    rows = _grad_rows_pallas(b, d_bk, d_t, s_bk, s_t, w)[:b]   # (B, K)
    # cotangent in the primal's dtype (styles may be bf16 under
    # activation_dtype=bfloat16; the kernel computes f32 internally)
    grad_styles = (rows * (-2.0 * g / norm)).astype(styles.dtype)
    return jnp.zeros_like(descriptors), grad_styles


kendall_constraint_pallas.defvjp(_kendall_fwd, _kendall_bwd)


def kendall_constraint_auto(descriptors, styles, activate: bool = False):
    """Pick the fused kernel on TPU when the batch fills at least one
    row-block (B >= block size); small batches — e.g. the trailing partial
    batch or tiny validation sets — would pad to a mostly-masked block and
    waste work, so they take the O(B*K) XLA rank-trick path instead."""
    from rankaae_tpu.ops.kendall import kendall_constraint

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if (on_tpu or _INTERPRET) and styles.shape[0] >= _TB:
        return kendall_constraint_pallas(descriptors, styles, activate)
    return kendall_constraint(descriptors, styles, activate=activate)

"""Differentiable Kendall-rank-correlation constraint.

Behavioral spec: reference ``sc/utils/functions.py:37-79``.

For a batch of B samples with K descriptors d and K latent styles s
(descriptor k rank-tied to style k):

    target[i, j, k] = sign(d[i, k] - d[j, k])          in {-1, 0, 1}
    pred[i, j, k]   = s[i, k] - s[j, k]                (raw diff: differentiable)
    product         = pred * target
    loss            = -sum(product) / ((B^2 - B) * K)

With ``activate=True`` ("kendall_activation"), concordant pairs
(product > 0) of descriptor k are down-weighted by
``n_opp_k / max(n_same_k, n_opp_k)`` (counts clamped to >= 1) so the
concordant/discordant classes are balanced per descriptor
(reference functions.py:68-76).  The weights are counts — piecewise
constant — so gradients flow only through ``pred``, as in torch.

Two implementations:

* :func:`kendall_constraint` — pure XLA.  Materializes the (B, B, K) pair
  tensor; at B=1024, K=5 that is ~21 MB f32 per trial — fine in HBM, and XLA
  fuses the elementwise chain into the reduce.
* :func:`kendall_constraint_pallas` — fused Pallas kernel with a custom VJP
  (``rankaae_tpu.ops.kendall_pallas``) that tiles over row-blocks and never
  materializes the pair tensor; used automatically on TPU for large B.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _pair_stats(descriptors, styles):
    """Per-descriptor sums over concordant/discordant pairs.

    Returns (sum_pos, sum_neg, sum_tie, cnt_pos, cnt_neg), each (K,), where
    pos/neg refer to the sign of product = pred * target.  sum_tie is
    identically 0 in value but carries the gradient of the exactly-tied
    pairs (see :func:`kendall_constraint`).
    """
    target = jnp.sign(descriptors[:, None, :] - descriptors[None, :, :])
    pred = styles[:, None, :] - styles[None, :, :]
    product = pred * target
    pos = product > 0
    neg = product < 0
    sum_pos = jnp.sum(jnp.where(pos, product, 0.0), axis=(0, 1))
    sum_neg = jnp.sum(jnp.where(neg, product, 0.0), axis=(0, 1))
    sum_tie = jnp.sum(jnp.where(product == 0, product, 0.0), axis=(0, 1))
    cnt_pos = jnp.sum(pos, axis=(0, 1))
    cnt_neg = jnp.sum(neg, axis=(0, 1))
    return sum_pos, sum_neg, sum_tie, cnt_pos, cnt_neg


def activation_weights(cnt_pos, cnt_neg):
    """Concordant-pair weights n_opp / max(n_same, n_opp), counts clamped to 1
    (reference functions.py:74-76).  Piecewise constant -> treated as stop-grad."""
    n_same = jnp.maximum(cnt_pos, 1)
    n_opp = jnp.maximum(cnt_neg, 1)
    return (n_opp / jnp.maximum(n_same, n_opp)).astype(jnp.float32)


def kendall_constraint(descriptors, styles, activate: bool = False):
    """Pure-XLA Kendall surrogate loss.

    Parameters
    ----------
    descriptors : (B, K) physical descriptor values (constants).
    styles : (B, K) latent styles (differentiated).
    activate : per-descriptor concordant-pair reweighting.
    """
    descriptors = jnp.asarray(descriptors, jnp.float32)
    styles = jnp.asarray(styles, jnp.float32)
    b, k = styles.shape
    norm = (b * b - b) * k
    if not activate:
        # sum_ij (s_i - s_j) * sign(d_i - d_j) = 2 * sum_i s_i * c_i with
        # c_i = sum_j sign(d_i - d_j), by antisymmetry of both factors.
        # O(B^2) only in the constant c (no differentiation through it),
        # O(B*K) in the differentiated part.
        c = jnp.sum(
            jnp.sign(descriptors[:, None, :] - descriptors[None, :, :]), axis=1
        )
        total = 2.0 * jnp.sum(styles * jax.lax.stop_gradient(c))
        return -total / norm
    sum_pos, sum_neg, sum_tie, cnt_pos, cnt_neg = _pair_stats(descriptors, styles)
    w = jax.lax.stop_gradient(activation_weights(cnt_pos, cnt_neg))
    # exactly-tied pairs (product == 0, i.e. equal styles or equal
    # descriptors) add 0 to the loss but DO carry gradient t in the
    # reference: its in-place masked scale touches only product>0 entries
    # (functions.py:69-76), so torch autograd sees the raw p*t term for
    # ties — sum_tie keeps that gradient path alive here
    total = jnp.sum(w * sum_pos + sum_neg + sum_tie)
    return -total / norm

"""On-device statistics: Spearman rank correlation and the Shapiro–Wilk W.

The reference computes these on host with scipy **every epoch** on the full
validation latent (``sc/clustering/trainer.py:286-295``) — a forced
device→host sync per epoch.  Implementing both on device is what lets the
whole training run compile into a single ``lax.scan`` (SURVEY.md §7 hard
part #4).

* :func:`spearman_rho` — ranks via double argsort + Pearson.  The latent
  styles are continuous floats, so tie handling (scipy averages tied ranks)
  is a measure-zero difference.
* :func:`shapiro_w` — Royston's AS R94 approximation (the same algorithm
  scipy.stats.shapiro implements) for n > 5: Blom scores m_i, polynomial
  edge corrections in u = 1/sqrt(n), W = (sum a_i x_(i))^2 / sum (x - mean)^2.
  Agreement with scipy is ~1e-6 for n in the hundreds-to-thousands range.
"""
from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
from jax.scipy.special import ndtri


def spearman_rho(x, y):
    """Spearman rank correlation of two 1-D arrays."""
    rx = jnp.argsort(jnp.argsort(x)).astype(jnp.float32)
    ry = jnp.argsort(jnp.argsort(y)).astype(jnp.float32)
    rx = rx - jnp.mean(rx)
    ry = ry - jnp.mean(ry)
    denom = jnp.sqrt(jnp.sum(rx * rx) * jnp.sum(ry * ry))
    return jnp.sum(rx * ry) / jnp.maximum(denom, 1e-12)


def max_interstyle_spearman(styles):
    """max |spearman(style_i, style_j)| over all style pairs
    (reference ``trainer.py:288-293``).  styles: (N, nstyle)."""
    styles = jnp.asarray(styles, jnp.float32)
    nstyle = styles.shape[1]
    ranks = jnp.argsort(jnp.argsort(styles, axis=0), axis=0).astype(jnp.float32)
    ranks = ranks - jnp.mean(ranks, axis=0, keepdims=True)
    cov = ranks.T @ ranks
    d = jnp.sqrt(jnp.diag(cov))
    corr = cov / jnp.maximum(jnp.outer(d, d), 1e-12)
    mask = jnp.triu(jnp.ones((nstyle, nstyle), bool), k=1)
    return jnp.max(jnp.where(mask, jnp.abs(corr), 0.0))


def shapiro_w(x):
    """Shapiro–Wilk W statistic of a 1-D sample (Royston 1995, AS R94).

    Valid for n > 5 (the reference applies it to validation latents with
    n ~ 1000).  Returns only the statistic — the reference never uses the
    p-value (``trainer.py:287``).
    """
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    xs = jnp.sort(x)
    i = jnp.arange(1, n + 1, dtype=jnp.float32)
    m = ndtri((i - 0.375) / (n + 0.25))
    m_sq = jnp.sum(m * m)
    c = m / jnp.sqrt(m_sq)

    u = 1.0 / jnp.sqrt(jnp.float32(n))
    # Royston's polynomial corrections for the two extreme weights.
    p1 = jnp.array([-2.706056, 4.434685, -2.071190, -0.147981, 0.221157], jnp.float32)
    p2 = jnp.array([-3.582633, 5.682633, -1.752461, -0.293762, 0.042981], jnp.float32)
    upow = jnp.stack([u**5, u**4, u**3, u**2, u])
    a_n = c[-1] + jnp.sum(p1 * upow)
    a_n1 = c[-2] + jnp.sum(p2 * upow)

    phi = (m_sq - 2.0 * m[-1] ** 2 - 2.0 * m[-2] ** 2) / (
        1.0 - 2.0 * a_n**2 - 2.0 * a_n1**2
    )
    a_mid = m / jnp.sqrt(phi)
    a = a_mid.at[-1].set(a_n).at[-2].set(a_n1).at[0].set(-a_n).at[1].set(-a_n1)

    num = jnp.square(jnp.sum(a * xs))
    den = jnp.sum(jnp.square(x - jnp.mean(x)))
    return num / jnp.maximum(den, 1e-30)


def min_style_shapiro(styles):
    """min over style dims of Shapiro–Wilk W (reference ``trainer.py:287,294``)."""
    return jnp.min(jax.vmap(shapiro_w, in_axes=1)(styles))

"""Gradient reversal as a ``jax.custom_vjp``.

Reference: ``sc/clustering/model.py:8-22`` — identity forward; backward
multiplies the cotangent by ``-beta``.  With ``beta=None`` the layer is a
no-op (that branch is resolved at trace time by the callers).

The GRL is what lets the reference train discriminator *and* encoder with a
single backward pass of the adversarial loss (``sc/utils/functions.py:109-132``):
the discriminator sees the true gradient, the encoder sees it sign-flipped
and scaled by the ramping ``alpha``.
"""
import jax
import jax.numpy as jnp


@jax.custom_vjp
def grad_reverse(x, beta):
    """Identity in the forward pass; ``dL/dx = -beta * g`` in the backward."""
    return x


def _fwd(x, beta):
    return x, beta


def _bwd(beta, g):
    return (-g * beta, jnp.zeros_like(beta))


grad_reverse.defvjp(_fwd, _bwd)

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
    # zero-size carrier records the primal dtype (a raw dtype object is not
    # a valid residual)
    return x, (beta, jnp.zeros((0,), x.dtype))


def _bwd(res, g):
    beta, x_proto = res
    # keep the cotangent in the primal's dtype: ``-g * beta`` promotes a
    # bf16 activation cotangent to f32 (beta is an f32 scalar), which breaks
    # cotangent fan-in when the styles tensor feeds multiple losses (the
    # fused protocol) under activation_dtype=bfloat16
    return ((-g * beta).astype(x_proto.dtype), jnp.zeros_like(beta))


grad_reverse.defvjp(_fwd, _bwd)

"""Pallas fused Kendall kernel vs the XLA implementation.

On the CPU test mesh the kernels run in Pallas interpret mode; the same
tests were validated compiled on the real TPU chip (loss parity ~1e-6,
grad parity ~1e-7; the kernel is ~10% faster than the fused-XLA version at
the production shape B=1024, K=5, vmap(8 trials))."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import rankaae_tpu.ops.kendall_pallas as kp
from rankaae_tpu.ops.kendall import kendall_constraint


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(kp, "_INTERPRET", True)


@pytest.mark.parametrize("activate", [False, True])
@pytest.mark.parametrize("b", [256, 1024])
def test_pallas_matches_xla(rng, activate, b):
    k = 5
    d = rng.normal(size=(b, k)).astype(np.float32)
    d[:, 1] = rng.choice([4.0, 5.0, 6.0], b)  # discrete CN -> sign ties
    s = rng.normal(size=(b, k)).astype(np.float32)

    f_ref = lambda s_: kendall_constraint(jnp.asarray(d), s_, activate=activate)
    f_pl = lambda s_: kp.kendall_constraint_pallas(jnp.asarray(d), s_, activate)
    l1, g1 = jax.value_and_grad(f_ref)(jnp.asarray(s))
    l2, g2 = jax.value_and_grad(f_pl)(jnp.asarray(s))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_pallas_under_vmap(rng):
    """The production shape: vmapped over the trial axis."""
    b, k, t = 256, 5, 4
    d = rng.normal(size=(t, b, k)).astype(np.float32)
    s = rng.normal(size=(t, b, k)).astype(np.float32)
    f = jax.vmap(
        jax.value_and_grad(
            lambda dd, ss: kp.kendall_constraint_pallas(dd, ss, True), argnums=1
        )
    )
    losses, grads = f(jnp.asarray(d), jnp.asarray(s))
    ref = [
        jax.value_and_grad(
            lambda ss: kendall_constraint(jnp.asarray(d[i]), ss, activate=True)
        )(jnp.asarray(s[i]))
        for i in range(t)
    ]
    np.testing.assert_allclose(np.asarray(losses), [float(r[0]) for r in ref],
                               rtol=1e-4, atol=1e-6)
    for i in range(t):
        np.testing.assert_allclose(np.asarray(grads[i]), np.asarray(ref[i][1]),
                                   atol=1e-6)


@pytest.mark.parametrize("b", [100, 300, 1050])
def test_ragged_batch_matches_xla(rng, b):
    """Ragged batches (validation splits) are padded + masked in-kernel."""
    k = 5
    d = rng.normal(size=(b, k)).astype(np.float32)
    d[:, 1] = rng.choice([4.0, 5.0, 6.0], b)
    s = rng.normal(size=(b, k)).astype(np.float32)
    for act in (False, True):
        f_ref = lambda s_: kendall_constraint(jnp.asarray(d), s_, activate=act)
        f_pl = lambda s_: kp.kendall_constraint_pallas(jnp.asarray(d), s_, act)
        l1, g1 = jax.value_and_grad(f_ref)(jnp.asarray(s))
        l2, g2 = jax.value_and_grad(f_pl)(jnp.asarray(s))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_auto_dispatch_uses_kernel_on_ragged(rng):
    """auto() routes ragged batches >= one row block through the masked
    kernel."""
    b, k = 300, 5
    d = jnp.asarray(rng.normal(size=(b, k)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(b, k)).astype(np.float32))
    out = kp.kendall_constraint_auto(d, s, activate=True)
    ref = kendall_constraint(d, s, activate=True)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-4, atol=1e-7)


def test_auto_dispatch_small_batch_takes_xla_path(rng, monkeypatch):
    """Batches below one row block (e.g. the trailing partial batch or tiny
    validation sets) must NOT pad into the kernel — they take the O(B*K)
    XLA path (round-1 advisor finding)."""
    def boom(*a, **kw):
        raise AssertionError("pallas kernel must not run for B < block size")

    monkeypatch.setattr(kp, "kendall_constraint_pallas", boom)
    b, k = 64, 5
    assert b < kp._TB
    d = jnp.asarray(rng.normal(size=(b, k)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(b, k)).astype(np.float32))
    out = kp.kendall_constraint_auto(d, s, activate=True)
    ref = kendall_constraint(d, s, activate=True)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-6)

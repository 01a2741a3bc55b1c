"""Optimizer parity vs torch / torch_optimizer formulas, and plateau semantics
vs torch ReduceLROnPlateau."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from rankaae_tpu.optim.optimizers import make_adam, make_adamw, make_radam, make_adabound
from rankaae_tpu.optim.plateau import plateau_init, plateau_update


def _run_ours(opt, params0, grads_seq, lr):
    params = jax.tree_util.tree_map(jnp.asarray, params0)
    state = opt.init(params)
    for g in grads_seq:
        g = jax.tree_util.tree_map(jnp.asarray, g)
        params, state = opt.update(g, state, params, jnp.float32(lr))
    return jax.tree_util.tree_map(np.asarray, params)


def _run_torch(opt_cls, params0, grads_seq, **kw):
    p = torch.tensor(np.asarray(params0["w"]), requires_grad=True)
    opt = opt_cls([p], **kw)
    for g in grads_seq:
        opt.zero_grad()
        p.grad = torch.tensor(np.asarray(g["w"]))
        opt.step()
    return {"w": p.detach().numpy()}


@pytest.mark.parametrize("wd", [0.0, 0.01])
def test_adam_matches_torch(rng, wd):
    params0 = {"w": rng.normal(size=(5, 4)).astype(np.float32)}
    grads = [{"w": rng.normal(size=(5, 4)).astype(np.float32)} for _ in range(10)]
    ours = _run_ours(make_adam(weight_decay=wd), params0, grads, 1e-2)
    theirs = _run_torch(torch.optim.Adam, params0, grads, lr=1e-2, weight_decay=wd)
    np.testing.assert_allclose(ours["w"], theirs["w"], atol=1e-6)


@pytest.mark.parametrize("wd", [0.0, 0.01])
def test_adamw_matches_torch(rng, wd):
    params0 = {"w": rng.normal(size=(5, 4)).astype(np.float32)}
    grads = [{"w": rng.normal(size=(5, 4)).astype(np.float32)} for _ in range(10)]
    ours = _run_ours(make_adamw(weight_decay=wd), params0, grads, 1e-2)
    theirs = _run_torch(torch.optim.AdamW, params0, grads, lr=1e-2, weight_decay=wd)
    np.testing.assert_allclose(ours["w"], theirs["w"], atol=1e-6)


def test_adam_custom_betas_matches_torch(rng):
    """The dis/gen optimizers use betas (0.9*beta, 0.009*beta + 0.99)
    (reference trainer.py:369,377)."""
    beta = 1.1
    betas = (0.9 * beta, 0.009 * beta + 0.99)
    params0 = {"w": rng.normal(size=(8,)).astype(np.float32)}
    grads = [{"w": rng.normal(size=(8,)).astype(np.float32)} for _ in range(6)]
    ours = _run_ours(make_adamw(b1=betas[0], b2=betas[1]), params0, grads, 1e-3)
    theirs = _run_torch(torch.optim.AdamW, params0, grads, lr=1e-3, betas=betas,
                        weight_decay=0.0)
    np.testing.assert_allclose(ours["w"], theirs["w"], atol=1e-6)


def test_radam_matches_torch_optimizer(rng):
    ex_optim = pytest.importorskip("torch_optimizer")
    params0 = {"w": rng.normal(size=(5, 4)).astype(np.float32)}
    grads = [{"w": rng.normal(size=(5, 4)).astype(np.float32)} for _ in range(12)]
    ours = _run_ours(make_radam(), params0, grads, 1e-2)
    theirs = _run_torch(ex_optim.RAdam, params0, grads, lr=1e-2)
    np.testing.assert_allclose(ours["w"], theirs["w"], atol=1e-5)


def test_radam_matches_torch_builtin_no_decay(rng):
    """torch.optim.RAdam == torch_optimizer.RAdam at weight_decay=0; use it as
    the oracle when torch_optimizer isn't installed."""
    params0 = {"w": rng.normal(size=(5, 4)).astype(np.float32)}
    grads = [{"w": rng.normal(size=(5, 4)).astype(np.float32)} for _ in range(12)]
    ours = _run_ours(make_radam(), params0, grads, 1e-2)
    theirs = _run_torch(torch.optim.RAdam, params0, grads, lr=1e-2)
    np.testing.assert_allclose(ours["w"], theirs["w"], atol=1e-5)


def test_adabound_matches_torch_optimizer(rng):
    ex_optim = pytest.importorskip("torch_optimizer")
    params0 = {"w": rng.normal(size=(5, 4)).astype(np.float32)}
    grads = [{"w": rng.normal(size=(5, 4)).astype(np.float32)} for _ in range(12)]
    ours = _run_ours(make_adabound(base_lr=1e-2), params0, grads, 1e-2)
    theirs = _run_torch(ex_optim.AdaBound, params0, grads, lr=1e-2)
    np.testing.assert_allclose(ours["w"], theirs["w"], atol=1e-5)


def test_plateau_matches_torch_scheduler():
    """Feed an identical metric sequence to both implementations."""
    metrics = [5.0, 4.0, 3.99, 3.98, 3.985, 3.99, 3.97, 3.96, 3.955, 3.955,
               3.955, 3.955, 3.9, 2.0, 1.999, 1.998, 1.997, 1.996, 1.995, 1.994]
    factor, patience = 0.5, 2

    p = torch.tensor([1.0], requires_grad=True)
    opt = torch.optim.Adam([p], lr=0.1)
    sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=factor, patience=patience, cooldown=0, threshold=0.01
    )
    torch_lrs = []
    for m in metrics:
        sch.step(m)
        torch_lrs.append(opt.param_groups[0]["lr"])

    state = plateau_init(0.1)
    ours = []
    for m in metrics:
        state = plateau_update(state, jnp.float32(m), factor, patience)
        ours.append(float(state.lr))

    np.testing.assert_allclose(ours, torch_lrs, rtol=1e-6)


def test_plateau_eps_suppression():
    """Once lr is tiny, torch suppresses sub-eps reductions."""
    state = plateau_init(1e-8)
    for _ in range(10):
        state = plateau_update(state, jnp.float32(100.0), 0.1, patience=0)
    # 1e-8 * 0.1 change = 9e-9 < eps=1e-8 -> suppressed
    assert float(state.lr) == pytest.approx(1e-8)

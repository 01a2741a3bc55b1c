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


def _radam_numpy_oracle(params0, grads_seq, lr, b1=0.9, b2=0.999, eps=1e-8,
                        weight_decay=0.0):
    """Independent float64 transcription of torch_optimizer's RAdam (Liu et
    al. 2020 rectification; decay applied decoupled, p -= wd*lr*p, right
    before the step — the library's documented quirk).  Used as the oracle
    when torch_optimizer itself is not installed."""
    p = np.asarray(params0["w"], np.float64).copy()
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    rho_inf = 2.0 / (1.0 - b2) - 1.0
    for t, g in enumerate(grads_seq, start=1):
        g = np.asarray(g["w"], np.float64)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        beta2_t = b2 ** t
        rho_t = rho_inf - 2.0 * t * beta2_t / (1.0 - beta2_t)
        if weight_decay != 0.0:
            p = p - weight_decay * lr * p
        if rho_t > 5.0:
            num = (rho_t - 4.0) * (rho_t - 2.0) * rho_inf
            den = (rho_inf - 4.0) * (rho_inf - 2.0) * rho_t
            step_size = lr * np.sqrt((1 - beta2_t) * num / den) / (1 - b1 ** t)
            p = p - step_size * m / (np.sqrt(v) + eps)
        else:
            p = p - lr / (1 - b1 ** t) * m
    return {"w": p.astype(np.float32)}


def _adabound_numpy_oracle(params0, grads_seq, lr, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=0.0, final_lr=0.1, gamma=1e-3,
                           base_lr=1e-2):
    """Independent float64 transcription of AdaBound (Luo et al., ICLR 2019;
    torch_optimizer semantics: L2 decay folded into the gradient, bounds
    scale with lr/base_lr)."""
    p = np.asarray(params0["w"], np.float64).copy()
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    for t, g in enumerate(grads_seq, start=1):
        g = np.asarray(g["w"], np.float64)
        if weight_decay != 0.0:
            g = g + weight_decay * p
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        step_size = lr * np.sqrt(1 - b2 ** t) / (1 - b1 ** t)
        flr = final_lr * lr / base_lr
        lower = flr * (1.0 - 1.0 / (gamma * t + 1.0))
        upper = flr * (1.0 + 1.0 / (gamma * t))
        eff = np.clip(step_size / (np.sqrt(v) + eps), lower, upper)
        p = p - eff * m
    return {"w": p.astype(np.float32)}


@pytest.mark.parametrize("wd", [0.0, 0.01])
def test_radam_matches_torch_optimizer_or_oracle(rng, wd):
    """Against the real torch_optimizer when installed, else the independent
    float64 transcription above — either way the test RUNS (round-1 review:
    the importorskip left this path unexercised in-env)."""
    params0 = {"w": rng.normal(size=(5, 4)).astype(np.float32)}
    grads = [{"w": rng.normal(size=(5, 4)).astype(np.float32)} for _ in range(12)]
    ours = _run_ours(make_radam(weight_decay=wd), params0, grads, 1e-2)
    try:
        import torch_optimizer as ex_optim

        theirs = _run_torch(ex_optim.RAdam, params0, grads, lr=1e-2,
                            weight_decay=wd)
    except ImportError:
        theirs = _radam_numpy_oracle(params0, grads, 1e-2, weight_decay=wd)
    np.testing.assert_allclose(ours["w"], theirs["w"], atol=1e-5)


def test_radam_matches_torch_builtin_no_decay(rng):
    """torch.optim.RAdam == torch_optimizer.RAdam at weight_decay=0; use it as
    the oracle when torch_optimizer isn't installed."""
    params0 = {"w": rng.normal(size=(5, 4)).astype(np.float32)}
    grads = [{"w": rng.normal(size=(5, 4)).astype(np.float32)} for _ in range(12)]
    ours = _run_ours(make_radam(), params0, grads, 1e-2)
    theirs = _run_torch(torch.optim.RAdam, params0, grads, lr=1e-2)
    np.testing.assert_allclose(ours["w"], theirs["w"], atol=1e-5)


@pytest.mark.parametrize("wd", [0.0, 0.01])
def test_adabound_matches_torch_optimizer_or_oracle(rng, wd):
    params0 = {"w": rng.normal(size=(5, 4)).astype(np.float32)}
    grads = [{"w": rng.normal(size=(5, 4)).astype(np.float32)} for _ in range(12)]
    ours = _run_ours(make_adabound(base_lr=1e-2, weight_decay=wd),
                     params0, grads, 1e-2)
    try:
        import torch_optimizer as ex_optim

        theirs = _run_torch(ex_optim.AdaBound, params0, grads, lr=1e-2,
                            weight_decay=wd)
    except ImportError:
        theirs = _adabound_numpy_oracle(params0, grads, 1e-2, weight_decay=wd)
    np.testing.assert_allclose(ours["w"], theirs["w"], atol=1e-5)


def test_adabound_bounds_tighten_with_lr():
    """AdaBound's box scales with lr/base_lr: after a plateau lr cut the
    effective per-element step bounds shrink proportionally (the trait that
    distinguishes it from plain Adam under our runtime-lr design)."""
    opt = make_adabound(base_lr=1e-2, final_lr=0.1, gamma=1e-3)
    params = {"w": jnp.zeros((4,), jnp.float32)}
    state = opt.init(params)
    g = {"w": jnp.full((4,), 1e-12, jnp.float32)}  # ~zero grad -> hits bounds
    # run a couple of steps so t > 0, then compare one step at two lrs
    p1, s1 = opt.update(g, state, params, jnp.float32(1e-2))
    p_hi, _ = opt.update(g, s1, p1, jnp.float32(1e-2))
    p_lo, _ = opt.update(g, s1, p1, jnp.float32(1e-3))
    d_hi = np.abs(np.asarray(p_hi["w"]) - np.asarray(p1["w"])).max()
    d_lo = np.abs(np.asarray(p_lo["w"]) - np.asarray(p1["w"])).max()
    assert d_lo < d_hi
    np.testing.assert_allclose(d_lo, d_hi / 10.0, rtol=1e-3)


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

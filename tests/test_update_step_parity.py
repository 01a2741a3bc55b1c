"""Single-update-step parity vs the reference stack.

Strongest dynamics evidence short of bitwise RNG control: identical encoder
weights in torch and rankaae_tpu, one deterministic loss evaluation
(dropout/noise disabled, no sampling involved), backward, one AdamW step —
the updated parameters must match pointwise.  This pins the whole chain:
forward parity x loss parity x gradient parity x optimizer parity.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from rankaae_tpu.models.encoders import FCEncoder
from rankaae_tpu.optim.optimizers import make_adamw
from rankaae_tpu.ops.kendall import kendall_constraint
from rankaae_tpu.ops.losses import recon_loss

RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
LR = 1e-2
WD = 0.01


def _paired_encoders(rng, n_layers=3, nstyle=6, dim_in=64):
    """Build our FCEncoder + the reference's with IDENTICAL weights."""
    from tests.conftest import import_reference_sc

    import_reference_sc()
    import sc.clustering.model as ref_model

    tenc = ref_model.FCEncoder(nstyle=nstyle, dim_in=dim_in, n_layers=n_layers,
                               dropout_rate=0.0)
    ours = FCEncoder(nstyle=nstyle, dim_in=dim_in, n_layers=n_layers,
                     dropout_rate=0.0)
    x0 = jnp.zeros((2, dim_in), jnp.float32)
    variables = ours.init(RNGS, x0, train=True)
    params = jax.tree_util.tree_map(np.array, variables["params"])
    stats = jax.tree_util.tree_map(np.array, variables["batch_stats"])

    # copy OUR init into torch so both start identical
    idx = 0
    with torch.no_grad():
        for i in range(n_layers - 1):
            tenc.main[idx].weight.copy_(torch.tensor(params[f"lin{i}"]["kernel"].T))
            tenc.main[idx].bias.copy_(torch.tensor(params[f"lin{i}"]["bias"]))
            tenc.main[idx + 1].weight.copy_(torch.tensor(params[f"prelu{i}"]["alpha"]))
            idx += 4
        tenc.main[idx].weight.copy_(torch.tensor(params["lin_out"]["kernel"].T))
        tenc.main[idx].bias.copy_(torch.tensor(params["lin_out"]["bias"]))
    return tenc, ours, params, stats


def _extract_torch_params(tenc, n_layers):
    out = {}
    idx = 0
    for i in range(n_layers - 1):
        out[f"lin{i}"] = {
            "kernel": tenc.main[idx].weight.detach().numpy().T,
            "bias": tenc.main[idx].bias.detach().numpy(),
        }
        out[f"prelu{i}"] = {"alpha": tenc.main[idx + 1].weight.detach().numpy()}
        idx += 4
    out["lin_out"] = {
        "kernel": tenc.main[idx].weight.detach().numpy().T,
        "bias": tenc.main[idx].bias.detach().numpy(),
    }
    return out


@pytest.mark.parametrize("loss_kind", ["kendall", "recon_on_styles"])
def test_one_adamw_step_matches_reference(rng, loss_kind):
    n_layers, nstyle, dim_in, B = 3, 6, 64, 128
    tenc, ours, params, stats = _paired_encoders(rng, n_layers, nstyle, dim_in)

    spec = rng.normal(size=(B, dim_in)).astype(np.float32)
    aux = rng.normal(size=(B, 5)).astype(np.float32)
    aux[:, 1] = rng.choice([4.0, 5.0, 6.0], B)

    # ---- torch side: train-mode forward, loss, backward, AdamW step ---- #
    tenc.train()
    opt = torch.optim.AdamW(tenc.parameters(), lr=LR, weight_decay=WD)
    styles_t = tenc(torch.tensor(spec))
    if loss_kind == "kendall":
        d = torch.tensor(aux)
        target = torch.sign(d[:, None, :] - d[None, :, :])
        pred = styles_t[:, :5][:, None, :] - styles_t[:, :5][None, :, :]
        loss_t = -(pred * target).sum() / ((B * B - B) * 5)
    else:
        loss_t = ((styles_t - torch.tensor(spec[:, :nstyle])) ** 2).mean()
    opt.zero_grad()
    loss_t.backward()
    opt.step()
    ref_new = _extract_torch_params(tenc, n_layers)

    # ---- our side: same forward mode, same loss, our AdamW ---- #
    def loss_fn(p):
        styles, _ = ours.apply(
            {"params": p, "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
            jnp.asarray(spec), train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(9)},
        )
        if loss_kind == "kendall":
            return kendall_constraint(jnp.asarray(aux), styles[:, :5], activate=False)
        return recon_loss(jnp.asarray(spec[:, :nstyle]), styles)

    params_j = jax.tree_util.tree_map(jnp.asarray, params)
    loss_j, grads = jax.value_and_grad(loss_fn)(params_j)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5, atol=1e-7)

    adamw = make_adamw(weight_decay=WD)
    opt_state = adamw.init(params_j)
    new_params, _ = adamw.update(grads, opt_state, params_j, jnp.float32(LR))

    for name in ref_new:
        for field in ref_new[name]:
            got = np.asarray(new_params[name][field])
            want = ref_new[name][field]
            # Adam's step direction is undefined where the gradient is
            # numerically zero (m-hat/sqrt(v-hat) of ~1e-8 noise): the final
            # affine-free BN makes lin_out.bias gradients vanish.  Compare
            # only where the gradient is meaningful.
            g = np.asarray(grads[name][field])
            mask = np.abs(g) > 1e-6
            if mask.any():
                np.testing.assert_allclose(
                    got[mask], want[mask], atol=2e-6,
                    err_msg=f"{loss_kind}: {name}.{field}",
                )

"""Single-update-step parity for the CONV autoencoders vs torch.

``test_update_step_parity.py`` pins the FC chain (forward x loss x gradient
x AdamW) — this file pins the same chain through both conv families:
(Compact)Encoder -> (Compact)Decoder -> recon MSE -> backward -> one AdamW
step, with identical starting weights on both stacks (dropout disabled,
train-mode BN).  Together with the block-level gradient pinning
(``test_blocks_grad_parity.py``) this closes the conv training surface:
any cross-stack conv training-outcome difference must come from stochastic
draws / precision, not the code path.

Reference: sc/clustering/model.py:232-295 (Encoder/CompactEncoder), 381-474
(Decoder/CompactDecoder); trainer's AdamW usage at sc/clustering/trainer.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from rankaae_tpu.models.decoders import CompactDecoder, Decoder  # noqa: E402
from rankaae_tpu.models.encoders import CompactEncoder, Encoder  # noqa: E402
from rankaae_tpu.optim.optimizers import make_adamw  # noqa: E402

LR = 1e-2
WD = 0.01


def _tree_leaves_with_path(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _tree_leaves_with_path(tree[k], f"{prefix}/{k}")
    else:
        yield prefix, tree


@pytest.mark.slow
@pytest.mark.parametrize("ae_form", ["compact", "normal"])
def test_one_adamw_step_conv_autoencoder(rng, ae_form):
    from tests.conftest import import_reference_sc

    import_reference_sc()
    import sc.clustering.model as ref_model

    from rankaae_tpu.utils.torch_import import convert_reference_model

    nstyle, dim = 5, 256
    torch.manual_seed(3)
    if ae_form == "compact":
        tenc = ref_model.CompactEncoder(nstyle=nstyle, dropout_rate=0.0)
        tdec = ref_model.CompactDecoder(nstyle=nstyle, dropout_rate=0.0,
                                        last_layer_activation="Softplus")
    else:
        tenc = ref_model.Encoder(nstyle=nstyle, dropout_rate=0.0)
        tdec = ref_model.Decoder(nstyle=nstyle, dropout_rate=0.0,
                                 last_layer_activation="Softplus")

    # torch init -> our layout (the converter is itself pinned by
    # test_golden_fixture.py), so both stacks start from identical weights
    params, stats, cfg = convert_reference_model(
        {"Encoder": tenc, "Decoder": tdec})
    assert cfg.ae_form == ae_form

    spec = rng.normal(size=(64, dim)).astype(np.float32) ** 2  # positive-ish

    # ---- torch: train-mode forward, recon MSE, backward, one AdamW ---- #
    tenc.train(), tdec.train()
    opt = torch.optim.AdamW(
        list(tenc.parameters()) + list(tdec.parameters()),
        lr=LR, weight_decay=WD)
    ts = torch.tensor(spec)
    loss_t = ((tdec(tenc(ts)) - ts) ** 2).mean()
    opt.zero_grad()
    loss_t.backward()
    opt.step()
    ref_new, _, _ = convert_reference_model({"Encoder": tenc, "Decoder": tdec})

    # ---- ours: same chain with our modules + AdamW ---- #
    if ae_form == "compact":
        enc = CompactEncoder(nstyle=nstyle, dropout_rate=0.0, dim_in=dim)
        dec = CompactDecoder(nstyle=nstyle, dropout_rate=0.0, dim_out=dim,
                             last_layer_activation="Softplus")
    else:
        enc = Encoder(nstyle=nstyle, dropout_rate=0.0, dim_in=dim)
        dec = Decoder(nstyle=nstyle, dropout_rate=0.0,
                      last_layer_activation="Softplus")

    def loss_fn(p):
        z, _ = enc.apply(
            {"params": p["enc"], "batch_stats": stats["enc"]},
            jnp.asarray(spec), train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(7)},
        )
        out, _ = dec.apply(
            {"params": p["dec"], "batch_stats": stats["dec"]},
            z, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(8)},
        )
        return jnp.mean((out - jnp.asarray(spec)) ** 2)

    params_j = jax.tree_util.tree_map(jnp.asarray,
                                      {"enc": params["enc"], "dec": params["dec"]})
    loss_j, grads = jax.value_and_grad(loss_fn)(params_j)
    np.testing.assert_allclose(float(loss_j), loss_t.item(),
                               rtol=1e-5, atol=1e-7)

    adamw = make_adamw(weight_decay=WD)
    opt_state = adamw.init(params_j)
    new_params, _ = adamw.update(grads, opt_state, params_j, jnp.float32(LR))

    ref_tree = {"enc": ref_new["enc"], "dec": ref_new["dec"]}
    n_checked = 0
    for (path, want), (_, got), (_, g) in zip(
            _tree_leaves_with_path(ref_tree),
            _tree_leaves_with_path(new_params),
            _tree_leaves_with_path(grads)):
        got, want, g = np.asarray(got), np.asarray(want), np.asarray(g)
        assert got.shape == want.shape, path
        # Adam's direction is undefined where the gradient is numerically
        # zero (m-hat/rsqrt(v-hat) of ~1e-8 noise); compare where meaningful
        mask = np.abs(g) > 1e-6
        if mask.any():
            np.testing.assert_allclose(got[mask], want[mask], atol=1e-5,
                                       err_msg=path)
            n_checked += 1
    assert n_checked > 30  # the whole autoencoder actually got compared

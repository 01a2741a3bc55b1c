"""Model-zoo tests: shapes/modes for every family, plus full-forward parity
against the actual reference torch modules with copied weights."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankaae_tpu.models import (
    CompactDecoder,
    CompactEncoder,
    Decoder,
    DiscriminatorCNN,
    DiscriminatorFC,
    Encoder,
    FCDecoder,
    FCEncoder,
    QvecDecoder,
    QvecEncoder,
)
from rankaae_tpu.models.grl import grad_reverse

torch = pytest.importorskip("torch")

RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}


def _init_and_apply(mod, x, train=False, extra=()):
    variables = mod.init(RNGS, x, *extra, train=True)
    y = mod.apply(variables, x, *extra, train=train,
                  rngs=RNGS if train else None,
                  mutable=["batch_stats"] if train else False)
    if train:
        y = y[0]
    return variables, y


@pytest.mark.parametrize("enc_cls,dim_in", [(FCEncoder, 256), (Encoder, 256), (CompactEncoder, 256), (QvecEncoder, 12)])
def test_encoder_shapes(rng, enc_cls, dim_in):
    x = jnp.asarray(rng.normal(size=(8, dim_in)).astype(np.float32))
    mod = enc_cls(nstyle=6, n_layers=5) if enc_cls is FCEncoder else enc_cls(nstyle=6)
    _, z = _init_and_apply(mod, x, train=True)
    assert z.shape == (8, 6)
    # train-mode latent is BN-standardized: near zero mean / unit var
    np.testing.assert_allclose(np.asarray(z).mean(axis=0), 0.0, atol=1e-4)


@pytest.mark.parametrize(
    "dec_cls,dim_out", [(FCDecoder, 256), (Decoder, 256), (CompactDecoder, 256), (QvecDecoder, 12)]
)
def test_decoder_shapes(rng, dec_cls, dim_out):
    z = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
    mod = dec_cls(nstyle=6, last_layer_activation="Softplus", n_layers=5) \
        if dec_cls is FCDecoder else dec_cls(nstyle=6, last_layer_activation="Softplus")
    _, spec = _init_and_apply(mod, z, train=True)
    assert spec.shape == (8, dim_out)
    if dec_cls is not QvecDecoder:
        # QvecDecoder's head is a plain Linear (activation is mid-stack,
        # reference model.py:497-500); the others end in the Softplus head.
        assert np.all(np.asarray(spec) >= 0)


@pytest.mark.parametrize("dis_cls,out_dim", [(DiscriminatorFC, 1), (DiscriminatorCNN, 2)])
def test_discriminator_shapes(rng, dis_cls, out_dim):
    x = jnp.asarray(rng.normal(size=(16, 6)).astype(np.float32))
    mod = dis_cls(nstyle=6)
    variables = mod.init(RNGS, x, jnp.float32(0.5), train=True)
    y = mod.apply(variables, x, jnp.float32(0.5), train=False)
    assert y.shape == (16, out_dim)
    if out_dim == 2:  # log-softmax rows sum to 1 in prob space
        np.testing.assert_allclose(np.exp(np.asarray(y)).sum(axis=1), 1.0, atol=1e-5)


def test_grl_reverses_gradient():
    x = jnp.arange(4.0)
    f = lambda x: jnp.sum(grad_reverse(x, jnp.float32(0.7)) ** 2)
    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), -0.7 * 2 * np.arange(4.0), rtol=1e-6)


def test_grl_beta_none_is_identity_path(rng):
    """beta=None skips reversal entirely (reference model.py:17-21)."""
    x = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
    mod = DiscriminatorFC(nstyle=6, noise=0.0)
    variables = mod.init(RNGS, x, None, train=False)
    y = mod.apply(variables, x, None, train=False)
    assert y.shape == (8, 1)


# ---------------------------------------------------------------------------
# Full-forward parity vs the reference implementation (weights copied in).
# The reference package is imported read-only purely as a test oracle.
# ---------------------------------------------------------------------------

def _ref_model():
    from tests.conftest import import_reference_sc

    import_reference_sc()
    import sc.clustering.model as ref_model

    return ref_model


def _copy_fc_stack_from_torch(seq, n_layers, params, batch_stats, prefix_lin="lin",
                              has_final_bn=True):
    """Copy torch Sequential([Linear, PReLU, BN, Dropout]*(n-1) + [Linear(, BN)])
    weights into our FCEncoder/FCDecoder param dict (in place)."""
    idx = 0
    for i in range(n_layers - 1):
        lin, prelu, bn = seq[idx], seq[idx + 1], seq[idx + 2]
        params[f"{prefix_lin}{i}"]["kernel"] = jnp.asarray(lin.weight.detach().numpy().T)
        params[f"{prefix_lin}{i}"]["bias"] = jnp.asarray(lin.bias.detach().numpy())
        params[f"prelu{i}"]["alpha"] = jnp.asarray(prelu.weight.detach().numpy())
        batch_stats[f"bn{i}"]["mean"] = jnp.asarray(bn.running_mean.numpy())
        batch_stats[f"bn{i}"]["var"] = jnp.asarray(bn.running_var.numpy())
        idx += 4
    lin = seq[idx]
    params["lin_out"]["kernel"] = jnp.asarray(lin.weight.detach().numpy().T)
    params["lin_out"]["bias"] = jnp.asarray(lin.bias.detach().numpy())
    if has_final_bn:
        bn = seq[idx + 1]
        batch_stats["bn_style"]["mean"] = jnp.asarray(bn.running_mean.numpy())
        batch_stats["bn_style"]["var"] = jnp.asarray(bn.running_var.numpy())


def test_fc_encoder_forward_parity_with_reference(rng):
    ref = _ref_model()
    n_layers, nstyle, dim_in = 4, 6, 256
    tenc = ref.FCEncoder(nstyle=nstyle, dim_in=dim_in, n_layers=n_layers, dropout_rate=0.0)
    tenc.eval()
    # push some data through in train mode so running stats are non-trivial
    warm = torch.tensor(rng.normal(size=(64, dim_in)).astype(np.float32))
    tenc.train()
    tenc(warm)
    tenc.eval()

    mod = FCEncoder(nstyle=nstyle, dim_in=dim_in, n_layers=n_layers, dropout_rate=0.0)
    x = rng.normal(size=(8, dim_in)).astype(np.float32)
    variables = mod.init(RNGS, jnp.asarray(x), train=True)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    params = jax.tree_util.tree_map(jnp.asarray, params)
    bstats = jax.tree_util.tree_map(jnp.asarray, variables["batch_stats"])
    params = {k: dict(v) for k, v in params.items()}
    bstats = {k: dict(v) for k, v in bstats.items()}
    _copy_fc_stack_from_torch(tenc.main, n_layers, params, bstats)

    ours = mod.apply({"params": params, "batch_stats": bstats}, jnp.asarray(x), train=False)
    theirs = tenc(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)


def test_fc_decoder_forward_parity_with_reference(rng):
    ref = _ref_model()
    n_layers, nstyle, dim_out = 4, 6, 256
    tdec = ref.FCDecoder(nstyle=nstyle, dim_out=dim_out, n_layers=n_layers,
                         dropout_rate=0.0, last_layer_activation="Softplus")
    warm = torch.tensor(rng.normal(size=(64, nstyle)).astype(np.float32))
    tdec.train()
    tdec(warm)
    tdec.eval()

    mod = FCDecoder(nstyle=nstyle, dim_out=dim_out, n_layers=n_layers,
                    dropout_rate=0.0, last_layer_activation="Softplus")
    z = rng.normal(size=(8, nstyle)).astype(np.float32)
    variables = mod.init(RNGS, jnp.asarray(z), train=True)
    params = {k: dict(v) for k, v in variables["params"].items()}
    bstats = {k: dict(v) for k, v in variables["batch_stats"].items()}
    _copy_fc_stack_from_torch(tdec.main, n_layers, params, bstats, has_final_bn=False)

    ours = mod.apply({"params": params, "batch_stats": bstats}, jnp.asarray(z), train=False)
    theirs = tdec(torch.tensor(z)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)


def test_fc_discriminator_forward_parity_with_reference(rng):
    ref = _ref_model()
    nstyle, layers = 6, 3
    tdis = ref.DiscriminatorFC(nstyle=nstyle, layers=layers, dropout_rate=0.0, noise=0.0)
    tdis.eval()

    mod = DiscriminatorFC(nstyle=nstyle, layers=layers, dropout_rate=0.0, noise=0.0)
    x = rng.normal(size=(8, nstyle)).astype(np.float32)
    variables = mod.init(RNGS, jnp.asarray(x), None, train=True)
    params = {k: dict(v) for k, v in variables["params"].items()}

    seq = tdis.main
    idx = 0
    for i in range(layers - 1):
        params[f"lin{i}"]["kernel"] = jnp.asarray(seq[idx].weight.detach().numpy().T)
        params[f"lin{i}"]["bias"] = jnp.asarray(seq[idx].bias.detach().numpy())
        params[f"prelu{i}"]["alpha"] = jnp.asarray(seq[idx + 1].weight.detach().numpy())
        idx += 3
    params["lin_out"]["kernel"] = jnp.asarray(seq[idx].weight.detach().numpy().T)
    params["lin_out"]["bias"] = jnp.asarray(seq[idx].bias.detach().numpy())

    ours = mod.apply({"params": params}, jnp.asarray(x), None, train=False)
    theirs = tdis(torch.tensor(x), None).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)


def test_inference_pins_f32_under_bf16_process(rng):
    """Report/serving forwards stay parity-exact f32 even when the process
    trained at activation_dtype=bfloat16 (primitives.activation_dtype_scope)."""
    import jax

    from rankaae_tpu.models import primitives
    from rankaae_tpu.models.inference import InferenceModel
    from rankaae_tpu.train.trainer import RankAAETrainer
    from rankaae_tpu.utils.config import TrainConfig

    cfg = TrainConfig(ae_form="FC", nstyle=6, n_aux=5, dim_in=64, dim_out=64,
                      n_layers=3, decoder_activation="Softplus", batch_size=32,
                      activation_dtype="bfloat16")
    trainer = RankAAETrainer(cfg, 64, 32)   # sets the process knob to bf16
    try:
        state = trainer.init_state(jax.random.PRNGKey(0))
        model = InferenceModel(
            jax.tree_util.tree_map(np.asarray, state.params),
            jax.tree_util.tree_map(np.asarray, state.batch_stats), cfg)
        z = model.encode(rng.normal(size=(8, 64)).astype(np.float32))
        assert z.dtype == np.float32
        spec = model.decode(z)
        assert spec.dtype == np.float32
        # the knob itself is untouched after tracing
        assert primitives.get_activation_dtype() == jnp.bfloat16
    finally:
        primitives.set_activation_dtype("float32")

"""Statistical parity of the INITIAL weight distributions vs torch.

Every other conv/FC parity test starts from *copied* torch weights, so none
of them can catch a mismatch in the init distributions themselves — yet the
flex-target reconstruction objective (`use_flex_spec_target`) makes early
output amplitude sticky (the target chases the output), so a systematically
smaller/larger init on one stack could bias whole training trajectories.

This file closes that hole: instantiate both stacks' modules many times,
pool each leaf's samples across instantiations, and compare the empirical
spread (std) leaf-by-leaf plus the support bound of the uniform draws.

torch defaults (reference modules use them unmodified):
  * Linear/Conv1d/ConvTranspose1d weight: kaiming_uniform(a=sqrt(5))
    == U(-b, b) with b = 1/sqrt(fan_in)    [std = b/sqrt(3)]
  * bias: U(-b, b), b = 1/sqrt(fan_in)
  * PReLU: constant init (reference passes init=0.01)
Reference: sc/clustering/model.py:232-295 (CompactEncoder), 430-474
(CompactDecoder), 330-378 (FCEncoder); torch nn.Linear/_ConvNd.reset_parameters.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from rankaae_tpu.models.decoders import CompactDecoder, FCDecoder  # noqa: E402
from rankaae_tpu.models.encoders import CompactEncoder, FCEncoder  # noqa: E402

N_INIT = 30          # instantiations pooled per stack
# The std of a pooled-std estimate over n iid samples is ~ 1/sqrt(2n)
# relative; tolerate 4 sigma plus a small floor.  Catches the gross errors
# this test exists for (wrong fan_in, lecun-vs-kaiming, sqrt(3) factors:
# all >= 15-70% on the big kernels where n is huge and the tolerance tight)
# while small bias vectors (n ~ 100) get the loose tolerance they need.
_REL_TOL_SIGMA = 4.0
_REL_TOL_FLOOR = 0.03


def _leaves(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _leaves(tree[k], f"{prefix}/{k}")
    else:
        yield prefix, np.asarray(tree)


def _pool(trees):
    """path -> 1-D array pooling that leaf over all instantiations."""
    pooled = {}
    for t in trees:
        for path, leaf in _leaves(t):
            pooled.setdefault(path, []).append(leaf.ravel())
    return {p: np.concatenate(v) for p, v in pooled.items()}


def _ours_init(module, x, n, base_seed=0):
    out = []
    for i in range(n):
        k = jax.random.PRNGKey(base_seed + i)
        rngs = {"params": k, "dropout": jax.random.fold_in(k, 1),
                "noise": jax.random.fold_in(k, 2)}
        out.append(module.init(rngs, x, train=True)["params"])
    return out


def _torch_init(factory, convert, n, base_seed=100):
    out = []
    for i in range(n):
        torch.manual_seed(base_seed + i)
        out.append(convert(factory()))
    return out


def _compare(ref_pool, ours_pool):
    assert set(ref_pool) == set(ours_pool), (
        sorted(set(ref_pool) ^ set(ours_pool)))
    checked = 0
    for path, ref in ref_pool.items():
        got = ours_pool[path]
        assert ref.size == got.size, path
        ref_std, got_std = ref.std(), got.std()
        if np.ptp(ref) == 0.0:  # constant init (PReLU slopes): compare values
            np.testing.assert_allclose(got, ref[0], atol=0, err_msg=path)
            continue
        # pooled std agreement (dominant check: uniform bound 1/sqrt(fan_in));
        # combined sampling error of the two independent std estimates
        tol = _REL_TOL_FLOOR + _REL_TOL_SIGMA * np.sqrt(2.0 / (2.0 * ref.size))
        assert abs(got_std / ref_std - 1.0) < tol, (
            f"{path}: std ours {got_std:.5g} vs torch {ref_std:.5g} "
            f"(n={ref.size}, tol={tol:.3f})")
        if ref.size >= 2000:
            # same support: empirical max magnitude (tight only when the
            # empirical max is a good estimate of the uniform bound)
            ref_b, got_b = np.abs(ref).max(), np.abs(got).max()
            assert abs(got_b / ref_b - 1.0) < 0.15, (
                f"{path}: bound ours {got_b:.5g} vs torch {ref_b:.5g}")
        # centered
        assert abs(got.mean()) < 4.0 * got_std / np.sqrt(got.size) + 1e-12, path
        checked += 1
    return checked


@pytest.fixture(scope="module")
def ref_model():
    from tests.conftest import import_reference_sc

    import_reference_sc()
    import sc.clustering.model as ref_model

    return ref_model


def test_compact_encoder_init_distribution(ref_model):
    from rankaae_tpu.utils.torch_import import _convert_conv_encoder

    ours = _ours_init(CompactEncoder(nstyle=5, dropout_rate=0.0, dim_in=256),
                      jnp.zeros((2, 256), jnp.float32), N_INIT)
    ref = _torch_init(
        lambda: ref_model.CompactEncoder(nstyle=5, dropout_rate=0.0),
        lambda m: _convert_conv_encoder(m)[0], N_INIT)
    n = _compare(_pool(ref), _pool(ours))
    assert n >= 10  # sanity: the tree really has weight leaves


def test_compact_decoder_init_distribution(ref_model):
    from rankaae_tpu.utils.torch_import import _convert_conv_decoder

    ours = _ours_init(
        CompactDecoder(nstyle=5, dropout_rate=0.0, dim_out=256,
                       last_layer_activation="Softplus"),
        jnp.zeros((2, 5), jnp.float32), N_INIT)
    ref = _torch_init(
        lambda: ref_model.CompactDecoder(nstyle=5, dropout_rate=0.0,
                                         last_layer_activation="Softplus"),
        lambda m: _convert_conv_decoder(m)[0], N_INIT)
    n = _compare(_pool(ref), _pool(ours))
    assert n >= 10


def test_fc_autoencoder_init_distribution(ref_model):
    from rankaae_tpu.utils.torch_import import (_convert_fc_stack,
                                                _count_fc_layers)

    ours_e = _ours_init(
        FCEncoder(nstyle=6, dim_in=256, n_layers=5, dropout_rate=0.0),
        jnp.zeros((2, 256), jnp.float32), N_INIT)
    ours_d = _ours_init(
        FCDecoder(nstyle=6, dim_out=256, n_layers=5, dropout_rate=0.0,
                  last_layer_activation="Softplus"),
        jnp.zeros((2, 6), jnp.float32), N_INIT)

    def make_ref(cls, **kw):
        m = cls(**kw)
        seq = m.main
        return _convert_fc_stack(seq, _count_fc_layers(seq),
                                 final_bn=cls.__name__ == "FCEncoder")[0]

    ref_e = _torch_init(
        lambda: make_ref(ref_model.FCEncoder, nstyle=6, dim_in=256,
                         n_layers=5, dropout_rate=0.0), lambda p: p, N_INIT)
    ref_d = _torch_init(
        lambda: make_ref(ref_model.FCDecoder, nstyle=6, dim_out=256,
                         n_layers=5, dropout_rate=0.0,
                         last_layer_activation="Softplus"),
        lambda p: p, N_INIT)
    assert _compare(_pool(ref_e), _pool(ours_e)) >= 5
    assert _compare(_pool(ref_d), _pool(ours_d)) >= 5

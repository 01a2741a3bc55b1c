"""Round-trip export: rankaae_tpu bundle -> reference ``final.pt``.

The exported checkpoint must contain genuine reference classes whose
eval-mode forwards reproduce our model pointwise — i.e. a TPU-trained model
dropped into the reference's own report stage yields identical numbers.
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _random_bundle(tmp_path, ae_form, seed=0):
    import jax

    from rankaae_tpu.train.trainer import RankAAETrainer
    from rankaae_tpu.utils.checkpoint import save_model_bundle
    from rankaae_tpu.utils.config import TrainConfig

    cfg = TrainConfig(
        ae_form=ae_form, nstyle=6, n_aux=5, dim_in=256, dim_out=256,
        n_layers=4, FC_discriminator_layers=3, use_cnn_discriminator=False,
        decoder_activation="Softplus", batch_size=64,
    )
    trainer = RankAAETrainer(cfg, n_train=192, n_val=64)
    state = trainer.init_state(jax.random.PRNGKey(seed))
    # make BN running stats non-trivial so eval-mode parity exercises them
    bs = jax.tree_util.tree_map(
        lambda x: x + 0.05 * (np.arange(x.size, dtype=np.float32).reshape(x.shape) % 3),
        state.batch_stats,
    )
    path = os.path.join(tmp_path, f"bundle_{ae_form}.mpk")
    save_model_bundle(path, state.params, bs, cfg)
    return path, cfg


@pytest.mark.parametrize("ae_form", ["FC", "compact", "normal"])
def test_export_round_trip_forward_parity(tmp_path, rng, ae_form):
    from tests.conftest import import_reference_sc

    from rankaae_tpu.models.inference import InferenceModel
    from rankaae_tpu.utils.torch_export import export_reference_checkpoint

    bundle, cfg = _random_bundle(str(tmp_path), ae_form)
    pt_path = os.path.join(str(tmp_path), "final.pt")
    export_reference_checkpoint(bundle, pt_path)

    import_reference_sc()   # reference classes needed for unpickling
    model = torch.load(pt_path, map_location="cpu", weights_only=False)
    assert set(model) == {"Encoder", "Decoder", "Style Discriminator"}
    # the pickled classes are the reference's, not the repo shim's
    assert "/root/reference" in type(model["Encoder"]).__module__ or \
        "/root/reference" in (getattr(
            __import__(type(model["Encoder"]).__module__, fromlist=["x"]),
            "__file__", "") or "")

    ours = InferenceModel.from_bundle(bundle)
    spec = (rng.normal(size=(16, 256)).astype(np.float32) * 0.2 + 1.0)
    z = rng.normal(size=(16, 6)).astype(np.float32)

    tenc, tdec = model["Encoder"].eval(), model["Decoder"].eval()
    with torch.no_grad():
        z_ref = tenc(torch.tensor(spec)).numpy()
        s_ref = tdec(torch.tensor(z)).numpy()
    np.testing.assert_allclose(ours.encode(spec), z_ref, atol=3e-4)
    np.testing.assert_allclose(ours.decode(z), s_ref, atol=3e-4)

    tdis = model["Style Discriminator"].eval()
    with torch.no_grad():
        d_ref = tdis(torch.tensor(z), None).numpy()
    np.testing.assert_allclose(ours.discriminate(z), d_ref, atol=3e-4)


def test_export_then_reimport_identity(tmp_path, rng):
    """export -> torch_import must reproduce the original pytrees exactly."""
    import jax

    from tests.conftest import import_reference_sc

    from rankaae_tpu.utils.checkpoint import load_model_bundle
    from rankaae_tpu.utils.torch_export import export_reference_checkpoint

    bundle, cfg = _random_bundle(str(tmp_path), "FC", seed=3)
    pt_path = os.path.join(str(tmp_path), "final.pt")
    export_reference_checkpoint(bundle, pt_path)

    import_reference_sc()
    from rankaae_tpu.utils.torch_import import import_reference_checkpoint

    params2, stats2, cfg2 = import_reference_checkpoint(pt_path)
    params1, stats1, _, _ = load_model_bundle(bundle)
    for a, b in zip(jax.tree_util.tree_leaves((params1["enc"], params1["dec"],
                                               stats1["enc"], stats1["dec"])),
                    jax.tree_util.tree_leaves((params2["enc"], params2["dec"],
                                               stats2["enc"], stats2["dec"]))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert cfg2.nstyle == cfg.nstyle and cfg2.n_layers == cfg.n_layers

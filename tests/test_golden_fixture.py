"""Golden-weight parity against the reference's committed fixture models.

The reference ships 8 fully-trained (1500-epoch GPU) checkpoints under
``sc/tests/data/training/job_*/final.pt``.  Its own golden test asserts a
reconstruction MAE of 0.0443 +- 1e-4 on the bundled V-dataset
(``test_generate_report.py:17-21``) — that CSV is a missing LFS blob, so the
dataset-dependent assertion cannot run; instead we assert something at least
as strong: our converted model must reproduce the torch model's outputs
*pointwise* on arbitrary inputs, which implies equality of any downstream
metric including that MAE.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

FIXTURE = "/root/reference/sc/tests/data/training/job_1/final.pt"


@pytest.fixture(scope="module")
def reference_model():
    from tests.conftest import import_reference_sc

    import_reference_sc()
    return torch.load(FIXTURE, map_location="cpu", weights_only=False)


@pytest.fixture(scope="module")
def converted(reference_model):
    from rankaae_tpu.utils.torch_import import convert_reference_model

    return convert_reference_model(reference_model)


def test_conversion_infers_config(converted):
    _, _, cfg = converted
    assert cfg.nstyle == 6
    assert cfg.n_layers == 5
    assert cfg.dim_in == 256 and cfg.dim_out == 256
    assert cfg.decoder_activation == "Softplus"


def test_encoder_golden_parity(reference_model, converted, rng):
    from rankaae_tpu.models.inference import InferenceModel

    params, stats, cfg = converted
    ours = InferenceModel(params, stats, cfg)
    tenc = reference_model["Encoder"]
    tenc.eval()

    spec = (rng.normal(size=(32, 256)).astype(np.float32) * 0.2 + 1.0)
    z_ref = tenc(torch.tensor(spec)).detach().numpy()
    z_ours = ours.encode(spec)
    np.testing.assert_allclose(z_ours, z_ref, atol=2e-4)


def test_decoder_golden_parity(reference_model, converted, rng):
    from rankaae_tpu.models.inference import InferenceModel

    params, stats, cfg = converted
    ours = InferenceModel(params, stats, cfg)
    tdec = reference_model["Decoder"]
    tdec.eval()

    z = rng.normal(size=(32, 6)).astype(np.float32)
    spec_ref = tdec(torch.tensor(z)).detach().numpy()
    spec_ours = ours.decode(z)
    np.testing.assert_allclose(spec_ours, spec_ref, atol=2e-4)


def test_discriminator_conversion_is_best_effort(converted, rng):
    """The fixtures carry a pre-refactor discriminator (BN + 2-class
    Softmax head) that even the current reference code cannot rebuild;
    conversion must skip it cleanly and the handle must say so."""
    from rankaae_tpu.models.inference import InferenceModel

    params, stats, cfg = converted
    assert params["dis"] == {}
    ours = InferenceModel(params, stats, cfg)
    with pytest.raises(ValueError, match="no discriminator"):
        ours.discriminate(rng.normal(size=(4, 6)).astype(np.float32))


def test_full_autoencoder_roundtrip_metric_parity(reference_model, converted, rng):
    """End-to-end: recon MAE computed through our stack equals the torch
    stack's on identical inputs — the dataset-free version of the
    reference's golden 0.0443 assertion."""
    from sklearn.metrics import mean_absolute_error

    from rankaae_tpu.models.inference import InferenceModel

    params, stats, cfg = converted
    ours = InferenceModel(params, stats, cfg)
    tenc, tdec = reference_model["Encoder"], reference_model["Decoder"]
    tenc.eval(), tdec.eval()

    spec = (rng.normal(size=(64, 256)).astype(np.float32) * 0.3 + 1.0)
    out_ref = tdec(tenc(torch.tensor(spec))).detach().numpy()
    out_ours = ours.decode(ours.encode(spec))

    mae_ref = np.mean([mean_absolute_error(a, b) for a, b in zip(spec, out_ref)])
    mae_ours = np.mean([mean_absolute_error(a, b) for a, b in zip(spec, out_ours)])
    np.testing.assert_allclose(mae_ours, mae_ref, atol=1e-4)


def test_all_eight_fixtures_convert(rng):
    """Every committed fixture converts and runs."""
    from rankaae_tpu.models.inference import InferenceModel
    from rankaae_tpu.utils.torch_import import import_reference_checkpoint

    from tests.conftest import import_reference_sc

    import_reference_sc()
    spec = rng.normal(size=(4, 256)).astype(np.float32)
    for i in range(1, 9):
        params, stats, cfg = import_reference_checkpoint(
            f"/root/reference/sc/tests/data/training/job_{i}/final.pt"
        )
        model = InferenceModel(params, stats, cfg)
        z = model.encode(spec)
        assert z.shape == (4, 6) and np.all(np.isfinite(z))


def test_bundle_roundtrip_via_import(tmp_path, reference_model, rng):
    from rankaae_tpu.models.inference import InferenceModel
    from rankaae_tpu.utils.torch_import import import_reference_checkpoint

    out = str(tmp_path / "imported.mpk")
    import_reference_checkpoint(FIXTURE, out)
    model = InferenceModel.from_bundle(out)
    spec = rng.normal(size=(4, 256)).astype(np.float32)
    assert model.encode(spec).shape == (4, 6)


def test_conv_family_checkpoint_conversion(rng):
    """Round-trip a freshly-built reference conv checkpoint (Encoder/Decoder)
    through the converter: outputs must match torch pointwise."""
    from tests.conftest import import_reference_sc

    import_reference_sc()
    import sc.clustering.model as ref_model

    from rankaae_tpu.models.inference import InferenceModel
    from rankaae_tpu.utils.torch_import import convert_reference_model

    torch.manual_seed(0)
    tenc = ref_model.Encoder(nstyle=6)
    tdec = ref_model.Decoder(nstyle=6, last_layer_activation="Softplus")
    # warm BN running stats
    tenc.train(), tdec.train()
    tenc(torch.randn(16, 256))
    tdec(torch.randn(16, 6))
    tenc.eval(), tdec.eval()

    params, stats, cfg = convert_reference_model({"Encoder": tenc, "Decoder": tdec})
    assert cfg.ae_form == "normal" and cfg.nstyle == 6
    ours = InferenceModel(params, stats, cfg)

    spec = rng.normal(size=(4, 256)).astype(np.float32)
    z_ref = tenc(torch.tensor(spec)).detach().numpy()
    np.testing.assert_allclose(ours.encode(spec), z_ref, atol=3e-4)

    z = rng.normal(size=(4, 6)).astype(np.float32)
    s_ref = tdec(torch.tensor(z)).detach().numpy()
    np.testing.assert_allclose(ours.decode(z), s_ref, atol=3e-4)


def test_compact_family_checkpoint_conversion(rng):
    from tests.conftest import import_reference_sc

    import_reference_sc()
    import sc.clustering.model as ref_model

    from rankaae_tpu.models.inference import InferenceModel
    from rankaae_tpu.utils.torch_import import convert_reference_model

    torch.manual_seed(1)
    tenc = ref_model.CompactEncoder(nstyle=5)
    tdec = ref_model.CompactDecoder(nstyle=5, last_layer_activation="ReLu")
    tenc.train(), tdec.train()
    tenc(torch.randn(16, 256))
    tdec(torch.randn(16, 5))
    tenc.eval(), tdec.eval()

    params, stats, cfg = convert_reference_model({"Encoder": tenc, "Decoder": tdec})
    assert cfg.ae_form == "compact" and cfg.decoder_activation == "ReLu"
    ours = InferenceModel(params, stats, cfg)

    spec = rng.normal(size=(4, 256)).astype(np.float32)
    np.testing.assert_allclose(
        ours.encode(spec), tenc(torch.tensor(spec)).detach().numpy(), atol=3e-4
    )

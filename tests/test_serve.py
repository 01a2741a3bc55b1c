"""Batched serving path: pad-and-chunk inference through fixed shapes."""
import os

import numpy as np

import jax

from rankaae_tpu.models.inference import InferenceModel
from rankaae_tpu.serve import BatchedInference, main as serve_main
from rankaae_tpu.train.trainer import RankAAETrainer
from rankaae_tpu.utils.checkpoint import save_model_bundle
from tests.test_trainer import _tiny_cfg


def _model(dim=256):
    cfg = _tiny_cfg(dim_in=dim, dim_out=dim)
    trainer = RankAAETrainer(cfg, 192, 64)
    s = trainer.init_state(jax.random.PRNGKey(0))
    return InferenceModel(s.params, s.batch_stats, cfg), s, cfg


def test_chunked_equals_whole(rng):
    model, _, cfg = _model(dim=64)
    serve = BatchedInference(model, batch_size=32)
    # a size that is NOT a batch multiple
    spec = rng.normal(size=(77, 64)).astype(np.float32)
    chunked = serve.encode(spec)
    whole = model.encode(spec)
    np.testing.assert_allclose(chunked, whole, atol=1e-5)
    recon = serve.reconstruct(spec)
    assert recon.shape == (77, 64)
    # the fused single-dispatch reconstruct == decode(encode(.))
    np.testing.assert_allclose(
        recon, serve.decode(serve.encode(spec)), atol=1e-5)
    # deep in-flight pipeline window and a window larger than the chunk
    # count both preserve exactness and row order
    for in_flight in (1, 50):
        np.testing.assert_allclose(
            BatchedInference(model, batch_size=32,
                             in_flight=in_flight).encode(spec),
            whole, atol=1e-5)


def test_serve_cli(tmp_path, synthetic_csv, rng):
    model, s, cfg = _model(dim=256)
    bundle = str(tmp_path / "m.mpk")
    save_model_bundle(bundle, s.params, s.batch_stats, cfg)
    out = str(tmp_path / "out")
    serve_main([bundle, synthetic_csv, out, "--batch-size", "256"])
    styles = np.loadtxt(out + "_styles.txt")
    recon = np.loadtxt(out + "_recon.txt")
    assert styles.shape == (800, cfg.nstyle)
    assert recon.shape == (800, 256)
    assert np.all(np.isfinite(styles))

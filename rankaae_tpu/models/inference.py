"""Eval-mode inference handle over a trained model bundle.

The report layer's analog of the reference's pickled-module dict
(``torch.load(final.pt)`` -> {"Encoder", "Decoder", "Style Discriminator"},
``sc/report/analysis.py:117-121``): rebuilds the Flax modules from the saved
config and exposes jitted eval-mode ``encode``/``decode``/``discriminate``.

Compiled appliers are cached per config, with parameters passed as call
arguments — evaluating N trained trials of the same architecture (the
report stage loads every ``job_*/final.mpk``) compiles each forward ONCE,
not N times.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from rankaae_tpu.models.registry import build_autoencoder, build_discriminator
from rankaae_tpu.utils.checkpoint import load_model_bundle
from rankaae_tpu.utils.config import TrainConfig


def _eval_f32(apply_fn):
    """Jitted eval forward pinned to float32 activations.

    The activation dtype is a process-level knob read at trace time
    (``primitives.get_activation_dtype``); inference/report forwards always
    run parity-exact f32 even when the same process trained at bf16."""
    def inner(*args):
        from rankaae_tpu.models.primitives import activation_dtype_scope

        with activation_dtype_scope("float32"):
            return apply_fn(*args)

    return jax.jit(inner)


@functools.lru_cache(maxsize=None)
def _appliers(cfg: TrainConfig):
    """Per-config jitted eval forwards taking variables as arguments (shared
    across all InferenceModel instances of that config)."""
    encoder, decoder = build_autoencoder(cfg)
    discriminator = build_discriminator(cfg)
    return {
        "enc": _eval_f32(lambda v, x: encoder.apply(v, x, train=False)),
        # `g` is the deployment amplitude gain (amp_recalibrate /
        # manifest `amp_gain`); the division fuses into the decoder's
        # final elementwise ops, so the g == 1 common case costs nothing
        # measurable and no applier recompiles when the gain changes.
        "dec": _eval_f32(lambda v, z, g: decoder.apply(v, z, train=False) / g),
        "dis": _eval_f32(lambda v, z: discriminator.apply(v, z, None, train=False)),
        # fused encode->decode: one device dispatch per reconstruction batch
        # (the serving pipeline's hot path — halves per-batch dispatches vs
        # chaining the two jitted calls)
        "recon": _eval_f32(lambda vs, x, g: decoder.apply(
            vs[1], encoder.apply(vs[0], x, train=False), train=False) / g),
    }


class InferenceModel:
    """Jitted eval-mode forward passes for a trained (encoder, decoder,
    discriminator) triple."""

    def __init__(self, params: Dict[str, Any], batch_stats: Dict[str, Any],
                 cfg: TrainConfig, out_gain: float = 1.0):
        self.cfg = cfg
        self.params = params
        self.batch_stats = batch_stats
        self.nstyle = cfg.nstyle
        # deployment amplitude calibration (amp_recalibrate): decoder
        # outputs are divided by this gain.  jnp scalar so it is a traced
        # argument of the cached appliers, not a recompile trigger.
        self.out_gain = float(out_gain)
        self._gain = jnp.float32(self.out_gain)
        self._fns = _appliers(cfg)

    def _vars(self, role):
        v = {"params": self.params[role]}
        if self.batch_stats.get(role):
            v["batch_stats"] = self.batch_stats[role]
        return v

    @classmethod
    def from_bundle(cls, path: str) -> "InferenceModel":
        params, batch_stats, cfg, extra = load_model_bundle(path)
        return cls(params, batch_stats, cfg,
                   out_gain=float(extra.get("amp_gain", 1.0)))

    # raw jnp-returning appliers (used by the batched serving path)
    def _encode(self, x):
        return self._fns["enc"](self._vars("enc"), x)

    def _decode(self, z):
        return self._fns["dec"](self._vars("dec"), z, self._gain)

    def _reconstruct(self, x):
        return self._fns["recon"]((self._vars("enc"), self._vars("dec")), x,
                                  self._gain)

    def encode(self, spec) -> np.ndarray:
        return np.asarray(self._encode(jnp.asarray(spec, jnp.float32)))

    def decode(self, z) -> np.ndarray:
        return np.asarray(self._decode(jnp.asarray(z, jnp.float32)))

    def discriminate(self, z) -> np.ndarray:
        if not self.params.get("dis"):
            raise ValueError("this bundle has no discriminator parameters")
        return np.asarray(self._fns["dis"](self._vars("dis"),
                                           jnp.asarray(z, jnp.float32)))

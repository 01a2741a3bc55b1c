"""Eval-mode inference handle over a trained model bundle.

The report layer's analog of the reference's pickled-module dict
(``torch.load(final.pt)`` -> {"Encoder", "Decoder", "Style Discriminator"},
``sc/report/analysis.py:117-121``): rebuilds the Flax modules from the saved
config and exposes jitted eval-mode ``encode``/``decode``/``discriminate``.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from rankaae_tpu.models.registry import build_autoencoder, build_discriminator
from rankaae_tpu.utils.checkpoint import load_model_bundle
from rankaae_tpu.utils.config import TrainConfig


class InferenceModel:
    """Jitted eval-mode forward passes for a trained (encoder, decoder,
    discriminator) triple."""

    def __init__(self, params: Dict[str, Any], batch_stats: Dict[str, Any],
                 cfg: TrainConfig):
        self.cfg = cfg
        self.params = params
        self.batch_stats = batch_stats
        self.encoder, self.decoder = build_autoencoder(cfg)
        self.discriminator = build_discriminator(cfg)
        self.nstyle = cfg.nstyle

        def _vars(role, module):
            v = {"params": params[role]}
            if batch_stats.get(role):
                v["batch_stats"] = batch_stats[role]
            return v

        self._encode = jax.jit(
            lambda x: self.encoder.apply(_vars("enc", self.encoder), x, train=False)
        )
        self._decode = jax.jit(
            lambda z: self.decoder.apply(_vars("dec", self.decoder), z, train=False)
        )
        if params.get("dis"):
            self._discriminate = jax.jit(
                lambda z: self.discriminator.apply(
                    _vars("dis", self.discriminator), z, None, train=False
                )
            )
        else:
            # imported legacy checkpoints may lack a convertible discriminator
            self._discriminate = None

    @classmethod
    def from_bundle(cls, path: str) -> "InferenceModel":
        params, batch_stats, cfg, _ = load_model_bundle(path)
        return cls(params, batch_stats, cfg)

    def encode(self, spec) -> np.ndarray:
        return np.asarray(self._encode(jnp.asarray(spec, jnp.float32)))

    def decode(self, z) -> np.ndarray:
        return np.asarray(self._decode(jnp.asarray(z, jnp.float32)))

    def discriminate(self, z) -> np.ndarray:
        if self._discriminate is None:
            raise ValueError("this bundle has no discriminator parameters")
        return np.asarray(self._discriminate(jnp.asarray(z, jnp.float32)))

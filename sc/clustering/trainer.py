"""Shim for ``sc.clustering.trainer``."""
from rankaae_tpu.train.facade import Trainer  # noqa: F401

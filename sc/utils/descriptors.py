"""Shim for ``sc.utils.descriptors``."""
from rankaae_tpu.utils.descriptors import SpecDescriptors  # noqa: F401

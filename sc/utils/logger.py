"""Shim for ``sc.utils.logger``."""
from rankaae_tpu.utils.logging import create_logger  # noqa: F401

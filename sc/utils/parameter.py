"""Shim for ``sc.utils.parameter`` (reference ``sc/utils/parameter.py``)."""
from rankaae_tpu.models.registry import AE_FORMS as AE_CLS_DICT  # noqa: F401
from rankaae_tpu.optim.optimizers import OPTIMIZERS as OPTIM_DICT  # noqa: F401
from rankaae_tpu.utils.config import Parameters  # noqa: F401

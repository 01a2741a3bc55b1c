from rankaae_tpu.optim.optimizers import OPTIMIZERS, Optimizer, make_optimizer  # noqa: F401
from rankaae_tpu.optim.plateau import PlateauState, plateau_init, plateau_update  # noqa: F401

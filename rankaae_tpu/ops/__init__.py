from rankaae_tpu.ops.losses import (  # noqa: F401
    adversarial_loss,
    alpha_schedule,
    discriminator_loss,
    generator_loss,
    mutual_info_loss,
    recon_loss,
    smoothness_loss,
)
from rankaae_tpu.ops.kendall import kendall_constraint  # noqa: F401
from rankaae_tpu.ops.stats import shapiro_w, spearman_rho, max_interstyle_spearman  # noqa: F401

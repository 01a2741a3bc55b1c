from rankaae_tpu.report import analysis  # noqa: F401
from rankaae_tpu.report.analysis import (  # noqa: F401
    evaluate_all_models,
    evaluate_model,
    plot_spectra_variation,
    sort_all_models,
)
from rankaae_tpu.report.generate_report import plot_report, sorting_algorithm  # noqa: F401
from rankaae_tpu.report.curves import LossCurvePlotter, Reconstruct  # noqa: F401

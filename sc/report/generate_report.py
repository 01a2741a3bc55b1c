"""Shim for ``sc.report.generate_report``."""
from rankaae_tpu.report.generate_report import (  # noqa: F401
    main,
    plot_report,
    save_evaluation_result,
    save_model_evaluations,
    save_model_selection_plot,
    sorting_algorithm,
)

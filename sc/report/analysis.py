"""Shim for ``sc.report.analysis``."""
from rankaae_tpu.report.analysis import (  # noqa: F401
    create_plotly_colormap,
    evaluate_all_models,
    evaluate_model,
    get_confusion_matrix,
    get_descriptor_style_correlation,
    get_max_inter_style_correlation,
    load_evaluations,
    plot_spectra_variation,
    qqplot_normal,
    sort_all_models,
)

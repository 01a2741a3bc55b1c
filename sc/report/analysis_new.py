"""Shim for ``sc.report.analysis_new``."""
from rankaae_tpu.report.curves import (  # noqa: F401
    Evaluator,
    EvaluatorAll,
    LossCurvePlotter,
    Reconstruct,
    Reporter,
    SpectraVariationEvaluator,
)
from rankaae_tpu.report.analysis import create_plotly_colormap  # noqa: F401

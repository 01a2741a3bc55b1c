"""Reconstruct dumps and loss-curve plotting
(reference ``sc/report/analysis_new.py:94-129,246-280``)."""
from __future__ import annotations

import os
from typing import Dict

import numpy as np
import pandas as pd

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from rankaae_tpu.models.inference import InferenceModel  # noqa: E402


class Reconstruct:
    """Evaluator writing ``<name>_spec_in/out/styles.txt`` dumps
    (reference ``analysis_new.py:94-129``)."""

    def __init__(self, name: str = "reconstructed"):
        self.name = name
        self.result: Dict[str, np.ndarray] = {}
        self.metadata: Dict[str, str] = {}

    def evaluate(self, test_ds, model: InferenceModel, path_to_save=None):
        self.metadata.update({"name": self.name, "data": test_ds.metadata["path"]})
        spec_in = np.asarray(test_ds.spec, np.float32)
        styles = model.encode(spec_in)
        self.result.update(
            {"input": spec_in, "styles": styles, "output": model.decode(styles)}
        )
        if path_to_save is not None:
            self.to_file(path_to_save)

    def to_file(self, path_to_save):
        base = os.path.join(path_to_save, self.name)
        np.savetxt(base + "_spec_in.txt", self.result["input"])
        np.savetxt(base + "_spec_out.txt", self.result["output"])
        np.savetxt(base + "_styles.txt", self.result["styles"])


class LossCurvePlotter:
    """6 stacked train/val loss subplots parsed from losses.csv
    (reference ``analysis_new.py:246-280``; our CSV is byte-compatible)."""

    def __init__(self):
        self.loss_names = ["D", "G", "Aux", "Recon", "Smooth", "Mutual_Info"]
        self.loss_dict = {name: {} for name in self.loss_names}
        self.epochs = None

    def _load_losses(self, file_path):
        df = pd.read_csv(file_path, index_col=False, delimiter=",",
                         usecols=range(13))
        self.loss_df = df
        self.epochs = df.iloc[:, 0].to_numpy()
        for name in self.loss_names:
            self.loss_dict[name]["Train"] = df.loc[:, f"Train_{name}"].to_numpy()
            self.loss_dict[name]["Val"] = df.loc[:, f"Val_{name}"].to_numpy()

    def plot_loss_curve(self, file_path):
        self._load_losses(file_path)
        fig, axs = plt.subplots(6, 1, figsize=(6, 15), dpi=150)
        for i, (name, loss) in enumerate(self.loss_dict.items()):
            axs[i].plot(self.epochs, loss["Train"],
                        label=f"Train:{loss['Train'][-10:].mean():.4f}", lw=0.8, alpha=1)
            axs[i].plot(self.epochs, loss["Val"],
                        label=f"Val:{loss['Val'][-10:].mean():.4f}", lw=0.8, alpha=0.5)
            axs[i].set_title(name, y=1.0, pad=-14)
            axs[i].tick_params(axis="both", direction="in")
            axs[i].legend()
        return fig


class SpectraVariationEvaluator:
    """OO wrapper over the decoder style sweep
    (reference ``analysis_new.py:166-243``)."""

    def __init__(self, n_spec=50, n_sampling=1000, amplitude=2.0):
        self.n_spec = n_spec
        self.n_sampling = n_sampling
        self.amplitude = amplitude
        self.styles = None
        self.istyle = None
        self.model: InferenceModel | None = None
        self.result = None

    def evaluate(self, istyle: int, true_range: bool = True, seed: int = 0):
        from rankaae_tpu.report.analysis import plot_spectra_variation

        assert self.model is not None, "set .model (InferenceModel) first"
        _, spec_out = plot_spectra_variation(
            self.model, istyle,
            n_spec=self.n_spec,
            n_sampling=self.n_sampling or 0,
            true_range=true_range,
            styles=self.styles,
            amplitude=self.amplitude,
            seed=seed,
        )
        self.result = spec_out
        self.istyle = istyle
        return spec_out

    def plot(self, ax=None, energy_grid=None):
        from rankaae_tpu.report.analysis import create_plotly_colormap

        assert self.istyle is not None, "Please evaluate first!"
        colors = create_plotly_colormap(self.n_spec)
        fig = None
        if ax is None:
            fig, ax = plt.subplots(figsize=(8, 6))
        for spec, color in zip(self.result, colors):
            if energy_grid is None:
                ax.plot(spec, lw=0.8, c=color)
            else:
                ax.plot(energy_grid, spec, lw=0.8, c=color)
        ax.set_title(f"Varying Style #{self.istyle+1}", y=1)
        return fig

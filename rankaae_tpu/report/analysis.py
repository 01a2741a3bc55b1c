"""Model evaluation and selection — host-side analysis over trained bundles.

Behavioral spec: reference ``sc/report/analysis.py``.  Heavy forwards
(full-split encodes, the 50 x n_sampling decoder sweep) run jitted on device
through :class:`rankaae_tpu.models.inference.InferenceModel`; statistics and
plots stay on host (numpy/scipy/sklearn/matplotlib — same as the reference).
"""
from __future__ import annotations

import dataclasses
import math
import os
import pickle
from typing import Dict, List, Optional

import numpy as np
from numpy.polynomial import Polynomial
from scipy import stats
from scipy.interpolate import interp1d
from scipy.stats import shapiro, spearmanr
from sklearn.metrics import confusion_matrix, f1_score, mean_absolute_error

import matplotlib

matplotlib.use("Agg")
import matplotlib as mpl  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402
import seaborn as sns  # noqa: E402

from rankaae_tpu.models.inference import InferenceModel  # noqa: E402

# plotly.express.colors.sequential.Plotly3 hex values (public colormap data;
# plotly itself is not a dependency — reference analysis.py:20-30 interpolates
# these into an n-color map)
_PLOTLY3 = [
    "#0508b8", "#1910d8", "#3c19f0", "#6b1cfb", "#981cfd", "#bf1cfd",
    "#dd2bfd", "#f246fe", "#fc67fd", "#fe88fc", "#fea5fd", "#febefe",
    "#fec3fe",
]


def create_plotly_colormap(n_colors: int) -> List[str]:
    """Cubic-interpolated Plotly3 colormap (reference ``analysis.py:20-30``)."""
    rgb = np.array(
        [[int(f"0x{h[i:i+2]}", 16) for i in range(1, 7, 2)] for h in _PLOTLY3]
    )
    x0 = np.linspace(1, n_colors, rgb.shape[0])
    x1 = np.linspace(1, n_colors, n_colors)
    target = np.stack(
        [interp1d(x0, rgb[:, i], kind="cubic")(x1) for i in range(3)]
    ).T.round().astype(int)
    return ["#" + "".join(f"{c:02x}" for c in row) for row in target]


def plot_spectra_variation(
    model: InferenceModel,
    istyle: int,
    n_spec: int = 50,
    n_sampling: int = 1000,
    true_range: bool = True,
    styles: Optional[np.ndarray] = None,
    amplitude: float = 2.0,
    ax=None,
    energy_grid=None,
    colors=None,
    plot_residual: bool = False,
    seed: int = 0,
    **kwargs,
):
    """Decoder sweep over one style (reference ``analysis.py:33-103``):
    vary style ``istyle`` across its [5th, 95th] percentile over ``n_spec``
    values; other styles ~ N(0,1) MC-averaged over ``n_sampling`` draws
    (or zeroed when ``n_sampling == 0``).  One batched device decode."""
    nstyle = model.nstyle
    if true_range:
        left, right = np.percentile(styles[:, istyle], [5, 95])
    else:
        left, right = -amplitude, amplitude

    rng = np.random.default_rng(seed)
    if n_sampling == 0:
        c = np.linspace(left, right, n_spec, dtype=np.float32)
        con_c = np.zeros((n_spec, nstyle), np.float32)
        con_c[:, istyle] = c
        spec_out = model.decode(con_c)
        style_variation = c
    else:
        con_c = rng.standard_normal((n_spec, n_sampling, nstyle)).astype(np.float32)
        style_variation = np.linspace(left, right, n_spec, dtype=np.float32)
        con_c[..., istyle] = style_variation[:, None]
        spec_out = model.decode(con_c.reshape(n_spec * n_sampling, nstyle))
        spec_out = spec_out.reshape(n_spec, n_sampling, -1).mean(axis=1)

    if ax is not None:
        if colors is None:
            colors = create_plotly_colormap(n_spec)
        assert len(colors) == n_spec
        for spec, color in zip(spec_out, colors):
            if energy_grid is None:
                ax.plot(spec, c=color, **kwargs)
            elif plot_residual:
                ax.plot(energy_grid, spec_out[-1] - spec_out[0], **kwargs)
                ax.set_ylim([-0.5, 0.5])
                break
            else:
                ax.plot(energy_grid, spec, c=color, **kwargs)
        ax.set_title(f"Style {istyle+1} varying from {left:.2f} to {right:.2f}", y=1)

    return style_variation, spec_out


def _f1_threshold_scan(style, positive, thresh_grid, direction):
    """Vectorized F1(threshold) for predictions ``style < th`` (direction
    "lt") or ``style > th`` ("gt") against a boolean ``positive`` mask.

    Equivalent to looping sklearn ``f1_score(pred(th), positive,
    zero_division=0)`` over the grid (the reference computes 700 x 2 such
    scores per model through the Python/sklearn path,
    ``analysis.py:250-251``); this is O(n log n + T) with cumulative counts.
    Note the reference's argument order makes ``pred`` the sklearn
    ``y_true`` — F1 is symmetric in TP but swaps FP/FN; matched exactly.
    """
    order = np.argsort(style, kind="stable")
    sorted_style = style[order]
    cum_pos = np.concatenate([[0], np.cumsum(positive[order])])
    total_pos = int(positive.sum())
    # number of samples with style < th
    counts = np.searchsorted(sorted_style, thresh_grid, side="left")
    tp_lt = cum_pos[counts]                     # positive & (style < th)
    if direction == "lt":
        tp = tp_lt
        pred_n = counts
    else:
        # side="right" counts style <= th, so the complement is style > th
        counts_le = np.searchsorted(sorted_style, thresh_grid, side="right")
        tp = total_pos - cum_pos[counts_le]
        pred_n = len(style) - counts_le
    fp = pred_n - tp
    fn = total_pos - tp
    denom = 2 * tp + fp + fn
    with np.errstate(invalid="ignore", divide="ignore"):
        f1 = np.where(denom > 0, 2 * tp / np.maximum(denom, 1), 0.0)
    return f1


def get_confusion_matrix(cn, style_cn, ax=None) -> Optional[Dict]:
    """CN classifier from one style: scan 700 thresholds in [-3.5, 3.5] for
    the max-F1 CN4/5 and CN5/6 splits; weighted F1 + 3x3 confusion matrix
    (reference ``analysis.py:234-311``)."""
    result = {"F1 score": None, "CN45 Threshold": None, "CN56 Threshold": None}
    thresh_grid = np.linspace(-3.5, 3.5, 700)
    style_cn = np.asarray(style_cn)
    cn_classes = (np.asarray(cn) - 4).astype(int)
    cn_class_sets = sorted(set(cn_classes.tolist()))
    if len(cn_class_sets) > 3:  # descriptor is not CN-like (noise)
        return None

    cn4_f1 = _f1_threshold_scan(style_cn, cn_classes < 1, thresh_grid, "lt")
    cn6_f1 = _f1_threshold_scan(style_cn, cn_classes > 1, thresh_grid, "gt")
    cn45 = thresh_grid[int(np.argmax(cn4_f1))]
    cn56 = thresh_grid[int(np.argmax(cn6_f1))]

    pred = (style_cn > cn45).astype(int) + (style_cn > cn56).astype(int)
    cm = confusion_matrix(cn_classes, pred)
    if len(cn_class_sets) == 1:
        c = int(cn_class_sets[0])
        full = np.zeros((3, 3), int)
        full[c, c] = cm[0, 0]
        cm = full
    f1w = f1_score(cn_classes, pred, average="weighted")

    result["F1 score"] = round(float(f1w), 4)
    result["CN45 Threshold"] = round(float(cn45), 4)
    result["CN56 Threshold"] = round(float(cn56), 4)

    if ax is not None:
        sns.set_palette("bright", 2)
        ax[0].plot(thresh_grid, cn4_f1, label="CN4")
        ax[0].plot(thresh_grid, cn6_f1, label="CN6")
        ax[0].axvline(cn45, c="blue")
        ax[0].axvline(cn56, c="orange")
        ax[0].legend(loc="lower left", fontsize=12)

        sns.heatmap(cm, cmap="Blues", annot=True, fmt="d", cbar=False, ax=ax[1],
                    xticklabels=[f"CN{c+4}" for c in range(3)],
                    yticklabels=[f"CN{c+4}" for c in range(3)])
        ax[1].set_title(f"F1 Score = {f1w:.1%}", fontsize=12)
        ax[1].set_xlabel("Pred")
        ax[1].set_ylabel("True")

        colors = np.array(sns.color_palette("bright", 3))
        test_colors = np.array(
            [mpl.colors.colorConverter.to_rgba(c, alpha=0.6) for c in colors[cn_classes]]
        )
        rand_y = np.random.uniform(style_cn.min(), style_cn.max(), len(cn_classes))
        ax[2].scatter(style_cn, rand_y, s=10.0, color=test_colors, alpha=0.8)
        ax[2].set_xlabel("Style 2")
        ax[2].set_ylabel("Random")
        ax[2].set_xlim([style_cn.min() - 1, style_cn.max() + 1])
        ax[2].set_ylim([style_cn.min() - 2, style_cn.max() + 1])
        ax[2].axvline(cn45, c="gray")
        ax[2].axvline(cn56, c="gray")

    return result


def get_max_inter_style_correlation(styles) -> float:
    """max |spearman(style_i, style_last)| (reference ``analysis.py:313-325``
    — note: each style vs the *last* style only, not all pairs)."""
    corr = [
        math.fabs(spearmanr(styles[:, i], styles[:, -1]).correlation)
        for i in range(styles.shape[1] - 1)
    ]
    return round(max(corr), 4)


def get_descriptor_style_correlation(
    style, descriptor, ax=None, choice=("R2", "Spearman"), fit=True
) -> Dict:
    """Linear R^2, Spearman rho, optional quadratic fit between one style and
    one descriptor, NaN-masked (reference ``analysis.py:328-391``)."""
    order = np.argsort(style)
    style = np.asarray(style)[order]
    descriptor = np.asarray(descriptor)[order]
    mask = ~(np.isnan(descriptor) | np.isnan(style))
    style, descriptor = style[mask], descriptor[mask]

    accuracy = {
        "Spearman": None,
        "Linear": {"slope": None, "intercept": None, "R2": None},
        "Quadratic": {"Parameters": [None, None, None], "residue": None, "R2": None},
    }
    fitted = None
    if "R2" in choice:
        res = stats.linregress(style, descriptor)
        accuracy["Linear"]["R2"] = float(np.round(res.rvalue**2, 4))
        accuracy["Linear"]["intercept"] = float(np.round(res.intercept, 4))
        accuracy["Linear"]["slope"] = float(np.round(res.slope, 4))
        fitted = res.intercept + style * res.slope
    if "Spearman" in choice:
        accuracy["Spearman"] = float(np.round(spearmanr(style, descriptor).correlation, 4))
    if "Quadratic" in choice:
        p, info = Polynomial.fit(style, descriptor, 2, full=True)
        accuracy["Quadratic"]["Parameters"] = np.round(p.convert().coef, 4).tolist()
        accuracy["Quadratic"]["residue"] = float(np.round(info[0][0] / len(style), 4)) \
            if len(info[0]) else 0.0
        fitted = p(style)
        accuracy["Quadratic"]["R2"] = float(
            np.round(stats.linregress(fitted, descriptor).rvalue**2, 4)
        )

    if ax is not None:
        ax.scatter(style, descriptor, s=10.0, c="blue", edgecolors="none", alpha=0.8)
        if fit and fitted is not None:
            ax.plot(style, fitted, lw=2, c="black", alpha=0.5)

    return accuracy


def evaluate_model(test_ds, model: InferenceModel, reconstruct=True, accuracy=True,
                   style=True) -> Dict:
    """Per-model evaluation (reference ``analysis.py:394-450``): recon MAE
    mean/std per spectrum; per-descriptor correlation (CN via confusion/F1,
    others via R2+Spearman+quadratic); max inter-style Spearman."""
    descriptors = test_ds.aux
    result = {
        "Style-descriptor Corr": {},
        "Input": None,
        "Output": None,
        "Reconstruct Err": (None, None),
        "Inter-style Corr": None,
    }
    spec_in = np.asarray(test_ds.spec, np.float32)
    styles = model.encode(spec_in)
    result["Input"] = spec_in

    if reconstruct:
        spec_out = model.decode(styles)
        mae = [mean_absolute_error(s1, s2) for s1, s2 in zip(spec_in, spec_out)]
        result["Reconstruct Err"] = [
            round(float(np.mean(mae)), 4), round(float(np.std(mae)), 4)
        ]
        result["Output"] = spec_out

    if accuracy:
        for i in range(descriptors.shape[1]):
            if i == 1:  # CN
                result["Style-descriptor Corr"][i] = get_confusion_matrix(
                    descriptors[:, i], styles[:, i], ax=None
                )
            else:
                result["Style-descriptor Corr"][i] = get_descriptor_style_correlation(
                    descriptors[:, i], styles[:, i], ax=None,
                    choice=("R2", "Spearman", "Quadratic"),
                )

    if style:
        result["Inter-style Corr"] = get_max_inter_style_correlation(styles)

    return result


def evaluate_all_models(model_path: str, test_ds,
                        bundle_name: str = "final.mpk") -> Dict[str, Dict]:
    """Evaluate every ``job_*/<bundle_name>`` under ``model_path``
    (reference ``analysis.py:105-123`` over ``final.pt``).

    ``bundle_name="best_recon.mpk"`` (what ``use_best_checkpoint: true``
    passes) selects over each trial's best-reconstruction (min val recon
    MSE) model instead of the final-epoch snapshot — a net-new option: the
    final epoch is a lottery draw once the plateau schedulers freeze
    training (see PARITY_RESULTS_1500.md), and the reference's own
    best-checkpoint gate is dead code upstream.  ``best_tracked.mpk`` is
    the faithful min-COMBINED-metric record; note that criterion fires in
    the first ~100 epochs and its models reconstruct far worse."""
    import json

    result = {}
    for job in sorted(os.listdir(model_path)):
        if job.startswith("job_"):
            bundle = os.path.join(model_path, job, bundle_name)
            model = InferenceModel.from_bundle(bundle)
            result[job] = evaluate_model(test_ds, model)
            # surface swept hyperparameters in the selection report so the
            # winning trial identifies its configuration (lr-sweep runs);
            # the sidecar manifest carries them — no second payload load
            with open(bundle + ".json") as f:
                extra = json.load(f).get("extra", {})
            if "lr_scale" in extra:
                result[job]["lr_scale"] = extra["lr_scale"]
    return result


def load_evaluations(evaluation_path="./report_model_evaluations.pkl"):
    with open(evaluation_path, "rb") as f:
        return pickle.load(f)


# Heatmap row labels are an output contract with the reference's figures,
# including the reference's misspelling of the reconstruction-error row
# ("Reconstuction Err", reference analysis.py:137) — kept verbatim so
# selection heatmaps diff cleanly against reference-generated ones.
SELECTION_COLUMNS = (
    "Inter-style Corr",
    "Reconstuction Err",
    "Style_1 - CT Corr",
    "Style_2 - CN Corr",
    "Style_3 - OCN Corr",
    "Style_4 - Rstd Corr",
    "Style_5 - OO Corr",
)


@dataclasses.dataclass
class ModelSelection:
    """The ranked trial-selection table: raw metric matrix, its per-column
    z-standardization, the scalar selection score, and the display order."""

    jobs: np.ndarray       # (n,) job names
    raw: np.ndarray        # (n, 7) metric matrix in SELECTION_COLUMNS order
    z: np.ndarray          # (n, 7) z-scores (failed rows zeroed)
    final: np.ndarray      # (n,) selection score per job
    failed: np.ndarray     # (n,) bool — non-finite metrics (diverged trial)
    col_mean: np.ndarray   # (7,) per-column mean over healthy trials
    col_std: np.ndarray    # (7,) per-column std over healthy trials
    order: np.ndarray      # (n,) row indices, display order (failed last)

    def take(self, attr: str) -> np.ndarray:
        return getattr(self, attr)[self.order]


def _metric_row(result: Dict) -> list:
    """One job's metrics in SELECTION_COLUMNS order.  Missing correlation
    entries count as 0 (a style that never produced a usable fit)."""
    row = [result["Inter-style Corr"], result["Reconstruct Err"][0]]
    for i in range(5):
        try:
            entry = result["Style-descriptor Corr"][i]
            row.append(entry["F1 score"] if i == 1 else entry["Spearman"])
        except (KeyError, TypeError):
            row.append(0)
    return row


def select_models(result_dict, sort_score=None, ascending=True) -> ModelSelection:
    """Build the selection table: standardize columns over healthy trials,
    apply the scoring rule, and order jobs for display.

    Failure masking (net-new vs the reference; SURVEY.md §5 failure-detection
    row): trials with non-finite metrics are excluded from the column
    statistics, zeroed in the z matrix, and ALWAYS ordered last regardless of
    sort direction.
    """
    jobs = np.array(list(result_dict.keys()))
    raw = np.array([_metric_row(r) for r in result_dict.values()], dtype=float)

    failed = ~np.isfinite(raw).all(axis=1)
    healthy = raw[~failed] if (~failed).any() else np.zeros((1, raw.shape[1]))
    col_mean, col_std = healthy.mean(axis=0), healthy.std(axis=0)
    with np.errstate(invalid="ignore", divide="ignore"):
        z = (raw - col_mean) / col_std
    z[:, col_std == 0] = 0
    z[failed] = 0

    if callable(sort_score):
        final = np.asarray(sort_score(z), dtype=float)
    elif isinstance(sort_score, int) and sort_score >= 0:
        final = raw[:, sort_score]
    else:
        final = np.arange(len(raw), dtype=float)

    # order healthy jobs by score (direction per caller), then append the
    # failed / non-finite-scored ones — they can never win selection
    unusable = failed | ~np.isfinite(final)
    usable_idx = np.flatnonzero(~unusable)
    by_score = usable_idx[np.argsort(final[usable_idx])]
    if sort_score is not None and not ascending:
        by_score = by_score[::-1]
    order = np.concatenate([by_score, np.flatnonzero(unusable)])

    # the sentinel a failed trial reports as its Score: the worst value for
    # the effective direction (ascending -> +inf sorts last, else -inf)
    sentinel = np.inf if (sort_score is None or ascending) else -np.inf
    final = np.where(unusable, sentinel, final)
    return ModelSelection(jobs=jobs, raw=raw, z=z, final=final, failed=failed,
                          col_mean=col_mean, col_std=col_std, order=order)


def selection_heatmap(sel: ModelSelection, top_n=None, true_value=True):
    """Render the top-n selection table as the reference-format seaborn
    heatmap (z-colored, annotated with raw or z values)."""
    n = len(sel.order) if top_n is None else min(top_n, len(sel.order))
    z_t = sel.take("z")[:n].T
    annot = sel.take("raw")[:n].T if true_value else z_t
    fig, ax = plt.subplots(figsize=(n, len(SELECTION_COLUMNS)))
    ax.autoscale(enable=True)
    sns.heatmap(
        z_t, vmin=-3, vmax=3, cmap="Blues", cbar=True, annot=annot, ax=ax,
        yticklabels=[f"{name}\n{m:.3f}+-{s:.3f}" for name, m, s
                     in zip(SELECTION_COLUMNS, sel.col_mean, sel.col_std)],
        xticklabels=[f"{job}: {score:.2f} " for job, score
                     in zip(sel.take("jobs")[:n], sel.take("final")[:n])],
    )
    ax.set_yticklabels(ax.get_yticklabels(), rotation=0)
    ax.set_xticklabels(ax.get_xticklabels(), rotation=45, ha="left", va="bottom")
    ax.tick_params(labelbottom=False, labeltop=True, axis="both", length=0,
                   labelsize=15)
    return fig


def sort_all_models(result_dict, sort_score=None, plot_score=False, ascending=True,
                    top_n=None, true_value=True):
    """Reference-compatible facade over :func:`select_models` +
    :func:`selection_heatmap` (behavior contract: ``analysis.py:130-231``):
    annotates each job with Rank/Score and returns
    (result_dict, ranked_jobs, fig)."""
    sel = select_models(result_dict, sort_score=sort_score, ascending=ascending)
    for i, (job, score) in enumerate(zip(sel.take("jobs"), sel.take("final"))):
        result_dict[job]["Rank"] = i
        result_dict[job]["Score"] = round(float(score), 4)
    fig = selection_heatmap(sel, top_n=top_n, true_value=true_value) \
        if plot_score else None
    return result_dict, sel.take("jobs"), fig


def qqplot_normal(x, ax=None, grid=True, seed=None):
    """Shapiro statistic + Q-Q plot against a sampled normal
    (reference ``analysis.py:453-476``)."""
    n = len(x)
    x_std = (x - x.mean()) / x.std()
    z_score = np.sort(x_std)
    rng = np.random.default_rng(seed)
    normal = rng.standard_normal(n)
    q_normal = np.quantile(normal, np.linspace(0, 1, n))
    stat = shapiro(z_score).statistic
    if ax is not None:
        ax.plot(q_normal, z_score, ls="", marker=".", color="k")
        ax.plot([q_normal.min(), q_normal.max()], [q_normal.min(), q_normal.max()],
                color="k", alpha=0.5)
        ax.grid(grid)
    return stat

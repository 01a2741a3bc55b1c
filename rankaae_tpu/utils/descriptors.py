"""Offline spectral-descriptor extraction (the tool that produced the
``AUX_*`` CSV columns).

Behavioral spec: reference ``sc/utils/descriptors.py:12-360``.  The reference
depends on an external ``pyfitit`` package via a hardcoded user path
(``descriptors.py:7-8``) and is imported by nothing in the training path
(SURVEY.md §2.10); this rebuild is pure numpy/scipy:

* spline fit of the spectrum (``from_spline``),
* absorption-edge position/slope via an arctan fit (scipy ``curve_fit``
  replaces pyfitit's ``findEfermiByArcTan``),
* main/secondary/last peak and main pit via ``scipy.signal.find_peaks``
  with quadratic refinement, curvatures from the second derivative,
* peak separations, pit-last spread, post-peak fluctuation,
* ``as_dict`` flattening with the reference's naming scheme.

Not on the training path — a preprocessing utility.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
from numpy.polynomial import Polynomial
from scipy.interpolate import UnivariateSpline
from scipy.optimize import curve_fit
from scipy.signal import find_peaks


def _arctan_step(x, x0, w, a, b):
    return a * (np.arctan((x - x0) / w) / np.pi + 0.5) + b


def fit_edge_arctan(grid: np.ndarray, spec: np.ndarray) -> Tuple[float, np.ndarray]:
    """Fit an arctan step to the absorption edge; returns (x0, fitted curve).

    Pure-scipy replacement for pyfitit ``findEfermiByArcTan``
    (reference descriptors.py:66).
    """
    x0_guess = grid[int(np.argmax(np.gradient(spec)))]
    w_guess = (grid[-1] - grid[0]) / 20
    a_guess = float(spec.max() - spec.min())
    b_guess = float(spec.min())
    try:
        popt, _ = curve_fit(
            _arctan_step, grid, spec,
            p0=[x0_guess, w_guess, a_guess, b_guess],
            maxfev=5000,
        )
    except RuntimeError:
        popt = [x0_guess, w_guess, a_guess, b_guess]
    return float(popt[0]), _arctan_step(grid, *popt)


class SpecDescriptors:
    """Spectral-feature extractor for one spectrum on a (fine) energy grid."""

    def __init__(self, grid: np.ndarray, spec: np.ndarray):
        self.grid = np.asarray(grid, float)
        self.spec = np.asarray(spec, float)
        self.spline: Optional[UnivariateSpline] = None
        self.arctan = None
        self._energy = None
        self.update()

    @property
    def descriptors(self) -> Dict[str, Dict]:
        return {
            "edge": {"position": None, "slope": None, "intensity": None},
            "main_peak": {"position": None, "intensity": None, "curvature": None},
            "pit": {"position": None, "intensity": None, "curvature": None},
            "last_peak": {"position": None, "intensity": None, "curvature": None},
            "sec_peak": {"position": None, "intensity": None, "curvature": None},
            "pre_peak": {"position": None, "intensity": None, "curvature": None},
            "other": {
                "main_last_separation": None, "main_pit_separation": None,
                "pit_last_spread": None, "pit_last_separation": None,
                "fluctuation": None,
            },
        }

    @classmethod
    def from_spline(cls, grid, spec, *, fine_grid, k=5, s=0.01) -> "SpecDescriptors":
        spl = UnivariateSpline(grid, spec, k=k, s=s)
        obj = cls(fine_grid, spl(fine_grid))
        obj.spline = spl
        return obj

    def update(self):
        for key, value in self.descriptors.items():
            self.__dict__[key] = value

    # ------------------------------------------------------------------ #
    # feature finders (reference descriptors.py:62-220)
    # ------------------------------------------------------------------ #

    def find_edge(self):
        x0, fitted = fit_edge_arctan(self.grid, self.spec)
        self.arctan = fitted
        pos_index = int(np.argmin(np.abs(self.grid - x0)))
        self.edge["position"] = self.grid[pos_index]
        self.edge["intensity"] = self.spec[pos_index]
        self.edge["slope"] = float(self._derivative(1)[pos_index])

    def find_main_peak(self, window=1, left=None, right=None,
                       width=(0, None), prominence=(0, None)):
        left = self.grid[0] if left is None else left
        right = self.grid[-1] if right is None else right
        try:
            peaks = self._peaks(height=1, left=left, right=right,
                                width=width, prominence=prominence[0] or 0)
            sorted_h = np.sort(peaks[:, -1])
            assert len(sorted_h) > 0
            if len(sorted_h) == 1 or (sorted_h[-1] - sorted_h[-2] < 0.2):
                # first peak unless another beats it by >= 0.2
                position = peaks[0, 0]
            else:
                position = peaks[np.argmax(peaks[:, -1]), 0]
        except (AssertionError, ValueError, IndexError):
            peaks = self._peaks(gradient=2, reverse=True, left=left, right=right)
            position = peaks[np.argmin(peaks[:, -1]), 0]
        self.main_peak["position"] = position
        sel = (self.grid >= position - window / 2) & (self.grid < position + window / 2)
        self.main_peak["intensity"] = self.spec[sel].mean()
        _, _, curvature, (g, f) = self._curve(guess=position, extremum="max", window=4)
        self.main_peak["curvature"] = curvature
        self._main_peak_curve = (g, f)

    def find_intensity_at_energy(self, energy, window=1):
        self._energy = round(energy, 1)
        if self._energy < 100:
            _energy = self._energy + self.edge["position"]
            self._energy_position = _energy
        else:
            _energy = self._energy
        sel = (self.grid >= _energy - window / 2) & (self.grid < _energy + window / 2)
        self.other[f"intensity_{self._energy:.1f}"] = self.spec[sel].mean()

    def find_main_pit(self, curvature_window=None):
        left = self.edge["position"] + 20
        pits = self._peaks(left=left, reverse=True)
        try:
            position = pits[np.argmin(pits[:, -1]), 0]
        except (ValueError, IndexError):
            sel = self.grid > left
            idx = int(np.argmin(self.spec[sel]))
            position = self.grid[sel][idx]
        position, intensity, curvature, _ = self._curve(
            guess=position, extremum="min", window=16
        )
        if curvature_window is not None:
            sel = (self.grid > position - curvature_window / 2) & (
                self.grid < position + curvature_window / 2
            )
            curvature = float(np.abs(self._derivative(2)[sel].mean()))
        self.pit["position"] = position
        self.pit["intensity"] = intensity
        self.pit["curvature"] = curvature

    def find_fluctuation(self):
        sel = self.grid > self.main_peak["position"]
        self.other["fluctuation"] = float(np.abs(self._derivative(2)[sel].mean()))

    def find_last_peak(self):
        left = self.pit["position"]
        peaks = self._peaks(left=left, prominence=0.01)
        try:
            position = peaks[0, 0]
        except IndexError:
            position = self.grid[-1]
        position, intensity, curvature, _ = self._curve(
            guess=position, extremum="max", window=6
        )
        self.last_peak["position"] = position
        self.last_peak["intensity"] = intensity
        self.last_peak["curvature"] = curvature

    def find_pit_last_spread(self):
        self.other["pit_last_spread"] = (
            self.last_peak["intensity"] - self.pit["intensity"]
        )

    def find_peak_separation(self):
        self.other["main_last_separation"] = (
            self.last_peak["position"] - self.main_peak["position"]
        )
        self.other["main_pit_separation"] = (
            self.pit["position"] - self.main_peak["position"]
        )

    def find_pre_peak(self):
        left = self.grid[0] + 3
        right = self.edge["position"]
        try:
            peaks = self._peaks(left=left, right=right - 1)
            position, intensity = peaks[np.argmax(peaks[:, -1]), 0], \
                peaks[np.argmax(peaks[:, -1]), -1]
        except (ValueError, IndexError):
            try:
                peaks = self._peaks(left=left, right=right - 3, reverse=True, gradient=2)
                position, intensity = peaks[np.argmax(peaks[:, 1]), 0], \
                    peaks[np.argmax(peaks[:, 1]), -1]
            except (ValueError, IndexError):
                position, intensity = None, 0
        self.pre_peak["position"] = position
        self.pre_peak["intensity"] = intensity

    def find_sec_peak(self):
        left = self.main_peak["position"] + 5
        right = self.pit["position"] - 2
        peaks_2nd = self._peaks(left=left, right=right, reverse=True, gradient=2,
                                prominence=0.003)
        try:
            i = np.argmax(peaks_2nd[:, -1])
            position, curvature, intensity = peaks_2nd[i]
        except (ValueError, IndexError):
            position = (self.main_peak["position"] + self.pit["position"]) / 2
            pos_index = int(np.argmin(np.abs(self.grid - position)))
            intensity = self.spec[pos_index]
            curvature = 0
        self.sec_peak["position"] = position
        self.sec_peak["intensity"] = intensity
        self.sec_peak["curvature"] = curvature

    def find_descriptors(self, features="all", energy=None):
        if "edge" in features or features == "all":
            self.find_edge()
        if "main_peak" in features or features == "all":
            self.find_main_peak()
        if "pit" in features or features == "all":
            self.find_main_pit()
        if "sec_peak" in features or features == "all":
            self.find_sec_peak()
        if "last" in features or features == "all":
            self.find_last_peak()
            self.find_pit_last_spread()
        if "peak_separation" in features or features == "all":
            self.find_peak_separation()
        if "pre_peak" in features or features == "all":
            self.find_pre_peak()
        if "fluctuation" in features or features == "all":
            self.find_fluctuation()
        if energy is not None:
            self.find_intensity_at_energy(energy)

    def as_dict(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for name, descriptor in self.__dict__.items():
            if name not in self.descriptors:
                continue
            for feature, value in descriptor.items():
                if name == "other" and value is not None:
                    display = f"{feature}"
                elif (name == "edge" and feature == "intensity") or value is None:
                    continue
                else:
                    display = f"{name}_{feature}"
                out[display] = value
        return out

    def plot(self, ax, vlines=(), hlines=()):
        ax.plot(self.grid, self.spec)
        if self.arctan is not None:
            ax.plot(self.grid, self.arctan, lw=0.5, color="g")
        for d in [self.edge, self.main_peak, self.pit, self.last_peak,
                  self.sec_peak, self.pre_peak]:
            if d.get("position") is not None and d.get("intensity") is not None:
                ax.plot(d["position"], d["intensity"], color="r", marker="o")
        for line in vlines:
            ax.axvline(line, color="k", alpha=0.5)
        for line in hlines:
            ax.axhline(line, color="k", alpha=0.5)

    # ------------------------------------------------------------------ #
    # internals (reference descriptors.py:290-360)
    # ------------------------------------------------------------------ #

    def _curve(self, guess=None, extremum=None, fit_range=None, window=4):
        if guess is not None:
            sel = (self.grid >= guess - window / 2) & (self.grid < guess + window / 2)
        elif fit_range is not None:
            sel = (self.grid >= fit_range[0]) & (self.grid < fit_range[1])
        else:
            sel = np.ones_like(self.grid, dtype=bool)
        grid = self.grid[sel]
        spec = self.spec[sel]

        poly = Polynomial.fit(grid, spec, 2)
        fit = poly(grid)
        if extremum == "max":
            idx = int(np.argmax(fit))
        elif extremum == "min":
            idx = int(np.argmin(fit))
        else:
            a = poly.convert().coef[2]
            idx = int(np.argmax(fit)) if a > 0 else int(np.argmin(fit))

        position = grid[idx]
        intensity = spec[idx]
        spec_d2 = np.gradient(np.gradient(spec))
        curvature = abs(spec_d2[idx])
        return position, intensity, curvature, (grid, fit)

    def _peaks(self, gradient=0, reverse=False, left=None, right=None,
               width=(0, None), height=0, prominence=0):
        width = list(width)
        step = self.grid[1] - self.grid[0]
        for i in (0, 1):
            width[i] = None if width[i] is None else width[i] / step

        spec = self._derivative(gradient) if gradient else self.spec
        if reverse:
            spec = -spec
        peak_indices, properties = find_peaks(
            spec, height=height, prominence=prominence, width=width
        )
        positions = self.grid[peak_indices]

        left = self.grid[0] if left is None else left
        right = self.grid[-1] if right is None else right
        sel = (positions >= left) & (positions <= right)
        if width[1] is not None:
            sel &= properties["widths"] < width[1]

        return np.stack(
            [self.grid[peak_indices][sel], spec[peak_indices][sel],
             self.spec[peak_indices][sel]], axis=1
        )

    def _derivative(self, n=1):
        if self.spline is not None:
            return self.spline.derivative(n=n)(self.grid)
        out = self.spec
        for _ in range(n):
            out = np.gradient(out, self.grid)
        return out

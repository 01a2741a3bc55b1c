"""Offline descriptor extraction on synthetic spectra with known ground truth."""
import numpy as np
import pytest

from rankaae_tpu.utils.descriptors import SpecDescriptors, fit_edge_arctan


def _synthetic_spectrum(edge_pos=5490.0, wl_pos=5500.0, pit_pos=5530.0,
                        last_pos=5550.0):
    grid = np.linspace(5460, 5570, 1100)  # fine grid
    spec = 0.5 + np.arctan((grid - edge_pos) / 2.0) / np.pi
    spec += 1.2 * np.exp(-0.5 * ((grid - wl_pos) / 3.0) ** 2)       # main peak
    spec -= 0.25 * np.exp(-0.5 * ((grid - pit_pos) / 5.0) ** 2)     # pit
    spec += 0.3 * np.exp(-0.5 * ((grid - last_pos) / 4.0) ** 2)     # last peak
    return grid, spec


def test_fit_edge_arctan_recovers_position():
    grid, spec = _synthetic_spectrum(edge_pos=5488.0)
    x0, fitted = fit_edge_arctan(grid, spec)
    # the white line biases the pure-arctan fit; a few eV is expected accuracy
    assert abs(x0 - 5488.0) < 5.0
    assert fitted.shape == grid.shape


def test_find_edge_and_peaks():
    grid, spec = _synthetic_spectrum()
    sd = SpecDescriptors.from_spline(grid[::4], spec[::4], fine_grid=grid, s=0.001)
    sd.find_edge()
    assert abs(sd.edge["position"] - 5490.0) < 5.0
    assert sd.edge["slope"] > 0

    sd.find_main_peak()
    assert abs(sd.main_peak["position"] - 5500.0) < 2.0
    assert sd.main_peak["intensity"] > 1.0
    assert sd.main_peak["curvature"] > 0

    sd.find_main_pit()
    assert abs(sd.pit["position"] - 5530.0) < 4.0

    sd.find_last_peak()
    assert abs(sd.last_peak["position"] - 5550.0) < 4.0

    sd.find_peak_separation()
    assert abs(sd.other["main_last_separation"] - 50.0) < 6.0
    assert sd.other["main_pit_separation"] > 0

    sd.find_pit_last_spread()
    assert sd.other["pit_last_spread"] > 0


def test_find_descriptors_all_and_as_dict():
    grid, spec = _synthetic_spectrum()
    sd = SpecDescriptors.from_spline(grid[::4], spec[::4], fine_grid=grid, s=0.001)
    sd.find_descriptors("all")
    d = sd.as_dict()
    assert "edge_position" in d
    assert "main_peak_intensity" in d
    assert "pit_position" in d
    assert "last_peak_position" in d
    assert "main_last_separation" in d
    assert "fluctuation" in d
    # edge intensity excluded by the reference naming rule (descriptors.py:250)
    assert "edge_intensity" not in d


def test_intensity_at_relative_energy():
    grid, spec = _synthetic_spectrum()
    sd = SpecDescriptors.from_spline(grid[::4], spec[::4], fine_grid=grid, s=0.001)
    sd.find_edge()
    sd.find_intensity_at_energy(10.0)  # < 100 -> relative to edge
    key = "intensity_10.0"
    assert key in sd.other and np.isfinite(sd.other[key])


def test_functional_core_and_batch_api():
    from rankaae_tpu.utils.descriptors import (
        SpectrumView, extract_descriptors, extract_descriptors_batch,
        flatten_descriptors,
    )

    grid, spec = _synthetic_spectrum()
    view = SpectrumView.build(grid, spec)
    nested = extract_descriptors(view)
    assert abs(nested["main_peak"]["position"] - 5500.0) < 2.0
    assert abs(nested["pit"]["position"] - 5530.0) < 4.0
    flat = flatten_descriptors(nested)
    assert "edge_intensity" not in flat and "edge_position" in flat

    # batch API over an (N, L) matrix; one garbage row must not abort it
    specs = np.stack([spec, spec * 1.1, np.zeros_like(spec)])
    rows = extract_descriptors_batch(grid, specs)
    assert len(rows) == 3
    assert abs(rows[0]["main_peak_position"] - 5500.0) < 2.0
    assert rows[1]["main_peak_intensity"] > rows[0]["main_peak_intensity"]


def test_plot_smoke():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    grid, spec = _synthetic_spectrum()
    sd = SpecDescriptors.from_spline(grid[::4], spec[::4], fine_grid=grid, s=0.001)
    sd.find_descriptors("all")
    fig, ax = plt.subplots()
    sd.plot(ax, vlines=[5500.0], hlines=[1.0])
    plt.close(fig)

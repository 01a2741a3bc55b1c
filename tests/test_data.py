"""Data-layer tests: schema, contiguous split semantics, batching."""
import numpy as np

from rankaae_tpu.data.dataset import (
    AuxSpectraDataset,
    epoch_batch_indices,
    load_split_arrays,
    split_sizes,
)


def test_split_sizes_contiguous_remainder():
    # reference dataloader.py:14-16 — int truncation, remainder to test
    assert split_sizes(7000, (0.7, 0.15, 0.15)) == (4900, 1050, 1050)
    assert split_sizes(801, (0.7, 0.15, 0.15)) == (560, 120, 121)


def test_load_split_arrays_schema(synthetic_csv):
    splits = load_split_arrays(synthetic_csv, (0.7, 0.15, 0.15), n_aux=5)
    n = sum(len(s) for s in splits.values())
    assert n == 800
    tr = splits["train"]
    assert tr.spec.shape == (560, 256)
    assert tr.aux.shape == (560, 5)
    assert tr.spec.dtype == np.float32
    assert tr.grid.shape == (256,)
    assert np.all(np.diff(tr.grid) > 0)
    # contiguity: val starts exactly where train ends
    assert len(splits["val"]) == 120 and len(splits["test"]) == 120


def test_splits_are_contiguous_slices(synthetic_csv):
    """Rows must be unshuffled contiguous slices of the CSV (parity-critical)."""
    import pandas as pd

    full = pd.read_csv(synthetic_csv, index_col=[0, 1], comment="#").to_numpy()
    splits = load_split_arrays(synthetic_csv, (0.7, 0.15, 0.15), n_aux=5)
    np.testing.assert_allclose(splits["train"].spec, full[:560, 5:], rtol=1e-6)
    np.testing.assert_allclose(splits["test"].spec, full[560 + 120:, 5:], rtol=1e-6)


def test_dataset_facade(synthetic_csv):
    ds = AuxSpectraDataset(synthetic_csv, "val", (0.7, 0.15, 0.15), n_aux=5)
    assert len(ds) == 120
    spec, aux = ds[3]
    assert spec.shape == (256,) and aux.shape == (5,)


def test_epoch_batch_indices_covers_everything(rng):
    idx = epoch_batch_indices(rng, n=1000, batch_size=256)
    assert idx.shape == (4, 256)
    # all original samples appear at least once
    assert set(idx.ravel().tolist()) == set(range(1000))


def test_epoch_batch_indices_exact_division(rng):
    idx = epoch_batch_indices(rng, n=1024, batch_size=256)
    assert idx.shape == (4, 256)
    assert sorted(idx.ravel().tolist()) == list(range(1024))


def test_synthetic_descriptors_recoverable():
    """Every AUX descriptor must be linearly recoverable from the spectra —
    the rank-correlation losses need real signal to find (regression guard
    for the off-grid edge-position bug that silently erased CT)."""
    from scipy.stats import spearmanr

    from rankaae_tpu.data.synthetic import make_synthetic_xanes

    aux, spec, _ = make_synthetic_xanes(n_rows=1500, seed=3)
    X = np.concatenate([spec, np.ones((len(spec), 1))], axis=1)
    for k, name in enumerate(["CT", "CN", "OCN", "RSTD", "MOOD"]):
        w, *_ = np.linalg.lstsq(X[:1000], aux[:1000, k], rcond=None)
        rho = spearmanr(X[1000:] @ w, aux[1000:, k]).correlation
        assert rho > 0.8, f"{name}: linear-probe spearman {rho:.3f}"

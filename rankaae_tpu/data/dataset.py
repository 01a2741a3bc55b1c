"""Data layer: spectra CSV -> device-resident arrays.

Parity contract with the reference (``sc/clustering/dataloader.py:8-56``):

* CSV read with a 2-level row index (``index_col=[0, 1]``) and ``comment='#'``;
* energy grid parsed from ``ENE_*`` column names;
* first ``n_aux`` columns are ``AUX_*`` physical descriptors
  (CT, CN, OCN, RSTD, MOOD), the remaining 256 ``ENE_*`` columns the spectrum;
* train/val/test split by **contiguous row slices** (NOT shuffled) of sizes
  ``int(N*r_train)``, ``int(N*r_val)``, remainder — this exact slicing is
  load-bearing for metric parity (dataloader.py:14-20).

TPU-first design departure: there is no DataLoader.  The full dataset
(~7000 x 261 float32 ~= 7 MB) lives on device; an epoch of batches is a
gather of a permuted index array, consumed by ``lax.scan``.  Host touches
the data exactly once.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd

PORTIONS = ("train", "val", "test")


def split_sizes(n: int, ratios: Tuple[float, float, float]) -> Tuple[int, int, int]:
    """Contiguous split sizes; last portion takes the remainder
    (reference dataloader.py:14-16)."""
    sizes = [int(n * r) for r in ratios]
    sizes[-1] = n - sum(sizes[:-1])
    return tuple(sizes)


@dataclasses.dataclass
class SplitArrays:
    """One split's data as host numpy arrays (moved to device by the trainer)."""

    spec: np.ndarray          # (N, dim_in) float32
    aux: Optional[np.ndarray]  # (N, n_aux) float32 or None
    grid: np.ndarray          # (dim_in,) energy grid
    atom_index: list          # 2-level row index as list of tuples
    portion: str

    def __len__(self) -> int:
        return self.spec.shape[0]


class AuxSpectraDataset:
    """Reference-compatible dataset facade over :func:`load_split_arrays`.

    Provides ``.spec``, ``.aux``, ``.grid``, ``.atom_index``, ``__len__``,
    ``__getitem__`` with the same semantics as the reference class
    (``sc/clustering/dataloader.py:8-56``) so report-layer code is shared.
    """

    def __init__(self, csv_fn: str, split_portion: str,
                 train_val_test_ratios: Tuple[float, float, float] = (0.7, 0.15, 0.15),
                 n_aux: int = 0):
        arrays = load_split_arrays(csv_fn, train_val_test_ratios, n_aux)[split_portion]
        self.metadata = {"path": csv_fn, "train_test_val_split_ratio": train_val_test_ratios}
        self.spec = arrays.spec
        self.aux = arrays.aux
        self.grid = arrays.grid
        self.atom_index = arrays.atom_index

    def __len__(self) -> int:
        return self.spec.shape[0]

    def __getitem__(self, idx):
        if self.aux is None:
            return self.spec[idx], np.array([0.0], dtype=np.float32)
        return self.spec[idx], self.aux[idx]


def _read_csv_pandas(csv_fn: str, dtype):
    full_df = pd.read_csv(csv_fn, index_col=[0, 1], comment="#")
    cols = full_df.columns.to_list()
    return cols, full_df.to_numpy().astype(dtype), full_df.index.to_list()


def _read_index_fast(csv_fn: str, n: int) -> list:
    """Light pass extracting the 2-level row index (first two CSV fields)."""
    index = []
    with open(csv_fn) as f:
        header_seen = False
        for line in f:
            ls = line.lstrip()
            if not ls or ls.startswith("#"):
                continue
            if not header_seen:
                header_seen = True
                continue
            a, b, _ = line.split(",", 2)
            index.append((a, int(b) if b.isdigit() else b))
    assert len(index) == n, (len(index), n)
    return index


def _read_csv(csv_fn: str, dtype, engine: str = "auto"):
    """CSV -> (column names, float payload, 2-level row index).

    engine="auto" prefers the native C++ loader (native/csv_loader.cpp,
    ~10x the pandas parse on the reference-sized dataset) and falls back to
    pandas; "pandas"/"native" force a path.
    """
    if engine in ("auto", "native"):
        try:
            from rankaae_tpu.data.native import load_csv_native

            cols, data = load_csv_native(csv_fn, n_index_cols=2)
            index = _read_index_fast(csv_fn, data.shape[0])
            return cols, data.astype(dtype, copy=False), index
        except (RuntimeError, OSError, AssertionError, ValueError):
            if engine == "native":
                raise
    return _read_csv_pandas(csv_fn, dtype)


def load_split_arrays(
    csv_fn: str,
    ratios: Tuple[float, float, float] = (0.7, 0.15, 0.15),
    n_aux: int = 0,
    dtype=np.float32,
    engine: str = "auto",
) -> Dict[str, SplitArrays]:
    """Load the CSV once and return all three contiguous splits."""
    cols, data, index = _read_csv(csv_fn, dtype, engine)
    grid = np.array([float(c[len("ENE_"):]) for c in cols if c.startswith("ENE_")])

    # Column-layout asserts, as in the reference (dataloader.py:21-25).
    assert cols[n_aux].startswith("ENE_"), f"column {n_aux} must be ENE_*, got {cols[n_aux]}"
    if n_aux > 0:
        assert not cols[n_aux - 1].startswith("ENE_")
        assert cols[0].startswith("AUX_") and cols[n_aux - 1].startswith("AUX_")

    n = data.shape[0]
    sizes = split_sizes(n, ratios)

    out: Dict[str, SplitArrays] = {}
    start = 0
    for portion, size in zip(PORTIONS, sizes):
        sl = slice(start, start + size)
        out[portion] = SplitArrays(
            spec=np.ascontiguousarray(data[sl, n_aux:]),
            aux=np.ascontiguousarray(data[sl, :n_aux]) if n_aux > 0 else None,
            grid=grid,
            atom_index=index[start:start + size],
            portion=portion,
        )
        start += size
    return out


def epoch_batch_indices(rng: np.random.Generator, n: int, batch_size: int) -> np.ndarray:
    """Host-side helper mirroring the device-side batching scheme (see
    ``rankaae_tpu.train.trainer``): a permutation of [0, n), padded by wrapping
    so every batch has static shape ``batch_size``.

    The reference's shuffled DataLoader yields ceil(n/B) batches with a ragged
    last batch (dataloader.py:70-71); static XLA shapes forbid raggedness, so
    the last batch is padded with the leading entries of the same permutation
    (a few samples are seen twice in ~1 epoch out of ceil(n/B)).
    """
    n_batch = -(-n // batch_size)
    perm = rng.permutation(n)
    padded = np.concatenate([perm, perm[: n_batch * batch_size - n]])
    return padded.reshape(n_batch, batch_size)


class ToTensor:
    """Reference-compatible transform stub (``dataloader.py:59-61``) — arrays
    are already float32 numpy here; kept for API familiarity."""

    def __call__(self, sample):
        return np.asarray(sample, np.float32)


class DataLoader:
    """Minimal batch iterator over an :class:`AuxSpectraDataset` with the
    reference DataLoader semantics used by the trainer (shuffle for train,
    sequential otherwise, ragged last batch, ``.dataset`` attribute).

    The jitted trainer does NOT use this — it consumes device arrays
    directly (``rankaae_tpu.train.trainer``); this exists for users of the
    reference's ``get_dataloaders`` API (``dataloader.py:64-77``).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return -(-len(self.dataset) // self.batch_size)

    def __iter__(self):
        n = len(self.dataset)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        for start in range(0, n, self.batch_size):
            idx = order[start:start + self.batch_size]
            spec = self.dataset.spec[idx]
            aux = (self.dataset.aux[idx] if self.dataset.aux is not None
                   else np.zeros((len(idx), 1), np.float32))
            yield np.asarray(spec, np.float32), np.asarray(aux, np.float32)


def get_dataloaders(csv_fn: str, batch_size: int,
                    train_val_test_ratios: Tuple[float, float, float] = (0.7, 0.15, 0.15),
                    n_aux: int = 0):
    """Reference-compatible loader factory (``dataloader.py:64-77``):
    (train shuffled, val, test) loaders over the contiguous splits."""
    ds_train, ds_val, ds_test = [
        AuxSpectraDataset(csv_fn, p, train_val_test_ratios, n_aux=n_aux)
        for p in PORTIONS
    ]
    return (
        DataLoader(ds_train, batch_size, shuffle=True),
        DataLoader(ds_val, batch_size),
        DataLoader(ds_test, batch_size),
    )

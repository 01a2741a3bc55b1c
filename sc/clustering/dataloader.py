"""Shim for ``sc.clustering.dataloader``."""
from rankaae_tpu.data.dataset import (  # noqa: F401
    AuxSpectraDataset,
    DataLoader,
    ToTensor,
    get_dataloaders,
)

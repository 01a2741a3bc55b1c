from rankaae_tpu.data.dataset import (  # noqa: F401
    AuxSpectraDataset,
    DataLoader,
    SplitArrays,
    ToTensor,
    get_dataloaders,
    load_split_arrays,
)
from rankaae_tpu.data.synthetic import make_synthetic_xanes_csv  # noqa: F401

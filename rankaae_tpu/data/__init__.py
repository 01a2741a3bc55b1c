from rankaae_tpu.data.dataset import AuxSpectraDataset, SplitArrays, load_split_arrays  # noqa: F401
from rankaae_tpu.data.synthetic import make_synthetic_xanes_csv  # noqa: F401

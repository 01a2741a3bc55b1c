"""Generate the example dataset (schema-exact synthetic XANES)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from rankaae_tpu.data.synthetic import make_synthetic_xanes_csv

path = os.path.join(os.path.dirname(__file__), "synthetic_xanes_7000.csv")
make_synthetic_xanes_csv(path, n_rows=7000, dim=256, seed=0)
print(f"wrote {path}")

"""The drop-in ``sc`` import-compat shim.

Run in a subprocess so the shim's ``sc`` modules never pollute
``sys.modules`` for the tests that import the REFERENCE ``sc`` package as a
torch oracle (see conftest.import_reference_sc)."""
import subprocess
import sys

import pytest

SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys
assert "/root/reference" not in sys.path

from sc.utils.parameter import Parameters, AE_CLS_DICT, OPTIM_DICT
from sc.utils.logger import create_logger
from sc.utils.functions import kendall_constraint, recon_loss, smoothness_loss, alpha
from sc.utils.descriptors import SpecDescriptors
from sc.clustering.dataloader import AuxSpectraDataset, get_dataloaders, ToTensor
from sc.clustering.trainer import Trainer
from sc.clustering.model import FCEncoder, Encoder, DiscriminatorFC, GradientReversalLayer
from sc.report import analysis
from sc.report.analysis import evaluate_model, sort_all_models
from sc.report.analysis_new import LossCurvePlotter, Reconstruct
from sc.report.generate_report import sorting_algorithm, plot_report
from sc.cmd.train_sc import main

# these must be OUR implementations
import sc.clustering.model as m
assert "/root/repo" in m.__file__, m.__file__
assert "FC" in AE_CLS_DICT and "AdamW" in OPTIM_DICT

p = Parameters({"a": 1})
assert p.a == 1

# reference-signature loss call with torch-style kwargs
import numpy as np
import pytest
import jax.numpy as jnp
d = jnp.asarray(np.random.default_rng(0).normal(size=(32, 5)).astype("float32"))
s = jnp.asarray(np.random.default_rng(1).normal(size=(32, 5)).astype("float32"))
val = float(kendall_constraint(d, s, activate=True, device="ignored"))
assert abs(val) < 1.0

# the array-only losses are drop-ins for torch-tensor inputs too (the
# reference's callers pass tensors; jnp.asarray entry casts, not .astype)
import torch as _t
d_t, s_t = _t.tensor(np.asarray(d)), _t.tensor(np.asarray(s))
assert abs(float(kendall_constraint(d_t, s_t, activate=True)) - val) < 1e-5
spec_a = _t.rand(8, 64) + 0.5
spec_b = spec_a * 1.01
assert float(recon_loss(spec_a, spec_b, scale=True)) >= 0.0
assert float(smoothness_loss(spec_b, 17)) >= 0.0

# the model-calling losses accept torch modules with the reference signatures
import torch
import torch.nn as nn
from sc.utils.functions import (
    adversarial_loss, discriminator_loss, generator_loss, mutual_info_loss,
)
from sc.utils.parallel import ipcluster, kill_ipypar_pcocesses

torch.manual_seed(0)
enc_t = nn.Linear(16, 5)
dec_t = nn.Linear(5, 16)

class TinyD(nn.Module):
    def __init__(self):
        super().__init__()
        self.lin = nn.Linear(5, 2)
    def forward(self, x, beta):
        return torch.log_softmax(self.lin(x), dim=1)

D = TinyD()
spec_t = torch.randn(8, 16)
styles_t = enc_t(spec_t)
bce = nn.BCEWithLogitsLoss()

v = adversarial_loss(spec_t, styles_t, lambda z, a: z.sum(dim=1, keepdim=True),
                     0.5, batch_size=8, nll_loss=bce)
assert torch.isfinite(v), v
v = discriminator_loss(styles_t, D, batch_size=8)
assert torch.isfinite(v) and v.requires_grad
v = generator_loss(spec_t, enc_t, D)
assert torch.isfinite(v) and v.requires_grad
v = mutual_info_loss(spec_t, styles_t, enc_t, dec_t)
assert torch.isfinite(v) and v.requires_grad

# cluster lifecycle helpers: logged no-ops with the reference signatures
ipcluster("start", n=8, ipypar_path="/tmp/nonexistent")
ipcluster("stop")
kill_ipypar_pcocesses(user="nobody")

# dead-upstream loss-class stubs (reference functions.py:8-34): importable,
# constructible (upstream's KendallConstraint crashed on construction),
# KendallConstraint.__call__ delegates to the functional loss
from sc.utils.functions import TrainingLossGeneral, KendallConstraint
base = TrainingLossGeneral(max_epoch=10)
try:
    base()
    raise AssertionError("expected NotImplementedError")
except NotImplementedError:
    pass
kc = KendallConstraint(max_epoch=10)
assert kc(0) is None
assert abs(float(kc(0, input=(d, s)))) < 1.0

# per-engine worker surface (reference train_sc.py:20-102)
from sc.cmd.train_sc import get_parallel_map_func, run_training, timeout_handler
map_sync, n_engines = get_parallel_map_func("/tmp")
assert n_engines >= 1
assert map_sync(lambda a, b: a + b, [1, 2], [10, 20]) == [11, 22]
print("SC_SHIM_OK")
"""


def test_sc_shim_imports_and_works():
    result = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True, text=True, timeout=300,
        cwd="/root/repo",
    )
    assert "SC_SHIM_OK" in result.stdout, result.stdout + result.stderr


@pytest.mark.slow
def test_run_training_worker(synthetic_csv, tmp_path):
    """The reference-signature per-trial worker trains end-to-end (subprocess
    so the shim ``sc`` package never pollutes sys.modules)."""
    script = f"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/rankaae_test_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import os
from sc.utils.parameter import Parameters
from sc.cmd.train_sc import run_training

params = Parameters(dict(
    ae_form="FC", nstyle=6, n_aux=5, n_layers=3, dim_in=256, dim_out=256,
    batch_size=128, max_epoch=3, gradient_reversal=True,
    decoder_activation="Softplus", optimizer_name="AdamW", lr_base=1e-3,
    epoch_stop_smooth=2, kendall_activation=True,
))
metrics, time_used = run_training(
    0, {str(tmp_path)!r}, params, True, {synthetic_csv!r}, timeout_hours=1)
assert len(metrics) == 5 and time_used > 0
job = os.path.join({str(tmp_path)!r}, "training", "job_1")
for f in ["messages.txt", "losses.csv", "final.mpk"]:
    assert os.path.exists(os.path.join(job, f)), f
print("WORKER_OK")
"""
    result = subprocess.run([sys.executable, "-c", script],
                            capture_output=True, text=True, timeout=600,
                            cwd="/root/repo")
    assert "WORKER_OK" in result.stdout, result.stdout + result.stderr


def test_cluster_helper_shims():
    """The no-op cluster helpers run and report (subprocess, CPU)."""
    script = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "from sc.cmd.wait_ipp_engines import main as wait_main\n"
        "from sc.cmd.stop_ipcontroller import main as stop_main\n"
        "assert wait_main(['-n', '8']) == 0\n"
        "assert stop_main() == 0\n"
        "print('HELPERS_OK')\n"
    )
    result = subprocess.run([sys.executable, "-c", script],
                            capture_output=True, text=True, timeout=120,
                            cwd="/root/repo")
    assert "HELPERS_OK" in result.stdout, result.stdout + result.stderr

"""rankaae_tpu — a TPU-native (JAX/XLA/Pallas) framework for rank-constrained
adversarial autoencoders over XANES spectra.

A from-scratch rebuild of the capabilities of AI-multimodal/RankAAE
(reference: /root/reference, Python/PyTorch, single-GPU per trial,
ipyparallel multi-trial) designed TPU-first:

* models are pure-functional Flax modules compiled once under ``jit``;
* the 6-loss / 7-optimizer alternating training protocol
  (reference ``sc/clustering/trainer.py:89-204``) is a single jitted step,
  epochs are ``lax.scan``, and the whole run is one XLA program;
* the signature O(B^2) Kendall rank-correlation loss
  (reference ``sc/utils/functions.py:37-79``) has a fused Pallas kernel;
* multi-trial hyperparameter-identical search (reference ipyparallel,
  ``sc/cmd/train_sc.py:25-45``) is ``vmap`` over a stacked trial axis,
  sharded over the TPU mesh with ``jax.sharding`` — trials ride ICI,
  not ZeroMQ.
"""

__version__ = "0.1.0"

from rankaae_tpu.utils.config import Parameters, TrainConfig  # noqa: F401


def __getattr__(name):
    # lazy heavyweight imports so `import rankaae_tpu` stays light
    if name == "RankAAETrainer":
        from rankaae_tpu.train.trainer import RankAAETrainer

        return RankAAETrainer
    if name == "run_trials":
        from rankaae_tpu.parallel.trials import run_trials

        return run_trials
    if name == "InferenceModel":
        from rankaae_tpu.models.inference import InferenceModel

        return InferenceModel
    raise AttributeError(f"module 'rankaae_tpu' has no attribute {name!r}")

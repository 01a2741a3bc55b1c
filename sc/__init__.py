"""Drop-in import-compatibility shim for the reference ``sc`` package.

Code written against AI-multimodal/RankAAE's module layout keeps working:

    from sc.utils.parameter import Parameters
    from sc.clustering.dataloader import AuxSpectraDataset, get_dataloaders
    from sc.clustering.trainer import Trainer
    from sc.report import analysis
    from sc.cmd.train_sc import main

Each submodule re-exports the rankaae_tpu equivalent under the reference's
name.  Semantics notes (TPU-native differences, e.g. model bundles instead
of pickled torch modules) live in the respective rankaae_tpu docstrings and
PARITY.md.
"""

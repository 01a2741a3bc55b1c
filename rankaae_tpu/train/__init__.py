from rankaae_tpu.train.trainer import RankAAETrainer, TrainState, TrialData  # noqa: F401

from rankaae_tpu.parallel.trials import TrialResults, run_trials, trial_mesh  # noqa: F401

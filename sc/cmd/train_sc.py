"""Shim for ``sc.cmd.train_sc``.

``main``/``train_from_config`` drive the TPU-native vmapped multi-trial run.
The reference's per-engine worker surface (``run_training``,
``timeout_handler``, ``get_parallel_map_func`` —
``/root/reference/sc/cmd/train_sc.py:20-102``) is kept callable for user
code that imported it: ``run_training`` trains ONE trial via the
reference-compatible ``Trainer`` facade, and ``get_parallel_map_func``
returns the builtin ``map`` (there are no ipyparallel engines to connect
to — one process drives the whole device mesh).
"""
import logging
import os
import signal
import time

from rankaae_tpu.cli.train_sc import main, train_from_config  # noqa: F401


def timeout_handler(signum, frame):
    """Reference signature (``train_sc.py:21-22``)."""
    raise Exception("Training Overtime!")


def get_parallel_map_func(work_dir=".", logger=None):
    """Reference signature (``train_sc.py:25-45``).

    No ipyparallel cluster exists in the TPU build; trials are a vmapped
    device axis, so the "parallel map" is the builtin ``map`` and the engine
    count is the visible device count.  Returned ``map_sync`` matches the
    reference's multi-iterable calling convention.
    """
    import jax

    logger = logger or logging.getLogger("Parallel")
    n = len(jax.devices())
    logger.info(f"No ipyparallel engines in the TPU build; builtin map over "
                f"{n} visible device(s).")

    def map_sync(fn, *iterables):
        return list(map(fn, *iterables))

    return map_sync, n


def run_training(job_number, work_dir, train_config, verbose, data_file,
                 timeout_hours=0, logger=None):
    """Single-trial worker with the reference signature (``train_sc.py:48-102``).

    Trains one trial through the reference-compatible ``Trainer`` facade
    (jitted single-trial program, seed = ``job_number``); writes
    ``training/job_<n+1>/{messages.txt, losses.csv, final.mpk, ...}`` and
    returns ``(metrics, time_used)``.
    """
    from rankaae_tpu.train.facade import Trainer
    from rankaae_tpu.utils.logging import create_logger

    job_dir = os.path.join(work_dir, "training", f"job_{job_number+1}")
    os.makedirs(job_dir, exist_ok=True)
    logger = create_logger(f"subtraining_{job_number+1}",
                           os.path.join(job_dir, "messages.txt"))

    start = time.time()
    logger.info(f"Training started for trial {job_number+1}.")
    trainer = Trainer.from_data(
        data_file,
        verbose=verbose,
        work_dir=job_dir,
        config_parameters=train_config,
        logger=logger,
        seed=job_number,
    )
    use_alarm = timeout_hours and hasattr(signal, "SIGALRM")
    if use_alarm:
        signal.signal(signal.SIGALRM, timeout_handler)
        signal.alarm(int(timeout_hours * 3600))
    try:
        metrics = trainer.train()
    finally:
        if use_alarm:
            signal.alarm(0)
    logger.info(metrics)
    time_used = time.time() - start
    logger.info(f"Training finished. Time used: {time_used:.2f}s.\n\n")
    return metrics, time_used


if __name__ == "__main__":
    main()

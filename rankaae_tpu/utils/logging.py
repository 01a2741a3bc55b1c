"""File loggers matching the reference's observability surface
(``sc/utils/logger.py:5-35``): per-trial ``messages.txt`` (event log) and
``losses.csv`` (12-column loss table, exact schema of ``trainer.py:84-87``,
consumed unmodified by the report layer's LossCurvePlotter)."""
from __future__ import annotations

import logging
import os


def create_logger(name: str, file_path: str, append: bool = False,
                  simple_fmt: bool = False) -> logging.Logger:
    """Reference-compatible file logger factory (``sc/utils/logger.py``)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.handlers.clear()
    logger.propagate = False
    os.makedirs(os.path.dirname(os.path.abspath(file_path)), exist_ok=True)
    fh = logging.FileHandler(file_path, mode="a" if append else "w")
    if simple_fmt:
        fh.setFormatter(logging.Formatter("%(message)s"))
    else:
        fh.setFormatter(
            logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
        )
    logger.addHandler(fh)
    return logger


LOSS_CSV_HEADER = (
    "Epoch,Train_D,Val_D,Train_G,Val_G,Train_Aux,Val_Aux,Train_Recon,"
    "Val_Recon,Train_Smooth,Val_Smooth,Train_Mutual_Info,Val_Mutual_Info"
)


def format_loss_row(epoch: int, logs_at_epoch: dict) -> str:
    """One losses.csv row, byte-format-compatible with ``trainer.py:270-279``
    (tab after every comma, trailing ',\\t', 6 decimal places)."""
    g = logs_at_epoch
    vals = [
        g["train_dis"], g["val_dis"],
        g["train_gen"], g["val_gen"],
        g["train_aux"], g["val_aux"],
        g["train_recon"], g["val_recon"],
        g["train_smooth"], g["val_smooth"],
        g["train_mi"], g["val_mi"],
    ]
    return f"{epoch:d},\t" + ",\t".join(f"{float(v):.6f}" for v in vals) + ",\t"


def append_losses_csv(path: str, logs: dict, epoch_offset: int,
                      every: int = 10) -> None:
    """Append rows for a log segment covering absolute epochs
    [epoch_offset, epoch_offset + len) — incremental variant of
    :func:`write_losses_csv` used by segmented/checkpointed runs."""
    import os

    n = len(logs["epoch"])
    new_file = not os.path.exists(path)
    with open(path, "a") as f:
        if new_file:
            f.write(LOSS_CSV_HEADER + "\n")
        for i in range(n):
            epoch = epoch_offset + i
            if epoch % every == 0:
                row = {k: v[i] for k, v in logs.items() if k != "metrics"}
                f.write(format_loss_row(epoch, row) + "\n")


def write_losses_csv(path: str, logs: dict, every: int = 10) -> None:
    """Dump the loss table for epochs where ``epoch % every == 0``
    (the reference logs every 10 epochs, ``trainer.py:270``)."""
    n_epochs = len(logs["epoch"])
    with open(path, "w") as f:
        f.write(LOSS_CSV_HEADER + "\n")
        for e in range(n_epochs):
            if e % every == 0:
                row = {k: v[e] for k, v in logs.items() if k != "metrics"}
                f.write(format_loss_row(e, row) + "\n")

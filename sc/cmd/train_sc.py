"""Shim for ``sc.cmd.train_sc``."""
from rankaae_tpu.cli.train_sc import main, train_from_config  # noqa: F401

if __name__ == "__main__":
    main()

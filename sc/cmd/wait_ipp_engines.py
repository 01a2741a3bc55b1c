"""Shim for ``sc.cmd.wait_ipp_engines`` (reference ``wait_ipp_engines.py``).

The reference blocks until N ipyparallel engines register.  There is no
cluster to await here — one process drives the whole TPU mesh — so this
reports device readiness and returns immediately.
"""
import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-n", "--n_engines", type=int, default=1,
                        help="accepted for CLI parity; devices are always ready")
    parser.add_argument("-w", "--work_dir", type=str, default=".")
    args = parser.parse_args(argv)

    import jax

    devices = jax.devices()
    print(f"{len(devices)} device(s) ready (no engine cluster to await): "
          f"{[str(d) for d in devices]}")
    return 0


if __name__ == "__main__":
    main()

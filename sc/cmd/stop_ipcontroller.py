"""Shim for ``sc.cmd.stop_ipcontroller`` (reference ``stop_ipcontroller.py``).

No ipcontroller exists in the TPU-native design — training is one process
over the mesh — so there is nothing to shut down.
"""


def main(argv=None):
    print("no ipcontroller to stop (one process drives the TPU mesh)")
    return 0


if __name__ == "__main__":
    main()

"""Production inference: fixed-shape batched encoding/decoding of arbitrary
datasets.

The reference has no serving story (models are pickled modules applied to a
whole split at once).  For deployment, arbitrary-size inputs must map onto a
small set of compiled shapes: :class:`BatchedInference` pads-and-chunks any
row count through one fixed (batch, dim) program, so the first call compiles
and every later call — any size — reuses it.

CLI: ``python -m rankaae_tpu.serve bundle.mpk data.csv out_prefix``
writes ``<out_prefix>_styles.txt`` and ``<out_prefix>_recon.txt`` for the
whole CSV (all splits).

Throughput note: in this development environment the chip is reached over a
tunnel whose host<->device transfer tops out around tens of MB/s, so
end-to-end serving measurements here measure the tunnel, not the design;
the on-device encode+decode itself is sub-millisecond per 4096-spectrum
batch (see the training-path numbers in README).
"""
from __future__ import annotations

import argparse
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rankaae_tpu.models.inference import InferenceModel


class BatchedInference:
    """Fixed-shape, pad-and-chunk wrapper over an :class:`InferenceModel`."""

    def __init__(self, model: InferenceModel, batch_size: int = 1024):
        self.model = model
        self.batch_size = batch_size

    def _chunk_apply(self, fn, x: np.ndarray) -> np.ndarray:
        n = x.shape[0]
        b = self.batch_size
        n_pad = -(-n // b) * b
        padded = np.zeros((n_pad, x.shape[1]), np.float32)
        padded[:n] = x
        outs = []
        for i in range(0, n_pad, b):
            outs.append(np.asarray(fn(jnp.asarray(padded[i:i + b]))))
        return np.concatenate(outs, axis=0)[:n]

    def encode(self, spec: np.ndarray) -> np.ndarray:
        return self._chunk_apply(self.model._encode, np.asarray(spec, np.float32))

    def decode(self, styles: np.ndarray) -> np.ndarray:
        return self._chunk_apply(self.model._decode, np.asarray(styles, np.float32))

    def reconstruct(self, spec: np.ndarray) -> np.ndarray:
        return self.decode(self.encode(spec))


def main(argv: Optional[list] = None):
    from rankaae_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("bundle", help="model bundle (.mpk)")
    parser.add_argument("csv", help="spectra CSV (reference schema)")
    parser.add_argument("out_prefix", help="output file prefix")
    parser.add_argument("--batch-size", type=int, default=1024)
    parser.add_argument("--n-aux", type=int, default=5)
    args = parser.parse_args(argv)

    from rankaae_tpu.data.dataset import _read_csv

    cols, data, _ = _read_csv(args.csv, np.float32)
    spec = data[:, args.n_aux:]

    model = InferenceModel.from_bundle(args.bundle)
    serve = BatchedInference(model, batch_size=args.batch_size)
    styles = serve.encode(spec)
    recon = serve.decode(styles)
    np.savetxt(args.out_prefix + "_styles.txt", styles)
    np.savetxt(args.out_prefix + "_recon.txt", recon)
    print(f"encoded {spec.shape[0]} spectra -> {args.out_prefix}_styles.txt, "
          f"{args.out_prefix}_recon.txt")


if __name__ == "__main__":
    main()

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


def device_benchmark(model: InferenceModel, batch_size: int = 4096,
                     iters: int = 200) -> dict:
    """Amortized DEVICE-RESIDENT encode+decode throughput.

    Measures what a deployed serving loop pays per batch once data lives on
    the chip: ``iters`` encode->decode rounds run inside ONE compiled
    ``lax.scan`` with a scalar return (the chip-measurement methodology
    from the verify skill — per-dispatch tunnel latency and host transfers
    excluded).  Each iteration's input depends on the previous output, so
    nothing constant-folds away."""
    import time

    from rankaae_tpu.models.primitives import activation_dtype_scope
    from rankaae_tpu.models.registry import build_autoencoder

    encoder, decoder = build_autoencoder(model.cfg)
    ev, dv = model._vars("enc"), model._vars("dec")
    dim = model.cfg.dim_in

    @jax.jit
    def run(ev, dv, key):
        x0 = jax.random.normal(key, (batch_size, dim), jnp.float32)
        with activation_dtype_scope("float32"):
            def step(c, _):
                z = encoder.apply(ev, c, train=False)
                y = decoder.apply(dv, z, train=False)
                return x0 * 0.9 + y * 0.1, jnp.sum(z[0])

            _, s = jax.lax.scan(step, x0, None, length=iters)
        return jnp.sum(s)

    key = jax.random.PRNGKey(0)
    np.asarray(run(ev, dv, key))   # compile + warm (np.asarray = axon sync)
    walls = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(run(ev, dv, key))
        walls.append(time.time() - t0)
    wall = min(walls)
    return {
        "metric": "serve_spectra_per_sec_device",
        "value": round(batch_size * iters / wall, 1),
        "unit": "spectra/s/chip",
        "batch_size": batch_size,
        "iters": iters,
        "ms_per_batch": round(wall / iters * 1e3, 4),
        "ae_form": model.cfg.ae_form,
    }


def main(argv: Optional[list] = None):
    from rankaae_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("bundle", help="model bundle (.mpk)")
    parser.add_argument("csv", nargs="?", help="spectra CSV (reference schema)")
    parser.add_argument("out_prefix", nargs="?", help="output file prefix")
    parser.add_argument("--batch-size", type=int, default=1024)
    parser.add_argument("--n-aux", type=int, default=5)
    parser.add_argument("--bench", action="store_true",
                        help="print the device-resident amortized "
                             "encode+decode throughput as one JSON line")
    args = parser.parse_args(argv)

    if args.bench:
        import json

        model = InferenceModel.from_bundle(args.bundle)
        result = device_benchmark(
            model, batch_size=args.batch_size if args.batch_size != 1024
            else 4096)
        print(json.dumps(result))
        return
    if not args.csv or not args.out_prefix:
        parser.error("csv and out_prefix are required unless --bench")

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

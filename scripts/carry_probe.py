"""On-chip evidence for the round-4 throughput attack.

Two questions, each a compiled lax.scan microbench (timed with the
scan+scalar recipe from ``chip_calibration.py`` — N iterations inside one
program, scalar out, np.asarray barrier):

1. **Carry-leaf overhead** — the flagship batch body executes 2,171 ops of
   which 64% are copy-start/async pairs shuffling the ~455-leaf TrainState
   through the scan (``scripts/op_breakdown.py``).  How much does a scan
   iteration cost as a function of leaf COUNT at constant total bytes?
   If the per-leaf cost dominates, flattening params/moments into per-role
   vectors (455 -> ~60 leaves) is the right attack on the 3.26x roofline
   gap; MXU tile packing is not.

2. **Pair-packed matmul** — (T,B,64)x(T,64,64) batched vs (T/2,B,128)x
   (T/2,128,128) block-diag-packed.  If the packed form is ~2x faster the
   tile-padding attack pays; if they time the same, the program is
   op/latency-bound and packing is a wash (VERDICT r03 asked for the
   measurement either way).

Usage: python scripts/carry_probe.py [--iters 200]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args):
    out = fn(*args)
    np.asarray(out)  # axon: block_until_ready is unreliable; materialize
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        np.asarray(out)
        best = min(best, time.time() - t0)
    return best


def carry_cost(n_leaves: int, total_elems: int, iters: int) -> float:
    """Seconds per scan iteration for a carry of ``n_leaves`` equal-size
    f32 leaves summing to ``total_elems`` elements, with one tiny fused
    update per leaf (x * 1.000001 + 1e-9 — keeps every leaf live)."""
    per = max(8, total_elems // n_leaves)
    keys = [f"l{i}" for i in range(n_leaves)]
    init = {k: jnp.full((per,), 1.0, jnp.float32) for k in keys}

    @jax.jit
    def run(carry):
        def step(c, _):
            c = {k: v * jnp.float32(1.000001) + jnp.float32(1e-9)
                 for k, v in c.items()}
            return c, ()
        c, _ = jax.lax.scan(step, carry, None, length=iters)
        return sum(jnp.sum(v) for v in c.values())

    return _time(run, init) / iters


def packed_matmul(trials: int, batch: int, width: int, iters: int):
    """(a) batched per-trial matmul vs (b) pair-packed block-diag form."""
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (trials, batch, width), jnp.float32)
    w = jax.random.normal(k, (trials, width, width), jnp.float32)

    @jax.jit
    def run_batched(x, w):
        def step(c, _):
            c = jnp.einsum("tbk,tkn->tbn", c, w,
                           precision=jax.lax.Precision.DEFAULT,
                           preferred_element_type=jnp.float32)
            c = c / jnp.float32(width)  # keep magnitudes bounded
            return c, ()
        c, _ = jax.lax.scan(step, x, None, length=iters)
        return jnp.sum(c)

    # block-diag packing: pairs of trials share one 2w-wide matmul
    xp = jnp.concatenate([x[0::2], x[1::2]], axis=-1)  # (T/2, B, 2w)
    zero = jnp.zeros_like(w[0::2])
    wp = jnp.concatenate([
        jnp.concatenate([w[0::2], zero], axis=-1),
        jnp.concatenate([zero, w[1::2]], axis=-1),
    ], axis=-2)  # (T/2, 2w, 2w)

    @jax.jit
    def run_packed(xp, wp):
        def step(c, _):
            c = jnp.einsum("tbk,tkn->tbn", c, wp,
                           precision=jax.lax.Precision.DEFAULT,
                           preferred_element_type=jnp.float32)
            c = c / jnp.float32(width)
            return c, ()
        c, _ = jax.lax.scan(step, xp, None, length=iters)
        return jnp.sum(c)

    return (_time(run_batched, x, w) / iters,
            _time(run_packed, xp, wp) / iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    result = {"device": dev.device_kind, "iters": args.iters}

    # 1) carry-leaf overhead at the TrainState's footprint (~630K elems x32
    # trials ~ 80 MB; we scale down to one-trial footprint, the leaf COUNT
    # is the variable under test)
    total = 640_000
    carry = {}
    for n in (8, 32, 64, 128, 256, 455):
        s = carry_cost(n, total, args.iters)
        carry[n] = s
        print(f"carry leaves={n:4d}: {s*1e6:8.2f} us/iter", file=sys.stderr)
    result["carry_us_per_iter"] = {str(k): round(v * 1e6, 3)
                                   for k, v in carry.items()}
    base = carry[8]
    result["per_leaf_ns"] = round(
        (carry[455] - base) / (455 - 8) * 1e9, 2)

    # 2) pair-packed matmul at the flagship hidden shape
    bat, packed = packed_matmul(32, 1024, 64, args.iters)
    print(f"batched  (32,1024,64)x(32,64,64):   {bat*1e6:8.2f} us/iter",
          file=sys.stderr)
    print(f"packed   (16,1024,128)x(16,128,128): {packed*1e6:8.2f} us/iter",
          file=sys.stderr)
    result["matmul_batched_us"] = round(bat * 1e6, 3)
    result["matmul_packed_us"] = round(packed * 1e6, 3)
    result["packed_speedup"] = round(bat / packed, 3)

    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()

"""Microbenchmark: lowering strategies for the tiny-channel 1-D convs of the
"normal"/"compact" forms on the real TPU chip.

The conv-zoo shapes (C in {1,4,8}, L in {8..256}, k in {5,7,11}) are
pathological for lane-oriented conv lowerings; this measures candidate
formulations so the production choice is evidence-based:

  A. lax.conv_general_dilated, NCH (current primitives.py lowering)
  B. im2col patches + einsum (contraction C_in*k on the MXU)
  C. per-tap shift + einsum (k small matmuls, contraction C_in)
  D. dense structured matmul over the flattened (C*L) axis
  E. lax.conv_general_dilated, NHC (channels in lanes)

The tunneled axon chip has ~200 ms per-dispatch latency, so each variant is
iterated ITERS times INSIDE one compiled program (sequential dependency via
the carry) and the reported time is per-iteration.

Run: python scripts/conv_microbench.py [--batch 8192] [--fwd-only]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

ITERS = 30


def make_variants(C_in, C_out, L_in, k, stride, pad):
    import jax
    import jax.numpy as jnp

    L_out = (L_in + 2 * pad - k) // stride + 1

    def conv_nch(x, w):
        xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="edge")
        return jax.lax.conv_general_dilated(
            xp, w, (stride,), "VALID", dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32)

    def conv_nhc(x, w):
        xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="edge")
        xhc = xp.transpose(0, 2, 1)
        y = jax.lax.conv_general_dilated(
            xhc, w.transpose(2, 1, 0), (stride,), "VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32)
        return y.transpose(0, 2, 1)

    def conv_im2col(x, w):
        xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="edge")
        # patches: (B, C_in*k, L_out) with feature order (c, tap)
        patches = jax.lax.conv_general_dilated_patches(
            xp, (k,), (stride,), "VALID", dimension_numbers=("NCH", "OIH", "NCH"))
        wf = w.reshape(C_out, C_in * k)
        return jnp.einsum("bfl,of->bol", patches, wf,
                          preferred_element_type=jnp.float32)

    def conv_taps(x, w):
        xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="edge")
        y = 0.0
        for t in range(k):
            sl = jax.lax.slice_in_dim(xp, t, t + (L_out - 1) * stride + 1, stride, axis=2)
            y = y + jnp.einsum("bcl,oc->bol", sl, w[:, :, t],
                               preferred_element_type=jnp.float32)
        return y

    # static scatter indices for the dense structured matmul
    rows, cols, srcs = [], [], []
    for o in range(C_out):
        for i in range(C_in):
            for t in range(k):
                for lo in range(L_out):
                    li = lo * stride + t - pad
                    li = min(max(li, 0), L_in - 1)   # replicate pad folds into clamp
                    rows.append(i * L_in + li)
                    cols.append(o * L_out + lo)
                    srcs.append((o * C_in + i) * k + t)
    rows = np.asarray(rows); cols = np.asarray(cols); srcs = np.asarray(srcs)

    def conv_dense(x, w):
        W = jnp.zeros((C_in * L_in, C_out * L_out), jnp.float32)
        W = W.at[rows, cols].add(w.reshape(-1)[srcs])
        y = x.reshape(x.shape[0], C_in * L_in) @ W
        return y.reshape(x.shape[0], C_out, L_out)

    return dict(A_nch=conv_nch, E_nhc=conv_nhc, B_im2col=conv_im2col,
                C_taps=conv_taps, D_dense=conv_dense), L_out


def bench_one(fn, x, w, fwd_only, label):
    import jax
    import jax.numpy as jnp

    if fwd_only:
        def step(c, _):
            y = fn(c, w)
            # fold output back to input shape to chain iterations
            g = jnp.mean(y)
            return c + 1e-12 * g, None
    else:
        def loss(x, w):
            return jnp.sum(fn(x, w) ** 2)
        gfn = jax.grad(loss, argnums=(0, 1))

        def step(c, _):
            dx, dw = gfn(c, w)
            return c + 1e-12 * dx, None

    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return jnp.sum(out)   # scalar: keep the tunnel transfer out of timing

    out = run(x)
    np.asarray(out)
    walls = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(run(x))
        walls.append(time.time() - t0)
    per_iter = (min(walls)) / ITERS * 1e3
    print(f"  {label:10s}: {per_iter:8.3f} ms/iter  (dispatch+loop: "
          f"{min(walls)*1e3:7.1f} ms total)", flush=True)
    return per_iter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    import jax
    from rankaae_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    import jax.numpy as jnp
    shapes = [
        # (C_in, C_out, L_in, k, stride, pad) — representative zoo shapes
        (1, 4, 256, 11, 1, 5),    # encoder block0 conv1
        (4, 4, 256, 11, 2, 5),    # encoder block0 conv2 (strided)
        (4, 4, 64, 7, 2, 3),      # mid encoder
        (4, 4, 256, 7, 1, 3),     # decoder tail stride-1 blocks
    ]
    rng = np.random.default_rng(0)
    for (C_in, C_out, L_in, k, s, pad) in shapes:
        print(f"shape C{C_in}->{C_out} L{L_in} k{k} s{s} batch {args.batch} "
              f"{'fwd' if args.fwd_only else 'fwd+bwd'}:", flush=True)
        variants, L_out = make_variants(C_in, C_out, L_in, k, s, pad)
        x = jnp.asarray(rng.normal(size=(args.batch, C_in, L_in)).astype("float32"))
        w = jnp.asarray(rng.normal(size=(C_out, C_in, k)).astype("float32"))
        ref = None
        for name, fn in variants.items():
            y = np.asarray(jax.jit(fn)(x, w))
            if ref is None:
                ref = y
            else:
                # bf16 MXU passes at DEFAULT precision: loose tolerance
                err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-6)
                assert err < 0.05, (name, err)
            bench_one(fn, x, w, args.fwd_only, name)


if __name__ == "__main__":
    main()

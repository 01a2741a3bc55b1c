"""Calibrate the real chip: achievable matmul FLOP/s, HBM bandwidth, and
per-op overhead through the axon tunnel.  Times N iterations inside one
compiled scan to amortize the ~200 ms dispatch latency.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
ITERS = 30


def timed(run, x):
    import jax
    out = run(x)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    walls = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(jax.tree_util.tree_leaves(run(x))[0])
        walls.append(time.time() - t0)
    return min(walls) / ITERS


def main():
    import jax
    import jax.numpy as jnp
    from rankaae_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # 1. big matmul, bf16 inputs: MXU peak check
    for n, dtype in [(4096, jnp.bfloat16), (4096, jnp.float32)]:
        a = jnp.asarray(rng.normal(size=(n, n)), dtype)
        b = jnp.asarray(rng.normal(size=(n, n)), dtype)

        @jax.jit
        def run(a, b=b):
            def step(c, _):
                y = (c @ b).astype(c.dtype)
                return y, None
            out, _ = jax.lax.scan(step, a, None, length=ITERS)
            return jnp.sum(out.astype(jnp.float32))
        t = timed(run, a)
        fl = 2 * n**3 / t
        print(f"matmul {n}^3 {dtype.__name__}: {t*1e3:7.3f} ms/iter = "
              f"{fl/1e12:6.1f} TFLOP/s", flush=True)

    # 2. elementwise on 64 MB: HBM bandwidth check
    m = 16 * 1024 * 1024
    x = jnp.asarray(rng.normal(size=(m,)).astype("float32"))

    @jax.jit
    def run_ew(x):
        def step(c, _):
            return c * 1.000001 + 1e-9, None
        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return jnp.sum(out)
    t = timed(run_ew, x)
    bw = 2 * m * 4 / t
    print(f"elementwise 64MB: {t*1e3:7.3f} ms/iter = {bw/1e9:6.1f} GB/s "
          "(read+write)", flush=True)

    # 3. tiny-op chain: per-op overhead check (1000 dependent tiny adds)
    y = jnp.asarray(rng.normal(size=(8, 128)).astype("float32"))

    @jax.jit
    def run_tiny(y):
        def step(c, _):
            for _ in range(33):
                c = c + 1.0
                c = c * 0.999
                c = jnp.tanh(c)
            return c, None
        out, _ = jax.lax.scan(step, y, None, length=ITERS)
        return jnp.sum(out)
    t = timed(run_tiny, y) / 99
    print(f"tiny dependent op: {t*1e6:7.2f} us/op", flush=True)

    # 4. the D_dense matmul shape alone: (8192,1024)@(1024,512) fwd+bwd
    a = jnp.asarray(rng.normal(size=(8192, 1024)).astype("float32"))
    w = jnp.asarray(rng.normal(size=(1024, 512)).astype("float32"))

    def loss(a, w):
        return jnp.sum((a @ w) ** 2)
    g = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def run_mm(a):
        def step(c, _):
            da, dw = g(c, w)
            return c + 1e-12 * da, None
        out, _ = jax.lax.scan(step, a, None, length=ITERS)
        return jnp.sum(out)
    t = timed(run_mm, a)
    fl = 3 * 2 * 8192 * 1024 * 512 / t
    print(f"dense (8192,1024)@(1024,512) fwd+bwd: {t*1e3:7.3f} ms/iter = "
          f"{fl/1e12:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()

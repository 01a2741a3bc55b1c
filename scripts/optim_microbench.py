"""Microbenchmark: leaf-wise vs flat-fused AdamW updates at flagship shapes.

The per-batch protocol runs 5 optimizer steps over pytrees of ~20 small
leaves; at ~8 us fixed cost per lowered op, leaf-wise updates may be a real
fraction of the batch step.  Compares tree_map-style updates against a
single update over one flattened parameter vector (32 vmapped trials).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
ITERS = 50
TRIALS = 32


def main():
    import jax
    import jax.numpy as jnp
    from rankaae_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # flagship-ish FC param tree: 5 layers of (in,out)+(out,)+prelu+... ~20 leaves
    shapes = []
    dims = [256, 64, 64, 64, 64, 6]
    for i in range(len(dims) - 1):
        shapes += [(dims[i], dims[i + 1]), (dims[i + 1],), (dims[i + 1],)]
    params = [jnp.asarray(rng.normal(size=(TRIALS,) + s).astype("float32"))
              for s in shapes]
    n_leaves = len(params)
    n_params = sum(int(np.prod(p.shape)) for p in params)
    print(f"{n_leaves} leaves, {n_params} total elems (x{TRIALS} trials)")

    def adamw_leaf(p, g, m, v, t):
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        mh = m / (1 - 0.9 ** t)
        vh = v / (1 - 0.999 ** t)
        p = p - 1e-3 * (mh / (jnp.sqrt(vh) + 1e-8) + 0.01 * p)
        return p, m, v

    # A: leaf-wise (tree_map style)
    grads = [p * 0.01 for p in params]
    ms = [jnp.zeros_like(p) for p in params]
    vs = [jnp.zeros_like(p) for p in params]

    @jax.jit
    def run_leafwise(params, ms, vs):
        def step(carry, t):
            params, ms, vs = carry
            new_p, new_m, new_v = [], [], []
            for p, m, v in zip(params, ms, vs):
                g = p * 0.01
                p2, m2, v2 = adamw_leaf(p, g, m, v, t + 1)
                new_p.append(p2); new_m.append(m2); new_v.append(v2)
            return (new_p, new_m, new_v), None
        (params, ms, vs), _ = jax.lax.scan(
            step, (params, ms, vs), jnp.arange(ITERS, dtype=jnp.float32))
        return sum(jnp.sum(p) for p in params)

    # B: flat fused (one vector per trial)
    flat = jnp.concatenate([p.reshape(TRIALS, -1) for p in params], axis=1)
    fm = jnp.zeros_like(flat)
    fv = jnp.zeros_like(flat)

    @jax.jit
    def run_flat(flat, fm, fv):
        def step(carry, t):
            p, m, v = carry
            g = p * 0.01
            p, m, v = adamw_leaf(p, g, m, v, t + 1)
            return (p, m, v), None
        (flat2, _, _), _ = jax.lax.scan(
            step, (flat, fm, fv), jnp.arange(ITERS, dtype=jnp.float32))
        return jnp.sum(flat2)

    for label, fn, args in [("leafwise", run_leafwise, (params, ms, vs)),
                            ("flat", run_flat, (flat, fm, fv))]:
        out = fn(*args); np.asarray(out)
        walls = []
        for _ in range(5):
            t0 = time.time()
            np.asarray(fn(*args))
            walls.append(time.time() - t0)
        print(f"  {label:9s}: {min(walls)/ITERS*1e6:9.1f} us/update", flush=True)


if __name__ == "__main__":
    main()

"""Component-level timing of the "normal" conv form on the real chip.

Times (inside one compiled scan each, scalar outputs — see
chip_calibration.py for why): encoder fwd, encoder fwd+bwd, decoder fwd,
decoder fwd+bwd, discriminator fwd+bwd, and one full _train_batch, at the
bench's effective batch (trials x 1024).  This tells us which module a
fused Pallas block should target and what the ceiling is.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
ITERS = 10


def timed(run, *args):
    import jax
    out = run(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    walls = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(jax.tree_util.tree_leaves(run(*args))[0])
        walls.append(time.time() - t0)
    return min(walls) / ITERS


def main():
    import jax
    import jax.numpy as jnp
    from rankaae_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    from rankaae_tpu.models.registry import build_autoencoder, build_discriminator
    from rankaae_tpu.utils.config import TrainConfig

    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    act = sys.argv[2] if len(sys.argv) > 2 else "float32"
    B = trials * 1024
    cfg = TrainConfig(ae_form="normal", nstyle=6, n_aux=5, dim_in=256,
                      dim_out=256, decoder_activation="Softplus",
                      batch_size=1024, matmul_precision="default",
                      activation_dtype=act)
    from rankaae_tpu.models.primitives import (
        set_activation_dtype, set_matmul_precision)
    set_matmul_precision("default")
    set_activation_dtype(act)
    enc, dec = build_autoencoder(cfg)
    dis = build_discriminator(cfg)

    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.normal(size=(B, 256)).astype("float32") * 0.1 + 1.0)
    k = jax.random.PRNGKey(0)
    rngs = {"params": k, "dropout": jax.random.fold_in(k, 1),
            "noise": jax.random.fold_in(k, 2)}
    ev = enc.init(rngs, spec[:2], train=True)
    z0 = jnp.asarray(rng.normal(size=(B, cfg.nstyle)).astype("float32"))
    dv = dec.init(rngs, z0[:2], train=True)
    xv = dis.init(rngs, z0[:2], jnp.float32(0.0), train=True)

    def scan_fwd(apply_fn, x):
        @jax.jit
        def run(x):
            def step(c, _):
                y = apply_fn(c)
                return c + 1e-12 * jnp.mean(y), None
            out, _ = jax.lax.scan(step, x, None, length=ITERS)
            return jnp.sum(out)
        return run

    def scan_bwd(loss_fn, x):
        g = jax.grad(lambda x: loss_fn(x))

        @jax.jit
        def run(x):
            def step(c, _):
                return c + 1e-12 * g(c), None
            out, _ = jax.lax.scan(step, x, None, length=ITERS)
            return jnp.sum(out)
        return run

    enc_apply = lambda x: enc.apply(
        {"params": ev["params"], "batch_stats": ev["batch_stats"]}, x,
        train=True, rngs={"dropout": k}, mutable=["batch_stats"])[0]
    dec_apply = lambda z: dec.apply(
        {"params": dv["params"], "batch_stats": dv["batch_stats"]}, z,
        train=True, rngs={"dropout": k}, mutable=["batch_stats"])[0]
    dis_apply = lambda z: dis.apply(
        {"params": xv["params"]}, z, jnp.float32(0.5), train=True,
        rngs={"dropout": k, "noise": jax.random.fold_in(k, 3)})

    t = timed(scan_fwd(enc_apply, spec), spec)
    print(f"encoder fwd        : {t*1e3:8.2f} ms  (B={B}, act={act})", flush=True)
    t = timed(scan_bwd(lambda x: jnp.sum(enc_apply(x) ** 2), spec), spec)
    print(f"encoder fwd+bwd    : {t*1e3:8.2f} ms", flush=True)
    t = timed(scan_fwd(dec_apply, z0), z0)
    print(f"decoder fwd        : {t*1e3:8.2f} ms", flush=True)
    t = timed(scan_bwd(lambda z: jnp.sum(dec_apply(z) ** 2), z0), z0)
    print(f"decoder fwd+bwd    : {t*1e3:8.2f} ms", flush=True)
    t = timed(scan_bwd(lambda z: jnp.sum(dis_apply(z) ** 2), z0), z0)
    print(f"discrim fwd+bwd    : {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()

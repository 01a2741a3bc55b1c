"""Probe: per-epoch executed-op counts of the compiled flagship program and
a calibrated per-op issue floor — the ingredients for bench.py's
``roofline_pct``.

The training program is a scan-of-scans; XLA lowers each scan to a `while`
whose body executes once per iteration.  Counting real instructions in each
while body (fusions, dots, convs, custom-calls — not parameters/gte/tuple
plumbing) and multiplying by the statically-known trip counts gives the
exact number of device ops one epoch dispatches.  Combined with a measured
per-op issue floor (independent VMEM-resident vector ops inside one scan,
NOT the dependent-scalar chain of chip_calibration.py which upper-bounds
latency, not issue rate) this yields the op-bound "speed of light" for the
program shape.
"""
import re
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from rankaae_tpu.utils.hlo_count import (  # noqa: E402
    find_whiles,
    parse_computations,
    real_ops,
)


def main():
    import jax
    import jax.numpy as jnp

    from rankaae_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from rankaae_tpu.data.synthetic import make_synthetic_xanes
    from rankaae_tpu.train.trainer import RankAAETrainer, TrialData
    from rankaae_tpu.utils.config import TrainConfig

    trials, epochs, n_rows = 32, 50, 7000
    cfg = TrainConfig.from_yaml("/root/reference/example/fix_config.yaml").replace(
        max_epoch=epochs, trials=trials, rng_impl="rbg",
        activation_dtype="bfloat16", matmul_precision="default")
    aux, spec, _ = make_synthetic_xanes(n_rows=n_rows, dim=cfg.dim_in, seed=0)
    n_train, n_val = int(n_rows * 0.7), int(n_rows * 0.15)
    data = TrialData(
        train_spec=jnp.asarray(spec[:n_train], jnp.float32),
        train_aux=jnp.asarray(aux[:n_train], jnp.float32),
        val_spec=jnp.asarray(spec[n_train:n_train + n_val], jnp.float32),
        val_aux=jnp.asarray(aux[n_train:n_train + n_val], jnp.float32),
    )
    trainer = RankAAETrainer(cfg, n_train=n_train, n_val=n_val)
    keys = jax.random.split(jax.random.PRNGKey(0), trials)
    states = jax.jit(jax.vmap(trainer.init_state))(keys)
    run = jax.jit(jax.vmap(trainer.run, in_axes=(0, None)))
    t0 = time.time()
    compiled = run.lower(states, data).compile()
    print(f"compile {time.time()-t0:.1f}s", file=sys.stderr)

    hlo = compiled.as_text()
    comps, entry = parse_computations(hlo)
    print(f"computations: {len(comps)}, entry: {entry}")

    # walk: entry -> outer while (epochs) -> body -> inner while (batches)
    def describe(name, depth=0):
        lines = comps[name]
        ops = real_ops(lines)
        whiles = find_whiles(lines)
        print("  " * depth + f"{name}: {len(ops)} real ops, "
              f"{len(whiles)} while(s)")
        for b in whiles:
            describe(b, depth + 1)

    describe(entry)

    entry_ops = len(real_ops(comps[entry]))
    outer = find_whiles(comps[entry])[0]
    outer_ops = len(real_ops(comps[outer]))
    inners = find_whiles(comps[outer])
    inner_ops = len(real_ops(comps[inners[0]])) if inners else 0
    n_full = n_train // cfg.batch_size   # trailing partial batch is unrolled
    ops_epoch = outer_ops + n_full * inner_ops
    print(f"ops/epoch = {outer_ops} (epoch body incl. unrolled partial "
          f"batch + validation) + {n_full} x {inner_ops} (full-batch body) "
          f"= {ops_epoch}; one-time entry ops = {entry_ops}")

    # Per-op issue floor: a scan body of N elementwise ops separated by
    # optimization_barrier so XLA cannot fuse them — each survives as its
    # own scheduled op, measuring the per-op overhead a real program pays.
    ITERS = 30
    for n_ops, shape in ((100, (8, 128)), (100, (256, 256))):
        x0 = jnp.asarray(np.random.default_rng(0).standard_normal(shape),
                         jnp.float32)

        @jax.jit
        def run_barrier(x0):
            def step(c, _):
                x = c
                for i in range(n_ops):
                    x = x * (1.0 + 1e-7) + 1e-9
                    x = jax.lax.optimization_barrier(x)
                return x, None
            out, _ = jax.lax.scan(step, x0, None, length=ITERS)
            return jnp.sum(out)

        np.asarray(run_barrier(x0))
        walls = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(run_barrier(x0))
            walls.append(time.time() - t0)
        per_op = min(walls) / ITERS / n_ops
        print(f"barrier-separated op floor @ {shape}: {per_op*1e6:.2f} us/op "
              f"({n_ops} ops/iter, wall {min(walls):.3f}s)")


if __name__ == "__main__":
    main()

"""Phase-split measurement of the flagship training epoch on the chip.

Times three compiled variants of the same 50-epoch x 32-trial program and
differences the walls:

  A  full program (what bench.py measures)
  B  validation forward stubbed out (zero losses, zero z_val) — isolates
     the per-epoch validation encoder/decoder/discriminator pass
  C  B + the on-device metric stats stubbed (Shapiro-W, Spearman sorts)

A-B = validation-forward cost; B-C = metric-stats cost; C = train-batch
protocol + plateau/best bookkeeping.  Decides where further optimization
effort goes (the matmuls themselves already measure at ~81 TFLOP/s
effective — speed-of-light; scripts/carry_probe.py).

Usage: python scripts/phase_split.py [--epochs 50] [--trials 32]
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


def _wall(run, states, data):
    np.asarray(jax.tree_util.tree_leaves(run(states, data))[0])
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = run(states, data)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.time() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--trials", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from rankaae_tpu.data.synthetic import make_synthetic_xanes
    from rankaae_tpu.train import trainer as trainer_mod
    from rankaae_tpu.train.trainer import RankAAETrainer, TrialData
    from rankaae_tpu.utils.config import TrainConfig
    from rankaae_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    cfg = TrainConfig.from_yaml(
        "/root/reference/example/fix_config.yaml"
    ).replace(max_epoch=args.epochs, trials=args.trials, rng_impl="rbg",
              activation_dtype="bfloat16")
    aux, spec, _ = make_synthetic_xanes(n_rows=7000, dim=cfg.dim_in, seed=0)
    n_train, n_val = 4900, 1050
    data = TrialData(
        train_spec=jnp.asarray(spec[:n_train], jnp.float32),
        train_aux=jnp.asarray(aux[:n_train], jnp.float32),
        val_spec=jnp.asarray(spec[n_train:n_train + n_val], jnp.float32),
        val_aux=jnp.asarray(aux[n_train:n_train + n_val], jnp.float32),
    )

    result = {"epochs": args.epochs, "trials": args.trials}
    walls = {}
    orig_validate = RankAAETrainer._validate
    orig_shapiro = trainer_mod.min_style_shapiro
    orig_spear = trainer_mod.max_interstyle_spearman
    try:
        for variant in ("A_full", "B_no_validation", "C_no_val_no_stats"):
            if variant == "B_no_validation":
                def stub_validate(self, state, data, alpha, key):
                    z = jnp.zeros((data.val_spec.shape[0], self.cfg.nstyle),
                                  jnp.float32)
                    zero = jnp.float32(0.0)
                    return z, {k: zero for k in
                               ("dis", "gen", "aux", "recon", "smooth", "mi")}
                RankAAETrainer._validate = stub_validate
            if variant == "C_no_val_no_stats":
                trainer_mod.min_style_shapiro = lambda z: jnp.float32(0.5)
                trainer_mod.max_interstyle_spearman = lambda z: jnp.float32(0.5)
            trainer = RankAAETrainer(cfg, n_train=n_train, n_val=n_val)
            keys = jax.random.split(jax.random.PRNGKey(0), args.trials)
            states = jax.jit(jax.vmap(trainer.init_state))(keys)
            run = jax.jit(jax.vmap(trainer.run, in_axes=(0, None)))
            t0 = time.time()
            run_c = run.lower(states, data).compile()
            print(f"{variant}: compile {time.time()-t0:.1f}s", file=sys.stderr)
            w = _wall(run_c, states, data)
            walls[variant] = w
            print(f"{variant}: {w:.3f}s "
                  f"({w/args.epochs*1e3:.2f} ms/epoch)", file=sys.stderr)
    finally:
        RankAAETrainer._validate = orig_validate
        trainer_mod.min_style_shapiro = orig_shapiro
        trainer_mod.max_interstyle_spearman = orig_spear

    result["walls_s"] = {k: round(v, 4) for k, v in walls.items()}
    a, b, c = (walls[k] for k in
               ("A_full", "B_no_validation", "C_no_val_no_stats"))
    result["validation_share"] = round((a - b) / a, 4)
    result["stats_share"] = round((b - c) / a, 4)
    result["train_batches_share"] = round(c / a, 4)
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()

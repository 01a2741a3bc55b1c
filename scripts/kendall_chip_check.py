"""On-chip Pallas Kendall-kernel parity check (re-runnable, one JSON line).

Compiles BOTH Kendall paths — the XLA rank-trick fallback
(``ops.kendall.kendall_constraint``) and the fused Pallas kernel with its
custom VJP (``ops.kendall_pallas.kendall_constraint_pallas``) — on the REAL
TPU chip and asserts loss AND grad agreement over the full case grid:

* activate False / True (unweighted and concordant-reweighted forms,
  reference ``sc/utils/functions.py:37-79``),
* float32 and bfloat16 input activations (both paths cast to f32
  internally, so agreement stays float-tight),
* full (1024) and ragged (1000, not a block multiple) batches — the ragged
  case exercises the kernel's zero-pad + true-batch masking.

Usage:  python scripts/kendall_chip_check.py [--out KENDALL_CHECK.json]
Prints one JSON line (and writes it to --out); exits non-zero on mismatch.
Referenced from .claude/skills/verify/SKILL.md; record per round like BENCH.
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

LOSS_TOL = 1e-4        # relative; both paths compute in f32 (loss is f32
GRAD_TOL_F32 = 1e-4    # even for bf16 styles), only reduction order differs
GRAD_TOL_BF16 = 8e-3   # grads are returned IN the input dtype: bf16 grads
                       # are both rounded to 8-bit mantissa, so allow ~2 ulp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="KENDALL_CHECK.json")
    ap.add_argument("--platform", default=None,
                    help="override jax platform (e.g. cpu for a smoke run; "
                         "the Pallas kernels then run in interpret mode)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from rankaae_tpu.ops import kendall as kx
    from rankaae_tpu.ops import kendall_pallas as kp
    from rankaae_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    if args.platform == "cpu":
        kp._INTERPRET = True

    rng = np.random.default_rng(7)
    cases = []
    worst = {"loss_rel": 0.0, "grad_rel": 0.0}
    for b in (1024, 1000):
        d_np = rng.normal(size=(b, 5)).astype(np.float32)
        s_np = rng.normal(size=(b, 5)).astype(np.float32)
        # correlate some columns so concordant/discordant counts are skewed
        s_np[:, :2] += 2.0 * d_np[:, :2]
        # exact ties in styles AND descriptors: the grad boundary case
        # (tied pairs carry weight-1 gradient, see ops/kendall.py)
        s_np[5] = s_np[6]
        d_np[7] = d_np[8]
        for dtype in (jnp.float32, jnp.bfloat16):
            d = jnp.asarray(d_np)              # descriptors are f32 constants
            s = jnp.asarray(s_np, dtype)       # styles: the activation dtype
            for activate in (False, True):
                f_x = jax.jit(jax.value_and_grad(
                    lambda s_: kx.kendall_constraint(d, s_, activate)))
                f_p = jax.jit(jax.value_and_grad(
                    lambda s_: kp.kendall_constraint_pallas(d, s_, activate)))
                lx, gx = f_x(s)
                lp, gp = f_p(s)
                # np.asarray is the reliable axon sync barrier
                lx, lp = float(np.asarray(lx)), float(np.asarray(lp))
                gx = np.asarray(gx, np.float32)
                gp = np.asarray(gp, np.float32)
                loss_rel = abs(lp - lx) / max(abs(lx), 1e-12)
                denom = max(float(np.abs(gx).max()), 1e-12)
                grad_rel = float(np.abs(gp - gx).max()) / denom
                grad_tol = GRAD_TOL_F32 if dtype == jnp.float32 \
                    else GRAD_TOL_BF16
                ok = loss_rel < LOSS_TOL and grad_rel < grad_tol
                cases.append({
                    "batch": b, "dtype": dtype.__name__, "activate": activate,
                    "loss_xla": lx, "loss_pallas": lp,
                    "loss_rel_err": loss_rel, "grad_rel_err": grad_rel,
                    "ok": bool(ok),
                })
                worst["loss_rel"] = max(worst["loss_rel"], loss_rel)
                worst["grad_rel"] = max(worst["grad_rel"], grad_rel)
                print(f"B={b} {dtype.__name__} activate={activate}: "
                      f"loss {lx:.6f} vs {lp:.6f} (rel {loss_rel:.2e}), "
                      f"grad rel {grad_rel:.2e} -> "
                      f"{'OK' if ok else 'MISMATCH'}", file=sys.stderr)

    all_ok = all(c["ok"] for c in cases)
    result = {
        "metric": "kendall_pallas_chip_parity",
        "ok": all_ok,
        "cases": len(cases),
        "max_rel_loss_err": worst["loss_rel"],
        "max_rel_grad_err": worst["grad_rel"],
        "loss_tol": LOSS_TOL,
        "grad_tol_f32": GRAD_TOL_F32,
        "grad_tol_bf16": GRAD_TOL_BF16,
        "platform": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({**result, "case_grid": cases}, f, indent=1)
    if not all_ok:
        sys.exit(1)


if __name__ == "__main__":
    main()

"""Attribute the training program's executed ops to source subsystems.

``bench.py``'s roofline showed the flagship FC program runs ~11.3K executed
ops/epoch at an effective ~3 us/op — an op-count/pipeline-bound regime, not
an MXU-throughput one (the padded-MXU bound is 3.26x faster than measured,
BENCH_r03).  Before optimizing anything, this tool answers: *which code owns
the ops?*  It walks the compiled HLO's while-loop nest (the scan-of-scans),
takes every REAL instruction of the batch body / epoch body, and histograms
them by the ``source_file`` each op's metadata cites (fusions cite a
representative op — good enough for attribution at this granularity).

Usage:
    python scripts/op_breakdown.py [--hlo /tmp/flagship_hlo.txt]
    python scripts/op_breakdown.py --compile   # compile fresh on the
                                               # current backend and dump
"""
from __future__ import annotations

import argparse
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rankaae_tpu.utils.hlo_count import (  # noqa: E402
    find_whiles,
    opcode,
    parse_computations,
    real_ops,
)

_SRC = re.compile(r'source_file="([^"]+)"')
_OPNAME = re.compile(r'op_name="([^"]+)"')
_CALLS = re.compile(r"(?:calls|to_apply)=%?([\w.\-]+)")


def _shorten(path: str) -> str:
    for root in ("/root/repo/", "site-packages/"):
        if root in path:
            return path.split(root, 1)[1]
    return path


def _attribute(line: str, comps) -> str:
    m = _SRC.search(line)
    if m:
        return _shorten(m.group(1))
    # fusions/calls without own metadata: majority-vote over the body
    c = _CALLS.search(line)
    if c and c.group(1) in comps:
        votes = Counter()
        for inner in comps[c.group(1)]:
            mm = _SRC.search(inner)
            if mm:
                votes[_shorten(mm.group(1))] += 1
        if votes:
            return votes.most_common(1)[0][0]
    return "<no-metadata>"


def _opkind(line: str) -> str:
    return opcode(line) or "?"


def breakdown(hlo_text: str):
    comps, entry = parse_computations(hlo_text)
    out = {}
    outers = find_whiles(comps[entry])
    bodies = [("entry", entry)]
    if outers:
        bodies.append(("epoch_body", outers[0]))
        inners = find_whiles(comps[outers[0]])
        for i, b in enumerate(inners):
            bodies.append((f"inner_body_{i}", b))
    for label, comp in bodies:
        ops = real_ops(comps[comp])
        by_file = Counter(_attribute(l, comps) for l in ops)
        by_kind = Counter(_opkind(l) for l in ops)
        by_file_kind = Counter(
            (_attribute(l, comps), _opkind(l)) for l in ops)
        out[label] = {"n_ops": len(ops), "by_file": by_file,
                      "by_kind": by_kind, "by_file_kind": by_file_kind}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hlo", default="/tmp/flagship_hlo.txt")
    ap.add_argument("--compile", action="store_true",
                    help="compile the flagship program fresh and analyze it")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    if args.compile:
        import jax
        import jax.numpy as jnp

        from rankaae_tpu.data.synthetic import make_synthetic_xanes
        from rankaae_tpu.train.trainer import RankAAETrainer, TrialData
        from rankaae_tpu.utils.config import TrainConfig
        from rankaae_tpu.utils.profiling import enable_compilation_cache

        enable_compilation_cache()
        cfg = TrainConfig.from_yaml(
            "/root/reference/example/fix_config.yaml"
        ).replace(max_epoch=50, trials=32, rng_impl="rbg",
                  activation_dtype="bfloat16")
        aux, spec, _ = make_synthetic_xanes(n_rows=7000, dim=cfg.dim_in, seed=0)
        n_train, n_val = 4900, 1050
        data = TrialData(
            train_spec=jnp.asarray(spec[:n_train], jnp.float32),
            train_aux=jnp.asarray(aux[:n_train], jnp.float32),
            val_spec=jnp.asarray(spec[n_train:n_train + n_val], jnp.float32),
            val_aux=jnp.asarray(aux[n_train:n_train + n_val], jnp.float32),
        )
        trainer = RankAAETrainer(cfg, n_train=n_train, n_val=n_val)
        keys = jax.random.split(jax.random.PRNGKey(0), 32)
        states = jax.jit(jax.vmap(trainer.init_state))(keys)
        run = jax.jit(jax.vmap(trainer.run, in_axes=(0, None)))
        compiled = run.lower(states, data).compile()
        hlo = compiled.as_text()
        with open("/tmp/flagship_hlo_production.txt", "w") as f:
            f.write(hlo)
        print("wrote /tmp/flagship_hlo_production.txt", file=sys.stderr)
    else:
        with open(args.hlo) as f:
            hlo = f.read()

    for label, info in breakdown(hlo).items():
        print(f"\n== {label}: {info['n_ops']} real ops")
        for f, n in info["by_file"].most_common(args.top):
            print(f"  {n:6d}  {f}")
        print("  -- by op kind:")
        for k, n in info["by_kind"].most_common(args.top):
            print(f"  {n:6d}  {k}")
        print("  -- by (file, kind):")
        for (f, k), n in info["by_file_kind"].most_common(args.top):
            print(f"  {n:6d}  {k:20s} {f}")


if __name__ == "__main__":
    main()

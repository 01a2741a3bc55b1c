"""Benchmark: training throughput of the flagship config on one chip.

Metric: spectra/sec/chip while running the FULL 6-loss / 7-optimizer
protocol (``example/fix_config.yaml`` shapes: FC form, n_layers=5, batch
1024, ~4900 training spectra) with 32 hyperparameter-identical trials
resident as a vmapped axis on the chip — the reference's own test-fixture
configuration (``sc/tests/data/fix_config.yaml``: ``trials: 32``); its
process pool trains at most one trial per device.

Baseline: the reference's committed fixture runs — 1500 epochs over ~4900
spectra in ~2947 s on one CUDA GPU per trial (BASELINE.md) =
4900 * 1500 / 2947 ~= 2494 spectra/sec/device.  vs_baseline is our
per-chip throughput over that number (the driver's north-star compares
against the CPU reference, which is far slower; GPU is the harder bar).

Prints ONE JSON line:
  {"metric": "spectra_per_sec_per_chip_training", "value": N,
   "unit": "spectra/s/chip", "vs_baseline": N, "flops_per_sec": N,
   "mfu_pct": N}

``--form normal|compact`` benchmarks the conv autoencoder families instead
(at ``matmul_precision: default`` by default — what production would use;
``--precision highest`` works too, with a ~19 min first compile for the
deep "normal" program); the JSON metric name is suffixed with the form.
"""
import argparse
import json
import sys
import time

import numpy as np

# TPU v5e (v5 lite) peak: 197 TFLOP/s bf16 on the MXU.  MFU below is vs this
# number; at matmul_precision "highest" the MXU runs f32-accurate passes so
# the achievable ceiling is lower — MFU is then conservative.
V5E_PEAK_FLOPS = 197e12


# Measured on THIS chip through the tunnel (scripts/chip_calibration.py):
# large-matmul bf16 throughput.  The datasheet 197 TFLOP/s is not reachable
# by any program here, so the roofline gates against the measured peak.
V5E_MEASURED_BF16 = 90e12


def _pass_counts(grl: bool, smooth: bool, protocol: str):
    """(enc, dec, dis) forward-equivalent pass counts per batch.

    faithful: trainer._train_batch — 7 encoder forwards (4 with backward),
    4 decoder forwards (3 with backward), one 2B discriminator fwd+bwd.
    fused: trainer._train_batch_fused — 2 encoder / 2 decoder forwards
    (spec path + MI latent cycle) and one VJP pullback per loss (backward
    ~ 2x forward; the smoothness pullback only runs while smooth is on)."""
    if protocol == "joint":
        # 2 enc / 2 dec forwards (spec path + MI cycle), ONE backward
        enc_passes = 2 + 2 * 2
        dec_passes = 2 + 2 * 2
        dis_passes = 2 * (1 + 2)
    elif protocol == "fused":
        enc_passes = 2 + 2 * (5 if smooth else 4)
        dec_passes = 2 + 2 * (3 if smooth else 2)
        dis_passes = 2 * (1 + 2) if grl else 3 * (1 + 2)
    else:
        enc_passes = 7 + 2 * 4
        dec_passes = (4 if smooth else 3) + 2 * (3 if smooth else 2)
        dis_passes = 2 * (1 + 2) if grl else 3 * (1 + 2)
    return enc_passes, dec_passes, dis_passes


def _analytic_padded_flops_per_sample(cfg, grl: bool, smooth: bool,
                                      protocol: str = "faithful") -> float:
    """MXU TILE-PADDED matmul FLOPs per training sample — the achievable
    ceiling for this model's shapes: the 128x128 systolic array processes
    every (K, N) rounded up to full tiles (N=6 style heads cost as much as
    N=128), M streams through.  Pass counts follow the protocol's batch
    step, exactly as in :func:`_analytic_flops_per_sample`."""
    pad = lambda d: -(-d // 128) * 128
    h = 64   # FC hidden size (models/encoders.py:28)
    enc = [(cfg.dim_in, h)] + [(h, h)] * (cfg.n_layers - 2) + [(h, cfg.nstyle)]
    dec = [(cfg.nstyle, h)] + [(h, h)] * (cfg.n_layers - 2) + [(h, cfg.dim_out)]
    dis = [(cfg.nstyle, h)] + \
        [(h, h)] * (cfg.FC_discriminator_layers - 1) + [(h, 1)]
    per = lambda dims: sum(2.0 * pad(k) * pad(n) for k, n in dims)
    enc_passes, dec_passes, dis_passes = _pass_counts(grl, smooth, protocol)
    return (per(enc) * enc_passes + per(dec) * dec_passes
            + per(dis) * dis_passes)


def _roofline(compiled, wall, epochs, n_train, cfg, grl, smooth, trials,
              protocol="faithful"):
    """Speed-of-light accounting for the measured program.

    The binding bound at this model size is the TILE-PADDED MXU time at
    the measured chip peak — the floors one might naively gate against are
    demonstrably NOT binding and are reported as evidence:

    * serial op-issue model (executed-op count from the compiled HLO's
      while nest x the ~10 us/op cost of deliberately-unfused ops): the
      program runs ~3x FASTER than it — XLA's schedule pipelines ops.
    * HBM-materialization model (every scheduled op's output buffer
      touching HBM at the measured 170 GB/s): the program runs ~5x faster
      — the scan working set stays VMEM-resident.

    Returns a dict merged into the bench JSON; ``roofline_pct`` is
    measured-floor / measured-wall against the padded-MXU bound."""
    from rankaae_tpu.utils.hlo_count import scan_nest_op_counts

    counts = scan_nest_op_counts(compiled.as_text())
    n_full = n_train // cfg.batch_size   # trailing partial batch unrolled
    ops_per_epoch = counts["epoch_body_ops"] + n_full * counts["batch_body_ops"]

    padded_fps = _analytic_padded_flops_per_sample(cfg, grl, smooth,
                                                   protocol=protocol)
    total_padded = padded_fps * trials * n_train * epochs
    mxu_padded_bound_s = total_padded / V5E_MEASURED_BF16

    # non-binding context models (see docstring)
    op_model_s = (counts["entry_ops"] + epochs * ops_per_epoch) * 10e-6
    extra = {}
    if protocol != "faithful":
        # the cross-protocol yardstick: percent of the FAITHFUL workload's
        # tile-padded speed-of-light (the fast protocols do less padded
        # work per sample, so their self-relative roofline_pct is not
        # comparable to the faithful 30.7%)
        faithful_bound_s = (_analytic_padded_flops_per_sample(
            cfg, grl, smooth, protocol="faithful")
            * trials * n_train * epochs / V5E_MEASURED_BF16)
        extra["pct_of_faithful_protocol_sol"] = round(
            100.0 * faithful_bound_s / wall, 1)
    return {
        **extra,
        "ops_per_epoch": ops_per_epoch,
        "padded_mflop_per_sample": round(padded_fps / 1e6, 3),
        "mxu_padded_bound_s": round(mxu_padded_bound_s, 4),
        "op_model_s": round(op_model_s, 4),
        "roofline_pct": round(100.0 * mxu_padded_bound_s / wall, 1),
        # The padded-MXU bound is NOT attainable for this protocol: the
        # round-4 on-chip probes (PERF_NOTES_r04.md, artifacts/perf_r04)
        # measured the batched matmuls at ~90% of chip peak already, and
        # both proposed levers (carry flattening, trial-pair tile packing)
        # as washes — the residual gap is the op/HBM pipeline cost of the
        # reference's 5-pass-per-batch, 7-optimizer semantics.
        "roofline_note": "padded-MXU bound unattainable for this protocol; "
                         "see PERF_NOTES_r04.md",
    }


def _reference_available():
    import os

    return os.path.exists("/root/reference/example/fix_config.yaml")


def _fallback_cfg(epochs, trials):
    from rankaae_tpu.utils.config import TrainConfig

    return TrainConfig(
        max_epoch=epochs, trials=trials, batch_size=1024, nstyle=6, n_aux=5,
        ae_form="FC", n_layers=5, decoder_activation="Softplus",
        optimizer_name="AdamW", gradient_reversal=True,
        alpha_flat_step=739, alpha_limit=0.7172,
        dis_beta=1.1, gen_beta=1.1, dis_dropout_rate=0.056, dis_noise=0.56,
        dropout_rate=0.04, lr_base=1e-3, lr_ratio_Corr=10, lr_ratio_Mutual=1,
        lr_ratio_Reconn=10, lr_ratio_Smooth=1, lr_ratio_dis=1, lr_ratio_gen=10,
        spec_noise=0.02, use_flex_spec_target=True, weight_decay=0.01,
        kendall_activation=True, epoch_stop_smooth=1500,
        sch_factor=0.1, sch_patience=100,
    )


def _analytic_flops_per_sample(params, n_trials, grl: bool, smooth: bool,
                               protocol: str = "faithful"):
    """Matmul FLOPs per training sample of the per-batch protocol.

    XLA's ``cost_analysis`` counts each ``lax.scan`` body ONCE, so it
    underreports a scan-of-scans training program by epochs x batches; this
    counts passes analytically instead.  Backward ~ 2x forward; pass counts
    per protocol in :func:`_pass_counts`."""
    import jax

    count = lambda t: sum(int(np.prod(x.shape))
                          for x in jax.tree_util.tree_leaves(t))
    p_enc = count(params["enc"]) // n_trials
    p_dec = count(params["dec"]) // n_trials
    p_dis = count(params["dis"]) // n_trials
    enc_passes, dec_passes, dis_passes = _pass_counts(grl, smooth, protocol)
    return 2.0 * (p_enc * enc_passes + p_dec * dec_passes + p_dis * dis_passes)


def bench(form: str, trials: int, epochs: int, n_rows: int,
          precision: str = None, rng_impl: str = "rbg",
          act_dtype: str = "float32", remat: bool = False,
          scan_unroll: int = 1, protocol: str = "faithful",
          emit: str = "stdout", extra: dict | None = None):
    import jax
    import jax.numpy as jnp

    from rankaae_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from rankaae_tpu.data.synthetic import make_synthetic_xanes
    from rankaae_tpu.train.trainer import RankAAETrainer, TrialData
    from rankaae_tpu.utils.config import TrainConfig

    cfg = TrainConfig.from_yaml("/root/reference/example/fix_config.yaml").replace(
        max_epoch=epochs, trials=trials
    ) if _reference_available() else _fallback_cfg(epochs, trials)
    if form != "FC":
        # conv families default to "default" precision (bf16 MXU passes —
        # the production setting; "highest" also compiles, ~19 min first
        # time for the deep "normal" program, override via --precision)
        cfg = cfg.replace(ae_form=form, matmul_precision="default")
    if precision is not None:
        cfg = cfg.replace(matmul_precision=precision)
    cfg = cfg.replace(rng_impl=rng_impl, activation_dtype=act_dtype,
                      remat=remat, scan_unroll=scan_unroll,
                      protocol=protocol)
    if scan_unroll > 1 and jax.devices()[0].platform == "tpu":
        # measured round 4: unroll=2 at flagship scale compiled for 41 min
        # and then killed the remote compile helper (same failure mode as
        # remat x 32 residents)
        raise SystemExit(
            "--unroll > 1 is not supported on TPU (crashes the remote "
            "compile helper at flagship scale); it is a CPU-mesh "
            "scheduling experiment"
        )
    if (remat and form != "FC" and jax.devices()[0].platform == "tpu"
            and trials > len(jax.devices()) * 8):
        # bench vmaps all trials resident (no waves, unlike run_trials,
        # which auto-caps at 8 residents/device); remat + 32 residents
        # crashes the TPU worker after a ~27-min compile (README)
        raise SystemExit(
            f"--remat with {trials} resident trials on TPU is outside the "
            "validated region (crashes the worker at 32); bench at "
            "--trials 8 or drop --remat"
        )

    aux, spec, _ = make_synthetic_xanes(n_rows=n_rows, dim=cfg.dim_in, seed=0)
    n_train = int(n_rows * 0.7)
    n_val = int(n_rows * 0.15)
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
    print(f"compile: {time.time() - t0:.1f}s", file=sys.stderr)

    # timed execution (compile excluded); best of 3 to damp the tunneled
    # chip's dispatch-latency variance
    walls = []
    for _ in range(3):
        t0 = time.time()
        out_states, logs = compiled(states, data)
        # np.asarray forces full host materialization; block_until_ready
        # does not reliably block on the experimental axon platform
        np.asarray(logs["combined"])
        walls.append(time.time() - t0)
    wall = min(walls)
    print(f"walls: {[round(w, 2) for w in walls]}", file=sys.stderr)

    final_recon = np.asarray(logs["val_recon"])[:, -1]
    spectra_per_sec = trials * n_train * epochs / wall
    baseline = 4900 * 1500 / 2947.0  # reference GPU fixture throughput

    suffix = "" if form == "FC" else f"_{form}"
    if protocol != "faithful":
        suffix += f"_{protocol}"
    result = {
        "metric": f"spectra_per_sec_per_chip_training{suffix}",
        "value": round(float(spectra_per_sec), 1),
        "unit": "spectra/s/chip",
        "vs_baseline": round(float(spectra_per_sec / baseline), 2),
        # self-describing settings (the production defaults differ from the
        # parity-exact f32/threefry/highest configuration)
        "activation_dtype": cfg.activation_dtype,
        "matmul_precision": cfg.matmul_precision,
        "rng_impl": cfg.rng_impl,
        "trials": trials,
        "epochs": epochs,
    }
    if form == "FC":
        # the 2*params-per-pass estimate is exact only for dense layers;
        # conv forms reuse weights across positions, so MFU is reported for
        # the flagship FC form only
        fps = _analytic_flops_per_sample(
            out_states.params, trials, grl=cfg.gradient_reversal,
            smooth=epochs <= cfg.epoch_stop_smooth, protocol=protocol,
        )
        flops_per_sec = fps * spectra_per_sec
        result["flops_per_sec"] = round(flops_per_sec, 1)
        result["mfu_pct"] = round(100.0 * flops_per_sec / V5E_PEAK_FLOPS, 3)
        print(
            f"analytic {fps/1e6:.2f} MFLOP/sample -> "
            f"{flops_per_sec/1e12:.3f} TFLOP/s = {result['mfu_pct']:.3f}% of "
            "v5e bf16 peak (63K-param model at batch 1024: vector/HBM-bound "
            "by design; the MXU ceiling is irrelevant at this arithmetic "
            "intensity)",
            file=sys.stderr,
        )
        result.update(_roofline(
            compiled, wall, epochs, n_train, cfg,
            grl=cfg.gradient_reversal, smooth=epochs <= cfg.epoch_stop_smooth,
            trials=trials, protocol=protocol))
        print(
            f"roofline: tile-padded MXU bound "
            f"{result['mxu_padded_bound_s']}s at the measured "
            f"{V5E_MEASURED_BF16/1e12:.0f} TFLOP/s peak vs measured "
            f"{wall:.2f}s -> {result['roofline_pct']}% of speed-of-light "
            f"for these shapes; serial-op model {result['op_model_s']}s "
            f"({result['ops_per_epoch']} executed ops/epoch) is beaten — "
            "not binding",
            file=sys.stderr,
        )
    print(
        f"wall: {wall:.2f}s for {trials} trials x {epochs} epochs "
        f"(form {cfg.ae_form}, batch {cfg.batch_size}, {n_train} train rows); "
        f"median final val recon MSE: {np.median(final_recon):.5f}",
        file=sys.stderr,
    )
    if extra:
        result.update(extra)
    print(json.dumps(result),
          file=sys.stderr if emit == "stderr" else sys.stdout)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--form", default="FC", choices=["FC", "normal", "compact"])
    # default trials: 32 (the reference fixture config) for FC; 8 for the
    # conv families — the deep "normal" program OOM-crashes the TPU worker
    # at 32 resident trials (verify SKILL.md)
    ap.add_argument("--trials", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--rows", type=int, default=7000)
    # production precision: bf16 MXU passes.  Quality equivalence vs the
    # parity-exact "highest" (6x f32 passes) is measured — 8-seed 1500-epoch
    # final recon MSE distributions overlap (median 0.0042 bf16 vs 0.0062
    # f32; README Performance) — and bf16 is ~1.4x faster end-to-end.
    # `--precision highest` reproduces the parity-exact number.
    ap.add_argument("--precision", default="default",
                    choices=["highest", "default"])
    # TPU hardware RNG for the ~100+ per-batch dropout/noise draws — the
    # measured ~1.65x end-to-end win over threefry; quality validated at
    # convergence (README Performance).  --rng threefry reproduces the
    # counter-based-RNG number.
    ap.add_argument("--rng", default="rbg", choices=["threefry", "rbg"])
    # bf16 activation storage: the training program is HBM/op-floor bound,
    # so halving every materialized activation buffer is a direct win
    # (+6.5% FC, +41% compact, +28% normal).  Quality validated like the
    # precision/rng knobs: 8-seed 1500-epoch final recon MSE median 0.0043
    # vs 0.0033 (f32 act) — overlapping distributions, both better than the
    # torch reference's 0.0047 (PARITY_RESULTS.md).  --act float32
    # reproduces the f32-activation numbers.
    ap.add_argument("--act", default="bfloat16",
                    choices=["float32", "bfloat16"])
    # jax.checkpoint on the conv blocks (config `remat`): recompute
    # activations in the backward for peak-memory headroom — the lever for
    # high resident-trial counts on the deep "normal" form
    ap.add_argument("--remat", action="store_true")
    # per-batch optimization protocol: "faithful" = the reference's
    # sequential 5-pass sweep; "fused" = one shared forward + joint updates;
    # "joint" = one weighted-sum objective, one backward (net-new fast
    # paths, quality-gated in PARITY_FUSED.md).  Default (flag omitted, FC
    # form): bench BOTH faithful (the stdout headline, apples-to-apples
    # with the torch baseline protocol) and joint (second JSON line on
    # stderr + joint_* fields in the headline line).
    ap.add_argument("--protocol", default=None,
                    choices=["faithful", "fused", "joint"])
    # lax.scan unroll over the per-epoch batch loop (numerics-neutral;
    # lets XLA overlap independent chains across batch steps)
    ap.add_argument("--unroll", type=int, default=1)
    args = ap.parse_args()
    trials = args.trials if args.trials is not None else (
        32 if args.form == "FC" else 8)
    kw = dict(precision=args.precision, rng_impl=args.rng,
              act_dtype=args.act, remat=args.remat, scan_unroll=args.unroll)
    if args.protocol is None and args.form == "FC":
        joint = bench(args.form, trials, args.epochs, args.rows,
                      protocol="joint", emit="stderr", **kw)
        bench(args.form, trials, args.epochs, args.rows,
              protocol="faithful",
              extra={"joint_value": joint["value"],
                     "joint_vs_baseline": joint["vs_baseline"],
                     "joint_pct_of_faithful_sol":
                         joint.get("pct_of_faithful_protocol_sol"),
                     "joint_note": "opt-in `protocol: joint` fast path, "
                                   "quality-gated in PARITY_FUSED.md"},
              **kw)
    else:
        bench(args.form, trials, args.epochs, args.rows,
              protocol=args.protocol or "faithful", **kw)


if __name__ == "__main__":
    main()

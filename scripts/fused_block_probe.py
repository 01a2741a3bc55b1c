"""Probe: fused Pallas kernel for the stride-1 EncodingBlock (eval mode).

Go/no-go experiment for a fused conv-block kernel: implements the decoder
tail's stride-1, c_in==c_out block (bn1 -> conv1(replicate pad) -> prelu ->
bn2 -> conv2(zero pad) -> prelu, + residual, + excitation MLP over the
length axis) as ONE Pallas kernel gridded over batch tiles, checks
equivalence against the unfused XLA block in eval mode, and times fused vs
unfused.  If the fused forward is not decisively faster, the full
train-mode + custom-VJP investment is not worth it.

Kernel style notes (learned the hard way): Mosaic hangs on tiny-channel
3-D dot_generals, so everything is statically unrolled over the C=4
channels as clean 2-D (TB, L) ops; conv weights/BN stats/PReLU slopes are
scalars read from SMEM.

Run on the real chip: python scripts/fused_block_probe.py [batch]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402
from jax.experimental import pallas as pl     # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

C = 4        # channels (c_in == c_out)
L = 256      # length
K = 11       # kernel size
PAD = 5      # (K-1)//2
E = 2        # excitation width
TB = 128     # batch tile (VMEM: ~30 live (TB,L) f32 buffers in-kernel)


def _edge_pad(x2d):
    """(TB, L) -> (TB, L + 2*PAD) with replicate padding on the lane axis."""
    left = x2d[:, 0:1]
    right = x2d[:, L - 1:L]
    return jnp.concatenate([left] * PAD + [x2d] + [right] * PAD, axis=1)


def _zero_pad(x2d):
    z = jnp.zeros_like(x2d[:, :PAD])
    return jnp.concatenate([z, x2d, z], axis=1)


def fused_block_kernel(x_ref, scal_ref, fc1w_ref, fc2w_ref, fc2b_ref, out_ref):
    """scal_ref (SMEM): flat scalar park —
    [bn1m(C), bn1v(C), b1(C), a1(C), bn2m(C), bn2v(C), b2(C), a2(C),
     fc1b(E), ae1(C), ae2(C), w1(C*C*K), w2(C*C*K)]."""
    eps = 1e-5
    o_bn1m, o_bn1v, o_b1, o_a1 = 0, C, 2 * C, 3 * C
    o_bn2m, o_bn2v, o_b2, o_a2 = 4 * C, 5 * C, 6 * C, 7 * C
    o_fc1b = 8 * C
    o_ae1 = 8 * C + E
    o_ae2 = o_ae1 + C
    o_w1 = o_ae2 + C
    o_w2 = o_w1 + C * C * K
    s = lambda i: scal_ref[i]

    # bn1 (eval: running stats), per channel
    xb = [
        (x_ref[:, c, :] - s(o_bn1m + c)) * jax.lax.rsqrt(s(o_bn1v + c) + eps)
        for c in range(C)
    ]

    def conv(inputs, pad_fn, w_off):
        """Tap-unrolled conv.  The shifted slice is hoisted out of the
        output-channel loop: unaligned lane slices are relayout COPIES on
        TPU, so this does C*K copies instead of C*C*K (the first version
        blew the 16M scoped-vmem limit on exactly this)."""
        acc = [None] * C
        for c in range(C):
            xp_c = pad_fn(inputs[c])
            for t in range(K):
                sh = xp_c[:, t:t + L]
                for o in range(C):
                    term = sh * s(w_off + (o * C + c) * K + t)
                    acc[o] = term if acc[o] is None else acc[o] + term
        return acc

    # conv1 (replicate pad) + prelu
    h = []
    for o, acc in enumerate(conv(xb, _edge_pad, o_w1)):
        acc = acc + s(o_b1 + o)
        a = s(o_a1 + o)
        h.append(jnp.where(acc >= 0, acc, a * acc))

    # bn2 (eval) + conv2 (zero pad) + prelu
    hb = [
        (h[c] - s(o_bn2m + c)) * jax.lax.rsqrt(s(o_bn2v + c) + eps)
        for c in range(C)
    ]
    h2 = []
    for o, acc in enumerate(conv(hb, _zero_pad, o_w2)):
        acc = acc + s(o_b2 + o)
        a = s(o_a2 + o)
        h2.append(jnp.where(acc >= 0, acc, a * acc))

    # excitation: Linear(L->E) -> PReLU -> Linear(E->L) -> PReLU
    fc1w = fc1w_ref[:]                               # (L, E)
    fc2w = fc2w_ref[:]                               # (E, L)
    fc2b = fc2b_ref[:]                               # (1, L)
    ex = []
    for c in range(C):
        e1 = jnp.dot(xb[c], fc1w, preferred_element_type=jnp.float32)
        e1 = e1 + jnp.concatenate(
            [jnp.full((1, 1), s(o_fc1b + j), jnp.float32) for j in range(E)],
            axis=1)
        a = s(o_ae1 + c)
        e1 = jnp.where(e1 >= 0, e1, a * e1)
        e2 = jnp.dot(e1, fc2w, preferred_element_type=jnp.float32) + fc2b
        a2x = s(o_ae2 + c)
        ex.append(jnp.where(e2 >= 0, e2, a2x * e2))

    for c in range(C):
        out_ref[:, c, :] = h2[c] + xb[c] + ex[c]


def pack_scalars(p):
    return jnp.concatenate([
        p["bn1m"], p["bn1v"], p["b1"], p["a1"],
        p["bn2m"], p["bn2v"], p["b2"], p["a2"],
        p["fc1b"], p["ae1"], p["ae2"],
        p["w1"].reshape(-1), p["w2"].reshape(-1),
    ]).astype(jnp.float32)


def fused_block(x, p, interpret=False):
    B = x.shape[0]
    scal = pack_scalars(p)
    return pl.pallas_call(
        fused_block_kernel,
        out_shape=jax.ShapeDtypeStruct((B, C, L), jnp.float32),
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, C, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, C, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        # Mosaic gives every unrolled op its own stack slot (~244 slots of
        # (TB, L) here), so the default 16M scoped-vmem limit needs raising
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, scal, p["fc1w"], p["fc2w"], p["fc2b"].reshape(1, L))


def reference_block(x, p):
    """Same math in plain XLA (mirrors the Flax EncodingBlock, eval mode)."""
    eps = 1e-5
    xb = (x - p["bn1m"].reshape(1, C, 1)) * jax.lax.rsqrt(
        p["bn1v"].reshape(1, C, 1) + eps)
    residual = xb
    xp = jnp.pad(xb, ((0, 0), (0, 0), (PAD, PAD)), mode="edge")
    h = jax.lax.conv_general_dilated(
        xp, p["w1"], (1,), "VALID", dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32) + p["b1"].reshape(1, C, 1)
    h = jnp.where(h >= 0, h, p["a1"].reshape(1, C, 1) * h)
    h = (h - p["bn2m"].reshape(1, C, 1)) * jax.lax.rsqrt(
        p["bn2v"].reshape(1, C, 1) + eps)
    hp = jnp.pad(h, ((0, 0), (0, 0), (PAD, PAD)))
    h2 = jax.lax.conv_general_dilated(
        hp, p["w2"], (1,), "VALID", dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32) + p["b2"].reshape(1, C, 1)
    h2 = jnp.where(h2 >= 0, h2, p["a2"].reshape(1, C, 1) * h2)
    ex = jnp.einsum("bcl,le->bce", residual, p["fc1w"]) + p["fc1b"].reshape(1, 1, E)
    ex = jnp.where(ex >= 0, ex, p["ae1"].reshape(1, C, 1) * ex)
    ex = jnp.einsum("bce,el->bcl", ex, p["fc2w"]) + p["fc2b"].reshape(1, 1, L)
    ex = jnp.where(ex >= 0, ex, p["ae2"].reshape(1, C, 1) * ex)
    return h2 + residual + ex


def make_inputs(B, seed=0):
    rng = np.random.default_rng(seed)
    f32 = lambda *s: jnp.asarray(rng.normal(size=s).astype("float32") * 0.3)
    x = f32(B, C, L)
    p = dict(bn1m=f32(C), bn1v=jnp.abs(f32(C)) + 0.5, w1=f32(C, C, K),
             b1=f32(C), a1=jnp.full((C,), 0.01, jnp.float32),
             bn2m=f32(C), bn2v=jnp.abs(f32(C)) + 0.5, w2=f32(C, C, K),
             b2=f32(C), a2=jnp.full((C,), 0.01, jnp.float32),
             fc1w=f32(L, E), fc1b=f32(E),
             ae1=jnp.full((C,), 0.01, jnp.float32),
             fc2w=f32(E, L), fc2b=f32(L),
             ae2=jnp.full((C,), 0.01, jnp.float32))
    return x, p


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    from rankaae_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    x, p = make_inputs(B)
    y_ref = np.asarray(jax.jit(reference_block)(x, p))
    y_fused = np.asarray(jax.jit(fused_block)(x, p))
    err = np.abs(y_fused - y_ref).max() / np.abs(y_ref).max()
    # the XLA reference runs bf16 matmul passes at DEFAULT precision on TPU
    # while the kernel does f32 VPU math, so ~1e-3 disagreement is the
    # reference's rounding, not the kernel's (interpret mode agrees to 2e-7)
    print(f"max rel err fused vs reference: {err:.2e}", flush=True)
    assert err < 5e-3, err

    ITERS = 30
    for name, fn in [("unfused", reference_block), ("fused", fused_block)]:
        @jax.jit
        def run(x, fn=fn):
            def step(c, _):
                return fn(c, p), None
            out, _ = jax.lax.scan(step, x, None, length=ITERS)
            return jnp.sum(out)
        out = run(x); np.asarray(out)
        walls = []
        for _ in range(3):
            t0 = time.time(); np.asarray(run(x)); walls.append(time.time() - t0)
        print(f"{name:8s}: {min(walls)/ITERS*1e3:7.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()

"""Stem breakdown A/B on the real TPU: where do the 6.1ms go?

conv7x7/s2 (+bias+relu) vs maxpool3x3/s2, f32 vs bf16 intermediates, and a
pure-XLA s2d^3 matmul reformulation of the stem conv.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from clipbert_tpu.core import compile_cache
compile_cache.enable()

from clipbert_tpu.models import resnet

B, IMG = 128, 448


def timeit(fn, args, iters=10, desc=""):
    @jax.jit
    def loop(args):
        def body(carry, _):
            return fn(carry, *args), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return acc

    t0 = time.perf_counter()
    acc = float(np.asarray(loop(args)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    acc = float(np.asarray(loop(args)))
    dt = time.perf_counter() - t0
    assert np.isfinite(acc), (desc, acc)
    print(f"  {desc}: {dt / iters * 1000:.3f} ms/iter (compile {compile_s:.0f}s)",
          flush=True)
    return dt / iters * 1000


def perturb(x, c):
    return x + (c * 1e-30).astype(x.dtype)


def main():
    want = set(sys.argv[1:])
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((B, IMG, IMG, 3)) * 0.5, jnp.bfloat16))
    p = jax.device_put(resnet.init_resnet50(jax.random.key(0)))
    kern = p["stem"]["conv"]["kernel"]
    bias = p["stem"]["bn"]["bias"]
    # conv output for pool-only tests
    conv_out = jax.jit(lambda x: jax.nn.relu(
        resnet.conv2d(x, kern, 2, [(3, 3), (3, 3)])
        + bias.astype(jnp.bfloat16)))(x)
    conv_out = jax.device_put(conv_out)

    def run(name, fn, args, iters=10):
        if want and name not in want:
            return
        timeit(fn, args, iters, name)

    run("conv_only",
        lambda c, x: (jax.nn.relu(
            resnet.conv2d(perturb(x, c), kern, 2, [(3, 3), (3, 3)])
            + bias.astype(jnp.bfloat16))).astype(jnp.float32).sum(), (x,))

    run("pool_only",
        lambda c, y: resnet.max_pool(
            perturb(y, c), 3, 2, [(0, 0), (1, 1), (1, 1), (0, 0)])
        .astype(jnp.float32).sum(), (conv_out,))

    # pool via 9 shifted strided slices (an XLA-fusable alternative)
    def pool9(y):
        yp = jnp.pad(y, ((0, 0), (1, 2), (1, 2), (0, 0)),
                     constant_values=0.0)  # relu output >= 0
        out = None
        for a in range(3):
            for b in range(3):
                s = yp[:, a:a + 223:2, b:b + 223:2, :]
                out = s if out is None else jnp.maximum(out, s)
        return out
    run("pool9_only",
        lambda c, y: pool9(perturb(y, c)).astype(jnp.float32).sum(),
        (conv_out,))

    # s2d^3 matmul stem conv (pure XLA): 49 shifted (3136,192)@(192,64) terms
    # X3: (B, 56, 56, 192) where cell (I,J) holds the 8x8 patch, channel
    # order (dy(8) major, dx(8), c(3)) after three space_to_depth passes?
    # Simpler: build X3 directly by reshape/transpose.
    def s2d3(x):
        b, H, W, C = x.shape
        x = x.reshape(b, H // 8, 8, W // 8, 8, C)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, H // 8, W // 8,
                                                     8 * 8 * C)

    # weights: w3[u, v][celldv, celldh] embedding. conv pixel (4I+a, 4J+b)
    # reads input rows 8I + 2a + du - 3 (du in 0..6). Global input row
    # = 8(I+dv) + rr, rr in 0..7 -> dv = floor((2a+du-3)/8), rr = mod.
    # static weight embedding (numpy; kernel values are constants here)
    kern_np = np.asarray(jax.device_get(kern), np.float32)
    ab_terms = {}
    for a in range(4):
        for b_ in range(4):
            terms = {}
            for du in range(7):
                for dvv in range(7):
                    gr = 2 * a + du - 3
                    gc = 2 * b_ + dvv - 3
                    cv, rr = divmod(gr, 8)
                    ch, cc = divmod(gc, 8)
                    t = terms.setdefault((cv, ch), np.zeros(
                        (8, 8, 3, 64), np.float32))
                    t[rr, cc] = kern_np[du, dvv]
            ab_terms[(a, b_)] = {k: jnp.asarray(v.reshape(192, 64),
                                                jnp.bfloat16)
                                 for k, v in terms.items()}

    def stem_s2d3(x):
        X3 = s2d3(x)  # (B, 56, 56, 192)
        Xp = jnp.pad(X3, ((0, 0), (1, 1), (1, 1), (0, 0)))
        outs = []
        for a in range(4):
            for b_ in range(4):
                acc = 0.0
                for (cv, ch), w192 in ab_terms[(a, b_)].items():
                    xs = jax.lax.dynamic_slice(
                        Xp, (0, 1 + cv, 1 + ch, 0),
                        (x.shape[0], 56, 56, 192))
                    acc = acc + jnp.einsum(
                        "bijk,kn->bijn", xs, w192,
                        preferred_element_type=jnp.float32)
                outs.append(acc)  # (B,56,56,64)
        # assemble (B,224,224,64): outs[a*4+b][B,I,J,:] = conv[4I+a, 4J+b]
        bb = x.shape[0]
        y = jnp.stack(outs, axis=1).reshape(bb, 4, 4, 56, 56, 64)
        y = y.transpose(0, 3, 1, 4, 2, 5).reshape(bb, 224, 224, 64)
        return jax.nn.relu(y + bias)

    if not want or "s2d3_conv" in want:
        # correctness vs reference conv first (cheap shapes on device)
        xs = x[:2]
        ref = jax.nn.relu(resnet.conv2d(xs, kern, 2, [(3, 3), (3, 3)])
                          + bias.astype(jnp.bfloat16))
        got = stem_s2d3(xs)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        print(f"  s2d3 max err vs conv: {err:.4f}", flush=True)
        run("s2d3_conv",
            lambda c, x: stem_s2d3(perturb(x, c)).astype(jnp.float32).sum(),
            (x,))

    run("stem_full_bf16",
        lambda c, x: resnet.max_pool(
            jax.nn.relu(
                resnet.conv2d(perturb(x, c), kern, 2, [(3, 3), (3, 3)])
                + bias.astype(jnp.bfloat16)),
            3, 2, [(0, 0), (1, 1), (1, 1), (0, 0)])
        .astype(jnp.float32).sum(), (x,))


if __name__ == "__main__":
    main()

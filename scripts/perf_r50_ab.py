"""R50 / full-unit perf A/B on the real TPU (run with no JAX_PLATFORMS set).

One process, sequential experiments, each timed with the on-device lax.scan
methodology from CLAUDE.md (carry-dependent body, fetch one scalar).

Usage: python scripts/perf_r50_ab.py [exp ...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from clipbert_tpu.core import compile_cache
compile_cache.enable()

from clipbert_tpu.core.config import ModelConfig
from clipbert_tpu.core.rng import RngGen
from clipbert_tpu.models import clipbert, resnet
from clipbert_tpu.train import steps

IMG = 448


def timeit(fn, args, iters, work_desc=""):
    """fn(carry, *args) -> scalar; chained on device `iters` times."""

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
    assert np.isfinite(acc), acc
    per = dt / iters * 1000
    print(f"  {work_desc}: {per:.3f} ms/iter (compile {compile_s:.0f}s)",
          flush=True)
    return per


def make_frames(b):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((b, IMG, IMG, 3)) * 0.5,
                       jnp.bfloat16)


def fold_params(p):
    """kernel *= bn scale (f32), scale -> ones. Same math, bias-only BN."""
    def fold_conv(cp):
        out = dict(cp)
        if "bn" in cp and "kernel" in cp:
            s = cp["bn"]["scale"]
            out["kernel"] = cp["kernel"] * s.reshape(1, 1, 1, -1)
            out["bn"] = {"scale": jnp.ones_like(s), "bias": cp["bn"]["bias"]}
        return out

    q = {"stem": {"conv": dict(p["stem"]["conv"]), "bn": p["stem"]["bn"]}}
    s = p["stem"]["bn"]["scale"]
    q["stem"]["conv"]["kernel"] = p["stem"]["conv"]["kernel"] * s.reshape(1, 1, 1, -1)
    q["stem"] = {"conv": q["stem"]["conv"],
                 "bn": {"scale": jnp.ones_like(s), "bias": p["stem"]["bn"]["bias"]}}
    for st in ("res2", "res3", "res4", "res5"):
        q[st] = [{k: (fold_conv(v) if isinstance(v, dict) and "kernel" in v else v)
                  for k, v in blk.items()} for blk in p[st]]
    return q


def bias_only_bottleneck(x, p, stride, stride_in_1x1=True):
    """bottleneck with scale pre-folded: BN is a bias add only."""
    s1, s2 = (stride, 1) if stride_in_1x1 else (1, stride)
    def cb(h, cp, st, pad, relu):
        y = resnet.conv2d(h, cp["kernel"], st, padding=pad)
        y = y + cp["bn"]["bias"].astype(y.dtype)
        return jax.nn.relu(y) if relu else y
    out = cb(x, p["conv1"], s1, "VALID", True)
    out = cb(out, p["conv2"], s2, [(1, 1), (1, 1)], True)
    out = cb(out, p["conv3"], 1, "VALID", False)
    sc = cb(x, p["shortcut"], stride, "VALID", False) if "shortcut" in p else x
    return jax.nn.relu(out + sc)


def r50_biasonly(p, x, stem_s2d=False):
    if stem_s2d:
        h = resnet.conv2d(resnet.space_to_depth(x),
                          resnet.stem_s2d_kernel(p["stem"]["conv"]["kernel"]),
                          stride=1, padding=[(2, 1), (2, 1)])
    else:
        h = resnet.conv2d(x, p["stem"]["conv"]["kernel"], stride=2,
                          padding=[(3, 3), (3, 3)])
    h = jax.nn.relu(h + p["stem"]["bn"]["bias"].astype(h.dtype))
    h = resnet.max_pool(h, 3, 2, [(0, 0), (1, 1), (1, 1), (0, 0)])
    for si in range(4):
        for bi, bp in enumerate(p[f"res{si + 2}"]):
            h = bias_only_bottleneck(h, bp, (1 if si == 0 else 2) if bi == 0 else 1)
    return h


def perturb(x, carry):
    return x + (carry * 1e-30).astype(x.dtype)


def main():
    want = set(sys.argv[1:])
    p = jax.device_put(init_r50())
    pf = jax.device_put(jax.jit(fold_params)(p))

    def run(name, fn, args, iters=10, flops=None):
        if want and name not in want:
            return
        ms = timeit(fn, args, iters, name)
        if flops:
            print(f"    -> {flops / (ms / 1000) / 1e12:.1f} TF/s", flush=True)

    B = 128
    x128 = jax.device_put(make_frames(B))
    # R50 fwd FLOPs @448: ~16.4 GF/frame (conv MACs x2)
    R50_FLOPS = 16.4e9 * B

    run("r50_base",
        lambda c, p, x: resnet.resnet50_forward(p, perturb(x, c))
        .astype(jnp.float32).sum(), (p, x128), flops=R50_FLOPS)
    run("r50_fold",
        lambda c, p, x: r50_biasonly(p, perturb(x, c))
        .astype(jnp.float32).sum(), (pf, x128), flops=R50_FLOPS)
    run("r50_fold_s2d",
        lambda c, p, x: r50_biasonly(p, perturb(x, c), stem_s2d=True)
        .astype(jnp.float32).sum(), (pf, x128), flops=R50_FLOPS)

    # stem only (conv+bn+relu+maxpool)
    def stem_base(c, p, x):
        x = perturb(x, c)
        h = resnet.conv2d(x, p["stem"]["conv"]["kernel"], 2, [(3, 3), (3, 3)])
        h = jax.nn.relu(resnet.frozen_bn(h, p["stem"]["bn"]))
        h = resnet.max_pool(h, 3, 2, [(0, 0), (1, 1), (1, 1), (0, 0)])
        return h.astype(jnp.float32).sum()
    run("stem_base", stem_base, (p, x128), flops=0.47e9 * B)

    def stem_fold_s2d(c, p, x):
        x = perturb(x, c)
        h = resnet.conv2d(resnet.space_to_depth(x),
                          resnet.stem_s2d_kernel(p["stem"]["conv"]["kernel"]),
                          1, [(2, 1), (2, 1)])
        h = jax.nn.relu(h + p["stem"]["bn"]["bias"].astype(h.dtype))
        h = resnet.max_pool(h, 3, 2, [(0, 0), (1, 1), (1, 1), (0, 0)])
        return h.astype(jnp.float32).sum()
    run("stem_fold_s2d", stem_fold_s2d, (pf, x128), flops=0.47e9 * B)

    # batch scaling
    x256 = jax.device_put(make_frames(256))
    run("r50_fold_b256",
        lambda c, p, x: r50_biasonly(p, perturb(x, c))
        .astype(jnp.float32).sum(), (pf, x256), iters=5, flops=16.4e9 * 256)

    del x256

    # full bench unit (4 videos x 16 clips x 2 frames + BERT)
    if not want or "full" in want:
        cfg = ModelConfig(num_labels=2, loss_type="ce", score_agg_func="lse")
        ts = steps.TaskSettings(head_type="retrieval", num_labels=2,
                                loss_type="ce", score_agg_func="lse",
                                train_n_clips=16, group_size=1)
        params = jax.device_put(
            clipbert.init_clipbert(jax.random.key(0), cfg, "retrieval"))
        rng = np.random.default_rng(0)
        batch = jax.device_put({
            "text_input_ids": jnp.asarray(
                rng.integers(0, cfg.vocab_size, (4, 20)), jnp.int32),
            "text_input_mask": jnp.ones((4, 20), jnp.int32),
            "visual_inputs": jnp.asarray(
                rng.standard_normal((4, 32, IMG, IMG, 3)) * 0.5, jnp.bfloat16),
        })

        def full(c, params, batch):
            b = dict(batch)
            b["visual_inputs"] = perturb(batch["visual_inputs"], c)
            logits = steps.mil_forward(params, cfg, ts, b, RngGen(None),
                                       False, jnp.bfloat16)
            return logits.astype(jnp.float32).sum()
        ms = timeit(full, (params, batch), 10, "full_unit")
        print(f"    -> {4 * 16 / (ms / 1000):.1f} clips/s", flush=True)


def init_r50():
    return resnet.init_resnet50(jax.random.key(0))


if __name__ == "__main__":
    main()

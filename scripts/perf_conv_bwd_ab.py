"""Adversarial A/B of the conv backward — the declared 0.67-MFU wall.

PARITY.md's training table names the R50 conv backward as the binding
constraint at the MSRVTT train shape (8 videos x 8 clips x 2 frames @448^2,
remat on => 128 images per step through the CNN). This script attacks that
wall on the real chip along the axes VERDICT r3 #4 prescribed:

  (a) gradient dtype: bf16 (production) vs fp32 through the R50
  (b) jax.checkpoint granularity/policy: per-stage (production), per-block,
      early-stages-only, no-remat, and per-stage with the
      dots_with_no_batch_dims_saveable policy
  (c) input-size bucketing: 448 vs 416 vs 384 (FLOP-vs-MFU tradeoff; NOTE
      any win here changes the model input contract — report-only)
  (d) XLA autotune/latency-hiding flags via subprocess re-exec (XLA_FLAGS
      must be set before backend init)

Isolates the CNN fwd+bwd (every grad leaf consumed — fetching one scalar
would let XLA DCE most of the weight-gradient work), timed as a lax.scan
inside one jitted program with a single fetch (CLAUDE.md axon pitfalls).
Prints one JSON line per variant; run the winner through
scripts/bench_train_step.py for the full-step number.

Usage:  python scripts/perf_conv_bwd_ab.py            # all in-process A/Bs
        python scripts/perf_conv_bwd_ab.py --xla      # + flag-variant subprocs
"""

import functools
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from clipbert_tpu.core import compile_cache
from clipbert_tpu.core.config import ModelConfig
from clipbert_tpu.models import clipbert

N_VISUALS = 64          # 8 videos x 8 clips
NUM_FRM = 2
STEPS = 6
REPS = 2


def time_scalar(fn, *args):
    acc = float(np.asarray(fn(*args)))
    assert np.isfinite(acc), acc
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        acc = float(np.asarray(fn(*args)))
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(acc)
    return best


def measure_cnn_bwd(params_cnn, img: int, remat, dtype) -> float:
    """seconds per fwd+bwd of the CNN at (N_VISUALS, NUM_FRM, img, img)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (N_VISUALS, NUM_FRM, img, img, 3)) * 0.5, dtype)
    x = jax.device_put(x)

    def loss(p, x):
        f = clipbert.cnn_forward(p, x, dtype, remat=remat)
        return jnp.sum(f.astype(jnp.float32))

    @jax.jit
    def loop(p, x):
        def body(carry, _):
            g = jax.grad(loss)(p, x + (carry * 1e-30).astype(dtype))
            acc = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree.leaves(g))
            return acc, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=STEPS)
        return acc

    return time_scalar(loop, params_cnn, x) / STEPS


def run_variant(params_cnn, name: str, img: int, remat, dtype,
                checkpoint_policy=None):
    """One A/B point. `checkpoint_policy` monkeypatches jax.checkpoint with
    the policy during tracing (bench-only; the model API stays bool/str)."""
    real_ckpt = jax.checkpoint
    if checkpoint_policy is not None:
        jax.checkpoint = functools.partial(real_ckpt,
                                           policy=checkpoint_policy)
    try:
        sec = measure_cnn_bwd(params_cnn, img, remat, dtype)
        clips = N_VISUALS / sec     # 1 clip == 2 frames == 1 visual here
        out = {"variant": name, "img": img, "remat": str(remat),
               "dtype": jnp.dtype(dtype).name,
               "sec_per_cnn_fwd_bwd": round(sec, 4),
               "cnn_clips_per_sec": round(clips, 1)}
    except Exception as e:          # OOM documents itself
        out = {"variant": name, "img": img, "remat": str(remat),
               "dtype": jnp.dtype(dtype).name, "error": type(e).__name__}
    finally:
        jax.checkpoint = real_ckpt
    print(json.dumps(out), flush=True)
    jax.clear_caches()
    return out


XLA_FLAG_VARIANTS = {
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "async_all": ("--xla_tpu_enable_latency_hiding_scheduler=true "
                  "--xla_enable_async_all_gather=true"),
}


def main():
    if os.environ.get("_CONV_AB_CHILD"):
        # subprocess re-exec: XLA_FLAGS already in env; run baseline only
        compile_cache.enable()
        cfg = ModelConfig()
        params = clipbert.init_clipbert(jax.random.key(0), cfg, "retrieval")
        run_variant(params["cnn"], f"xla:{os.environ['_CONV_AB_CHILD']}",
                    448, "stage", jnp.bfloat16)
        return

    compile_cache.enable()
    cfg = ModelConfig()
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "retrieval")
    p_cnn = jax.device_put(params["cnn"])

    # (b) granularity/policy at the production shape
    run_variant(p_cnn, "baseline_stage", 448, "stage", jnp.bfloat16)
    run_variant(p_cnn, "block", 448, "block", jnp.bfloat16)
    run_variant(p_cnn, "early", 448, "early", jnp.bfloat16)
    run_variant(p_cnn, "no_remat", 448, False, jnp.bfloat16)
    run_variant(p_cnn, "stage_dots_policy", 448, "stage", jnp.bfloat16,
                checkpoint_policy=jax.checkpoint_policies
                .dots_with_no_batch_dims_saveable)
    # (a) gradient dtype
    run_variant(p_cnn, "fp32", 448, "stage", jnp.float32)
    # (c) input bucketing
    run_variant(p_cnn, "img416", 416, "stage", jnp.bfloat16)
    run_variant(p_cnn, "img384", 384, "stage", jnp.bfloat16)

    # (d) XLA flags need a fresh backend: re-exec ourselves per variant
    if "--xla" in sys.argv:
        for name, flags in XLA_FLAG_VARIANTS.items():
            env = dict(os.environ,
                       XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                                  + " " + flags).strip(),
                       _CONV_AB_CHILD=name)
            subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, check=False, timeout=1800)


if __name__ == "__main__":
    main()

"""Train-step efficiency on the real chip: clips/s, TF/s, MFU, and a
component breakdown naming the top time sinks.

Measures the FULL jitted train step (MIL forward over clips + LSE loss +
backward + 8-group AdamW + schedules, `train/steps.py::make_train_step`) at
the MSRVTT retrieval train shape (`configs/msrvtt_ret_base_resnet50.json`:
8 clips x 2 frames @ 448^2, group 2 = 1 pos + 1 neg caption), bf16, one
chip. FLOPs come from XLA's own cost analysis of the compiled program
(fallback: analytic model documented inline), so TF/s is not hostage to a
hand FLOP count.

Component programs (fwd-only, fwd+bwd, full step, CNN-only fwd) are timed
separately to attribute the step time. Methodology per CLAUDE.md: chained
dispatches with ONE final scalar fetch (the remote platform defers
unfetched executions; per-fetch RTT would otherwise dominate), best of 2
repeats.

Run on the real TPU with the box otherwise idle:
    python scripts/bench_train_step.py
Prints one JSON line per configuration plus a component-breakdown line.

Reference context being priced: the training hot loop
`/root/reference/src/pretrain/run_pretrain.py:384-476` on 4-8 V100 fp16
(apex O2), README.md:37-38.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from clipbert_tpu.core import compile_cache
from clipbert_tpu.core.config import ModelConfig
from clipbert_tpu.models import clipbert
from clipbert_tpu.train import optim, steps

N_CLIPS = 8
NUM_FRM = 2
IMG = 448
TXT_LEN = 20
GROUP = 2
STEPS = 10
REPS = 2

# Chip peak for MFU: measured dense bf16 matmul ceiling on this chip
# (CLAUDE.md "Chip calibration"); use the hardware figure if known higher.
CHIP_PEAK_TFS = 92.0

# V100 training baseline estimate (same method as bench.py's inference
# estimate): fwd FLOPs/clip = R50@448x2frm ~33 GF + 2 joint BERT texts
# ~24 GF = 57 GF; training total ~ 3x fwd (bwd ~ 2x fwd; AdamW is
# bandwidth- not FLOP-bound) ~ 171 GF/clip. V100 fp16 peak 125 TF at a
# generous 20-25% realized for the reference's training loop (per-clip
# Python loop, NCHW<->channels-last conversions, apex O2 master copies;
# training realizes less than the 25-30% granted its inference loop)
# => 125 * 0.225 / 0.171 ~ 165 clips/s per V100.
V100_TRAIN_CLIPS_PER_SEC = 165.0
TRAIN_GF_PER_CLIP = 171.0


def make_batch(batch_videos: int, rng):
    B_t = batch_videos * GROUP
    return {
        "text_input_ids": jnp.asarray(
            rng.integers(0, 30522, (B_t, TXT_LEN)), jnp.int32),
        "text_input_mask": jnp.ones((B_t, TXT_LEN), jnp.int32),
        "visual_inputs": jnp.asarray(
            rng.standard_normal(
                (batch_videos, N_CLIPS * NUM_FRM, IMG, IMG, 3)) * 0.5,
            jnp.bfloat16),
        "labels": jnp.asarray(
            rng.integers(0, 2, (B_t,)), jnp.int32),
    }


def timed_chain(fn, n, fetch, *args):
    """Dispatch fn n times back-to-back, fetch ONE scalar at the end."""
    out = fetch(fn(*args))
    jax.block_until_ready(out)      # warmup/compile
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fetch(fn(*args))
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def xla_flops(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def bench_step(cfg, ts, oc, ss, batch_videos: int):
    rng = np.random.default_rng(0)
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "retrieval")
    meta = optim.build_group_meta(params, oc)
    state = steps.init_train_state(params)
    step_fn = steps.make_train_step(cfg, ts, oc, ss, meta,
                                    compute_dtype=jnp.bfloat16)
    batch = jax.device_put(make_batch(batch_videos, rng))
    key = jax.random.key(1)

    flops = xla_flops(step_fn, state, batch, key)

    # chained steps: donation threads the state through; the batch is
    # reused (weights change every step, so nothing hoists)
    st = state
    st, m = step_fn(st, batch, key)
    jax.block_until_ready(m["loss"])  # compile + warmup (st donated ok)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        s = st
        for _ in range(STEPS):
            s, m = step_fn(s, batch, key)
        jax.block_until_ready(m["loss"])
        best = min(best, (time.perf_counter() - t0) / STEPS)
        st = s
    clips = batch_videos * N_CLIPS
    sec_per_step = best
    tfs = (flops / sec_per_step / 1e12) if flops else \
        clips * TRAIN_GF_PER_CLIP / sec_per_step / 1e3
    return {
        "batch_videos": batch_videos,
        "remat": ts.remat,
        "clips_per_sec": round(clips / sec_per_step, 1),
        "sec_per_step": round(sec_per_step, 4),
        "tf_per_sec": round(tfs, 1),
        "mfu_vs_chip_ceiling": round(tfs / CHIP_PEAK_TFS, 3),
        "flops_source": "xla_cost_analysis" if flops else "analytic",
        "vs_v100_train_est": round(
            clips / sec_per_step / V100_TRAIN_CLIPS_PER_SEC, 2),
    }


def bench_components(cfg, ts, oc, ss, batch_videos: int):
    """Attribute the step: CNN fwd, full fwd(+loss), fwd+bwd, full step."""
    rng = np.random.default_rng(0)
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "retrieval")
    params = jax.device_put(params)
    meta = optim.build_group_meta(params, oc)
    batch = jax.device_put(make_batch(batch_videos, rng))
    key = jax.random.key(1)

    @jax.jit
    def cnn_fwd(p, b):
        return clipbert.cnn_forward(
            p["cnn"], b["visual_inputs"], jnp.bfloat16).sum()

    def loss_fn(p, b, k):
        loss, _ = steps.compute_loss(p, cfg, ts, b, k, True, jnp.bfloat16)
        return loss

    fwd = jax.jit(loss_fn)
    grad = jax.jit(jax.grad(loss_fn))

    state = steps.init_train_state(params)
    step_fn = steps.make_train_step(cfg, ts, oc, ss, meta,
                                    compute_dtype=jnp.bfloat16)

    out = {}
    out["cnn_fwd_s"] = timed_chain(cnn_fwd, 6, lambda x: x, params, batch)
    out["fwd_s"] = timed_chain(fwd, 6, lambda x: x, params, batch, key)
    out["fwd_bwd_s"] = timed_chain(
        grad, 4, lambda g: jax.tree.leaves(g)[0].ravel()[0],
        params, batch, key)

    st, m = step_fn(state, batch, key)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(4):
        st, m = step_fn(st, batch, key)
    jax.block_until_ready(m["loss"])
    out["full_step_s"] = (time.perf_counter() - t0) / 4

    out = {k: round(v, 4) for k, v in out.items()}
    out["bert_fwd_s"] = round(out["fwd_s"] - out["cnn_fwd_s"], 4)
    out["bwd_s"] = round(out["fwd_bwd_s"] - out["fwd_s"], 4)
    out["optimizer_s"] = round(out["full_step_s"] - out["fwd_bwd_s"], 4)
    out["batch_videos"] = batch_videos
    return out


def main():
    compile_cache.enable()
    cfg = ModelConfig(num_labels=2, loss_type="ce", score_agg_func="lse")
    oc = optim.OptimConfig()
    ss = steps.ScheduleSettings(num_train_steps=10000)

    def ts(remat):
        return steps.TaskSettings(
            head_type="retrieval", num_labels=2, loss_type="ce",
            score_agg_func="lse", train_n_clips=N_CLIPS, group_size=GROUP,
            remat=remat)

    for bv, remat in ((4, False), (8, True), (16, True)):
        try:
            print(json.dumps(bench_step(cfg, ts(remat), oc, ss, bv)),
                  flush=True)
        except Exception as e:   # OOM documents itself
            print(json.dumps({"batch_videos": bv, "remat": remat,
                              "error": type(e).__name__}), flush=True)

    print(json.dumps({"components": bench_components(
        cfg, ts(False), oc, ss, 4)}), flush=True)


if __name__ == "__main__":
    main()

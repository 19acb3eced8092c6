"""Train-step efficiency on the real chip: clips/s, TF/s, MFU, and a
component breakdown naming the top time sinks.

Measures the FULL train step (MIL forward over clips + LSE loss + backward
+ 8-group AdamW + schedules, `train/steps.py::make_train_step`) at the
MSRVTT retrieval train shape (`configs/msrvtt_ret_base_resnet50.json`:
8 clips x 2 frames @ 448^2, group 2 = 1 pos + 1 neg caption), bf16, one
chip. FLOPs come from XLA's own cost analysis of the compiled program
(fallback: analytic model documented inline), so TF/s is not hostage to a
hand FLOP count.

Timing methodology (CLAUDE.md "axon timing pitfalls"): the remote platform
defers unfetched executions and `block_until_ready` is unreliable, so every
measurement is a `lax.scan` of N iterations INSIDE one jitted program whose
body depends on the carry (train steps thread the evolving TrainState;
forward-only programs perturb the pixels by carry*1e-30), with ONE scalar
fetched at the end. Best of 2 repeats.

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
STEPS = 8
REPS = 2

# Chip peak for MFU: measured dense bf16 matmul ceiling on this chip
# (CLAUDE.md "Chip calibration").
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


def time_scalar_program(fn, *args):
    """fn(*args) -> scalar jax value: compile+warm once, then time the
    fetch-to-scalar of REPS more runs, best-of."""
    acc = float(np.asarray(fn(*args)))
    assert np.isfinite(acc), acc
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        acc = float(np.asarray(fn(*args)))
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(acc)
    return best


def xla_flops(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def bench_step(cfg, ts, oc, ss, meta_for, batch_videos: int):
    rng = np.random.default_rng(0)
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "retrieval")
    meta = meta_for(params)
    state = jax.device_put(steps.init_train_state(params))
    raw_step = steps.make_train_step(cfg, ts, oc, ss, meta,
                                     compute_dtype=jnp.bfloat16,
                                     jit_compile=False)
    batch = jax.device_put(make_batch(batch_videos, rng))

    @jax.jit
    def loop(state, batch, key):
        def body(carry, i):
            st, _ = raw_step(carry, batch, jax.random.fold_in(key, i))
            return st, None
        st, _ = jax.lax.scan(body, state, jnp.arange(STEPS))
        # one scalar that depends on the final state forces the whole chain
        return st.opt.step.astype(jnp.float32) + \
            jax.tree.leaves(st.params)[0].astype(jnp.float32).ravel()[0]

    # cost-analyze the FULL step (new state + metrics as outputs) — lowering
    # only the loss would let XLA dead-code-eliminate backward + optimizer
    one = jax.jit(lambda s, b, k: raw_step(s, b, k))
    step_flops = xla_flops(one, state, batch, jax.random.key(1))

    total = time_scalar_program(loop, state, batch, jax.random.key(1))
    sec_per_step = total / STEPS
    clips = batch_videos * N_CLIPS
    tfs = (step_flops / sec_per_step / 1e12) if step_flops else \
        clips * TRAIN_GF_PER_CLIP / sec_per_step / 1e3
    return {
        "batch_videos": batch_videos,
        "remat": ts.remat,
        "clips_per_sec": round(clips / sec_per_step, 1),
        "sec_per_step": round(sec_per_step, 4),
        "tf_per_sec": round(tfs, 1),
        "mfu_vs_chip_ceiling": round(tfs / CHIP_PEAK_TFS, 3),
        "flops_source": ("xla_cost_analysis" if step_flops else "analytic"),
        "vs_v100_train_est": round(
            clips / sec_per_step / V100_TRAIN_CLIPS_PER_SEC, 2),
    }


def bench_components(cfg, ts, oc, ss, meta_for, batch_videos: int):
    """Attribute the step: CNN fwd, full fwd(+loss), fwd+bwd, full step —
    each its own scanned on-device loop with a carry-dependent body."""
    rng = np.random.default_rng(0)
    params = jax.device_put(
        clipbert.init_clipbert(jax.random.key(0), cfg, "retrieval"))
    meta = meta_for(params)
    batch = jax.device_put(make_batch(batch_videos, rng))
    key = jax.random.key(1)

    def perturbed(b, carry):
        b = dict(b)
        b["visual_inputs"] = (b["visual_inputs"]
                              + (carry * 1e-30).astype(jnp.bfloat16))
        return b

    def loss_fn(p, b, k):
        loss, _ = steps.compute_loss(p, cfg, ts, b, k, True, jnp.bfloat16)
        return loss

    @jax.jit
    def cnn_loop(p, b):
        def body(carry, _):
            f = clipbert.cnn_forward(p["cnn"],
                                     perturbed(b, carry)["visual_inputs"],
                                     jnp.bfloat16)
            return f.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=STEPS)
        return acc

    @jax.jit
    def fwd_loop(p, b, k):
        def body(carry, i):
            l = loss_fn(p, perturbed(b, carry), jax.random.fold_in(k, i))
            return l.astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(STEPS))
        return acc

    @jax.jit
    def grad_loop(p, b, k):
        def body(carry, i):
            g = jax.grad(loss_fn)(p, perturbed(b, carry),
                                  jax.random.fold_in(k, i))
            # consume EVERY gradient leaf — fetching just one would let XLA
            # dead-code-eliminate most of the weight-gradient computation
            # (measured: that undercounted fwd+bwd by ~2.3x)
            acc = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree.leaves(g))
            return acc, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(STEPS))
        return acc

    raw_step = steps.make_train_step(cfg, ts, oc, ss, meta,
                                     compute_dtype=jnp.bfloat16,
                                     jit_compile=False)
    state = jax.device_put(steps.init_train_state(params))

    @jax.jit
    def step_loop(st, b, k):
        def body(carry, i):
            s2, _ = raw_step(carry, b, jax.random.fold_in(k, i))
            return s2, None
        st, _ = jax.lax.scan(body, st, jnp.arange(STEPS))
        return jax.tree.leaves(st.params)[0].astype(jnp.float32).ravel()[0]

    out = {}
    # clear executables between programs: four live full-model programs
    # (each holding grads + activation workspaces) exceed HBM together
    out["cnn_fwd_s"] = time_scalar_program(cnn_loop, params, batch) / STEPS
    jax.clear_caches()
    out["fwd_s"] = time_scalar_program(fwd_loop, params, batch, key) / STEPS
    jax.clear_caches()
    out["fwd_bwd_s"] = time_scalar_program(
        grad_loop, params, batch, key) / STEPS
    jax.clear_caches()
    out["full_step_s"] = time_scalar_program(
        step_loop, state, batch, key) / STEPS
    out = {k: round(v, 4) for k, v in out.items()}
    out["bert_fwd_s"] = round(out["fwd_s"] - out["cnn_fwd_s"], 4)
    out["bwd_s"] = round(out["fwd_bwd_s"] - out["fwd_s"], 4)
    out["optimizer_s"] = round(out["full_step_s"] - out["fwd_bwd_s"], 4)
    out["batch_videos"] = batch_videos
    return out


def bench_train_data_plane(cfg, ts, oc, ss, meta_for, batch_videos: int,
                           device_clips_per_sec: float, n_steps: int = 6):
    """Decode-inclusive TRAIN throughput through the PRODUCTION input path:
    packed store -> native C++ decode in worker threads -> PrefetchLoader
    (in-thread device_put + jitted device resize/pad/normalize one batch
    ahead) -> jitted train step (the input side of the reference hot loop,
    run_pretrain.py:384-476). The trainer's deferred-fetch discipline is
    mirrored: the host never blocks on per-step metrics; ONE final loss
    fetch forces the whole donated-state chain (the only honest multi-step
    clock on the remote platform). Reports e2e clips/s and the overlap
    efficiency vs the device-only rate measured at the same configuration.
    """
    import tempfile
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_dataplane import make_store

    from clipbert_tpu.core.config import RunConfig
    from clipbert_tpu.core.mesh import make_mesh, replicate_tree
    from clipbert_tpu.data import tokenization
    from clipbert_tpu.data.datasets import (RetrievalCollator,
                                            VideoRetrievalTrainDataset,
                                            group_datalist_by_visual)
    from clipbert_tpu.data.store import open_store
    from clipbert_tpu.data.transforms import mk_input_group
    from clipbert_tpu.tasks import common
    from clipbert_tpu.train import trainer as trainer_mod

    n_videos = batch_videos * (n_steps + 3)
    tmp = tempfile.mkdtemp(prefix="bench_train_plane_")
    store_path = os.path.join(tmp, "videos.cbpk")
    make_store(store_path, n_videos)                 # MSRVTT-shaped 320x240
    vpath = os.path.join(tmp, "vocab.txt")
    tokenization.write_tiny_vocab(
        vpath, extra_tokens=["a", "person", "does", "thing"]
        + [str(i) for i in range(10)])
    tok = tokenization.BertTokenizer(vpath)
    raw = [{"id": i, "txt": f"a person does thing {i}", "vid_id": f"vid{i}"}
           for i in range(n_videos)]
    groups = mk_input_group(group_datalist_by_visual(raw, "vid_id"),
                            max_n_example_per_group=1, is_train=True)
    ds = VideoRetrievalTrainDataset(
        groups, tok, open_store(store_path), fps=1, num_frm=NUM_FRM,
        frm_sampling_strategy="rand", max_img_size=IMG, max_txt_len=TXT_LEN,
        itm_neg_size=GROUP - 1, ensemble_n_clips=N_CLIPS,
        random_sample_clips=True, seed=0, device_preprocess=True)

    rcfg = RunConfig(train_batch_size=batch_videos, seed=0,
                     max_img_size=IMG, max_txt_len=TXT_LEN,
                     n_workers=max(4, os.cpu_count() or 1))
    mesh = make_mesh()
    loader_it, _ = common.build_train_loader(
        ds, RetrievalCollator(tok, TXT_LEN), rcfg, mesh)
    spec = trainer_mod.TaskSpec(
        name="bench", head_type="retrieval", settings=ts,
        train_loader=loader_it, steps_per_epoch=1, max_img_size=IMG)

    params = clipbert.init_clipbert(jax.random.key(0), cfg, "retrieval")
    meta = meta_for(params)
    step_fn = steps.make_train_step(cfg, ts, oc, ss, meta, mesh=mesh,
                                    compute_dtype=jnp.bfloat16)
    state = replicate_tree(mesh, steps.init_train_state(params))
    key = jax.random.key(1)

    it = iter(loader_it)
    for i in range(2):                               # compile + warm threads
        batch = trainer_mod._to_device_batch(next(it), mesh, spec,
                                             jnp.bfloat16)
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
    assert np.isfinite(float(metrics["loss"]))

    t0 = time.perf_counter()
    for i in range(n_steps):
        batch = trainer_mod._to_device_batch(next(it), mesh, spec,
                                             jnp.bfloat16)
        state, metrics = step_fn(state, batch,
                                 jax.random.fold_in(key, 100 + i))
    final = float(metrics["loss"])                   # forces the whole chain
    wall = time.perf_counter() - t0
    assert np.isfinite(final)

    # host-decode-only rate at the train shape (dataset assembly, no device)
    t0 = time.perf_counter()
    for i in range(batch_videos):
        ds[i]
    decode_rate = batch_videos * N_CLIPS / (time.perf_counter() - t0)

    e2e = n_steps * batch_videos * N_CLIPS / wall
    return {
        "mode": "train_data_plane",
        "batch_videos": batch_videos,
        "remat": ts.remat,
        "e2e_train_clips_per_sec": round(e2e, 1),
        "device_train_clips_per_sec": round(device_clips_per_sec, 1),
        "overlap_efficiency": round(e2e / device_clips_per_sec, 3),
        "decode_clips_per_sec": round(decode_rate, 1),
        "host_cores": os.cpu_count(),
    }


def main():
    compile_cache.enable()
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_plane", action="store_true",
                    help="also run the decode-inclusive train benchmark "
                         "(real store -> decode -> prefetch -> step)")
    ap.add_argument("--data_plane_only", action="store_true")
    args = ap.parse_args()

    cfg = ModelConfig(num_labels=2, loss_type="ce", score_agg_func="lse")
    oc = optim.OptimConfig()
    ss = steps.ScheduleSettings(num_train_steps=10000)

    def meta_for(params):
        return optim.build_group_meta(params, oc)

    def ts(remat):
        return steps.TaskSettings(
            head_type="retrieval", num_labels=2, loss_type="ce",
            score_agg_func="lse", train_n_clips=N_CLIPS, group_size=GROUP,
            remat=remat)

    if not args.data_plane_only:
        # remat sweep follows scripts/perf_conv_bwd_ab.py: at the CNN level
        # no-remat won +17% over per-stage, early +6.7% — measure what
        # survives in the full step and where HBM forces remat back on
        for bv, remat in ((4, False), (8, "stage"), (8, "early"),
                          (8, False), (16, "early"), (16, False)):
            try:
                print(json.dumps(
                    bench_step(cfg, ts(remat), oc, ss, meta_for, bv)),
                    flush=True)
            except Exception as e:   # OOM documents itself
                print(json.dumps({"batch_videos": bv, "remat": remat,
                                  "error": type(e).__name__}), flush=True)

        print(json.dumps({"components": bench_components(
            cfg, ts(False), oc, ss, meta_for, 4)}), flush=True)

    if args.data_plane or args.data_plane_only:
        # device-only rate at the SAME configuration for the overlap ratio
        jax.clear_caches()
        dev = bench_step(cfg, ts(True), oc, ss, meta_for, 8)
        jax.clear_caches()
        print(json.dumps(bench_train_data_plane(
            cfg, ts(True), oc, ss, meta_for, batch_videos=8,
            device_clips_per_sec=dev["clips_per_sec"])), flush=True)


if __name__ == "__main__":
    main()

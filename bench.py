"""Benchmark: MSRVTT retrieval-inference per-clip throughput, 16-clip + 1-clip.

Measures the reference's per-clip unit of work (SURVEY.md §3.4) at the
MSRVTT retrieval inference configuration (`/root/reference/src/configs/
msrvtt_ret_base_resnet50.json:17-23`, README.md:109-124): N clips x
2 frames @ 448x448 through ResNet-50 grid features + joint text-visual
BERT-base forward (text len 20), bf16, one chip, at BOTH headline clip
counts (`--inference_n_clips` in {1, 16}, README.md:109-124). The reported
metric/vs_baseline use the 16-clip unit; `value_1clip` carries the 1-clip
number. Clips per step: 8 videos x 16 clips = 128 (the framework's
cached-feature eval batches videos via inference_video_batch_size) and
128 videos x 1 clip (the 1-clip unit is latency-light, so the serving
batch is wider; both A/B-measured optima on this chip).

Methodology: the timing loop is a `lax.scan` INSIDE one jitted program —
the remote-TPU platform defers unfetched executions and charges a host RTT
per fetch, so chaining iterations on device and fetching a single scalar is
the only honest clock. Inference params have the frozen-BN scales folded
into the conv kernels (resnet.fold_bn_scales), as the eval paths do.

Prints ONE JSON line.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from clipbert_tpu.core.config import ModelConfig
from clipbert_tpu.core.rng import RngGen
from clipbert_tpu.models import clipbert
from clipbert_tpu.train import steps

# Estimated reference throughput for this unit on one V100 (fp16, apex O2):
# per clip ~45 GFLOPs fwd (2x ResNet-50@448 ~33 GF + BERT-base@~69 tok
# ~12 GF); V100 fp16 peak 125 TF at a generous 25-30% realized for the
# reference's per-clip Python loop => ~250 clips/s. The 5x-V100 north-star
# therefore sits at vs_baseline = 5.0.
V100_BASELINE_CLIPS_PER_SEC = 250.0

NUM_FRM = 2
IMG = 448
TXT_LEN = 20
# 30 on-device iterations amortize the per-fetch host RTT (~2% at 10);
# best-of-2 timed repeats reports steady state (first repeat can catch
# allocator warmup on the remote platform)
ITERS = 30
REPS = 2


def measure(params, cfg, num_clips: int, batch_videos: int) -> float:
    ts = steps.TaskSettings(head_type="retrieval", num_labels=2,
                            loss_type="ce", score_agg_func="lse",
                            train_n_clips=num_clips, group_size=1)
    rng = np.random.default_rng(0)
    batch = {
        "text_input_ids": jnp.asarray(
            rng.integers(0, cfg.vocab_size, (batch_videos, TXT_LEN)),
            jnp.int32),
        "text_input_mask": jnp.ones((batch_videos, TXT_LEN), jnp.int32),
        "visual_inputs": jnp.asarray(
            rng.standard_normal(
                (batch_videos, num_clips * NUM_FRM, IMG, IMG, 3)) * 0.5,
            jnp.bfloat16),
    }
    batch = jax.device_put(batch)

    @jax.jit
    def loop_fn(params, batch):
        def body(carry, _):
            # perturb the pixels by carry*1e-30 so each iteration depends on
            # the previous one — otherwise XLA hoists the loop-invariant
            # body out of the scan and the clock measures a single forward
            b = dict(batch)
            b["visual_inputs"] = (batch["visual_inputs"]
                                  + (carry * 1e-30).astype(jnp.bfloat16))
            # NO fused attention here: at this unit's BERT batch (128 joint
            # sequences) the Pallas kernel measured 1271 vs 1318 clips/s —
            # its HBM saving scales with batch and only pays off at the
            # full-matrix scoring shape (B~8192, steps.make_text_score_step)
            logits = steps.mil_forward(params, cfg, ts, b, RngGen(None),
                                       False, jnp.bfloat16)
            return logits.astype(jnp.float32).sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return acc

    acc = float(np.asarray(loop_fn(params, batch)))  # compile + warmup
    assert np.isfinite(acc)
    best = 0.0
    for _ in range(REPS):
        t0 = time.perf_counter()
        acc = float(np.asarray(loop_fn(params, batch)))
        dt = time.perf_counter() - t0
        assert np.isfinite(acc)
        best = max(best, ITERS * batch_videos * num_clips / dt)
    return best


def measure_data_plane(params, device_rate: float, n_videos: int = 48):
    """Decode-inclusive rates on REAL mp4 bytes (the north-star unit names
    decode→ResNet→BERT, BASELINE.json; reference decode path
    `/root/reference/src/datasets/decoder.py:203-283`):

      decode_clips_per_sec — native C++ decode + dataset assembly, host only
      h2d_MBps             — measured host->device bandwidth (one 64MB put)
      e2e_clips_per_sec    — the production `inference_retrieval` pipeline
                             (threaded decode → in-thread device_put →
                             jitted device resize → cached encode → scoring)
      binding_constraint   — which of {host-decode, h2d-transfer,
                             device-compute} bounds e2e on THIS host; when
                             the measured e2e sits below HALF the slowest
                             stage the label is "pipeline-overhead" and the
                             e2e_*_s stage attribution says where it went —
                             the artifact must never blame a stage the
                             numbers don't support (round-3 lesson: a fresh
                             jit per call re-traced the unrolled scoring
                             program and the 14.3 clips/s got labeled
                             h2d-transfer)

    On the 1-core dev box the binding constraint is host decode (the
    tunnel's H2D bandwidth drifts 30-1500 MB/s day to day and is measured
    live, never assumed); production TPU hosts bound on decode cores per
    chip (PARITY.md "Data plane").
    """
    import os
    import sys
    import tempfile

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from bench_dataplane import make_store

    from clipbert_tpu.core.config import RunConfig
    from clipbert_tpu.core.mesh import make_mesh
    from clipbert_tpu.data import tokenization
    from clipbert_tpu.data.datasets import VideoRetrievalEvalDataset
    from clipbert_tpu.data.store import open_store
    from clipbert_tpu.tasks.run_video_retrieval import inference_retrieval

    tmp = tempfile.mkdtemp(prefix="bench_decode_")
    store_path = os.path.join(tmp, "videos.cbpk")
    make_store(store_path, n_videos)               # MSRVTT-shaped 320x240
    vpath = os.path.join(tmp, "vocab.txt")
    tokenization.write_tiny_vocab(
        vpath, extra_tokens=["a", "person", "does", "thing"]
        + [str(i) for i in range(10)])
    tokenizer = tokenization.BertTokenizer(vpath)
    datalist = [{"id": i, "txt": f"a person does thing {i}",
                 "vid_id": f"vid{i}"} for i in range(n_videos)]

    def make_ds(dl):
        return VideoRetrievalEvalDataset(
            dl, tokenizer, open_store(store_path), fps=1, num_frm=NUM_FRM,
            max_img_size=IMG, max_txt_len=TXT_LEN, ensemble_n_clips=16,
            device_preprocess=True)

    ds = make_ds(datalist)
    ds[0]                                          # decoder warmup
    t0 = time.perf_counter()
    bytes_per_clip = 0
    for i in range(len(ds)):
        bytes_per_clip = max(bytes_per_clip,
                             ds[i]["vis"].nbytes / 16)
    decode_rate = n_videos * 16 / (time.perf_counter() - t0)

    buf = np.zeros(64 << 20, np.uint8)
    jax.block_until_ready(jax.device_put(buf))     # warm the transfer path
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(buf))
    h2d_mbps = (64 << 20) / (time.perf_counter() - t0) / 1e6
    transfer_rate = h2d_mbps * 1e6 / bytes_per_clip

    rcfg = RunConfig(loss_type="ce", num_labels=2, inference_n_clips=16,
                     num_frm=NUM_FRM, max_img_size=IMG, max_txt_len=TXT_LEN,
                     # one caption dispatch per video group (48 caps fold
                     # into a single 6144-seq scoring program): A/B'd on-chip
                     # vs minibatch 8 — 99.4 vs 89.1 clips/s e2e, and the
                     # in-loop dispatch overhead collapses 1.06 s -> 0.008 s
                     score_agg_func="lse", inference_batch_size=48,
                     inference_video_batch_size=8,
                     n_workers=max(4, os.cpu_count() or 1), fps=1)
    model_cfg = ModelConfig(num_labels=2, loss_type="ce",
                            score_agg_func="lse")
    mesh = make_mesh()
    import jax.numpy as jnp
    inference_retrieval(rcfg, model_cfg, params, make_ds(datalist[:2]),
                        mesh, jnp.bfloat16)        # compile warmup
    stage_stats = {}
    t0 = time.perf_counter()
    inference_retrieval(rcfg, model_cfg, params, ds, mesh, jnp.bfloat16,
                        stage_stats=stage_stats)
    e2e_rate = n_videos * 16 / (time.perf_counter() - t0)

    stages = {"host-decode": decode_rate, "h2d-transfer": transfer_rate,
              "device-compute": device_rate}
    bound = min(stages, key=stages.get)
    if e2e_rate < 0.5 * stages[bound]:
        bound = "pipeline-overhead"
    # wait attribution (VERDICT r4 #2): data_wait above the STANDALONE
    # serial-decode floor is not mystery seconds — the loader thread's
    # in-run spans (decode_s: dataset+collate under live core contention
    # with the dispatch thread; put_s: device_put issuance, which can block
    # on transfer-buffer handoff) are measured inside inference_retrieval,
    # so excess = contention slowdown (decode_s - floor) + put blocking.
    decode_floor = n_videos * 16 / decode_rate
    wait_excess = max(0.0, stage_stats.get("data_wait_s", 0.0) - decode_floor)
    return {"decode_clips_per_sec": round(decode_rate, 2),
            "h2d_MBps": round(h2d_mbps, 1),
            "e2e_clips_per_sec": round(e2e_rate, 2),
            "binding_constraint": bound,
            "host_cores": os.cpu_count(),
            "e2e_decode_floor_s": round(decode_floor, 3),
            "e2e_wait_excess_s": round(wait_excess, 3),
            # stage attribution for the e2e loop (inference_retrieval
            # stage_stats): where each wall second went; decode_s/put_s are
            # the loader thread's own in-run spans
            **{f"e2e_{k}": round(v, 3) if isinstance(v, float) else v
               for k, v in stage_stats.items()}}


def main():
    import sys
    from clipbert_tpu.core import compile_cache
    compile_cache.enable()
    cfg = ModelConfig(num_labels=2, loss_type="ce", score_agg_func="lse")
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "retrieval")
    params = clipbert.fold_cnn_bn_scales(params)
    params = jax.device_put(params)

    clips_16 = measure(params, cfg, num_clips=16, batch_videos=8)
    clips_1 = measure(params, cfg, num_clips=1, batch_videos=128)

    # decode-inclusive fields; the headline `value` stays the device unit
    # so rounds remain comparable. Never let the data-plane add-on break
    # the artifact the driver captures.
    try:
        plane = measure_data_plane(params, device_rate=clips_16)
    except Exception as e:                         # noqa: BLE001
        print(f"# data-plane bench failed: {e!r}", file=sys.stderr)
        plane = {"decode_clips_per_sec": None, "h2d_MBps": None,
                 "e2e_clips_per_sec": None,
                 "binding_constraint": f"error:{type(e).__name__}",
                 "host_cores": os.cpu_count()}

    print(json.dumps({
        "metric": "msrvtt_retrieval_16clip_clips_per_sec_per_chip",
        "value": round(clips_16, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_16 / V100_BASELINE_CLIPS_PER_SEC, 3),
        "value_1clip": round(clips_1, 2),
        **plane,
    }))


if __name__ == "__main__":
    main()

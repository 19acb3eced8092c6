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


def main():
    from clipbert_tpu.core import compile_cache
    compile_cache.enable()
    cfg = ModelConfig(num_labels=2, loss_type="ce", score_agg_func="lse")
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "retrieval")
    params = clipbert.fold_cnn_bn_scales(params)
    params = jax.device_put(params)

    clips_16 = measure(params, cfg, num_clips=16, batch_videos=8)
    clips_1 = measure(params, cfg, num_clips=1, batch_videos=128)

    print(json.dumps({
        "metric": "msrvtt_retrieval_16clip_clips_per_sec_per_chip",
        "value": round(clips_16, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_16 / V100_BASELINE_CLIPS_PER_SEC, 3),
        "value_1clip": round(clips_1, 2),
    }))


if __name__ == "__main__":
    main()

"""MSRVTT-scale retrieval eval wall-clock on the TPU.

Times the REAL `inference_retrieval` pipeline (collate -> jitted device
resize -> cached visual encode -> full-matrix text scoring with clip-LSE
pooling) at the MSRVTT protocol shape: 1000 captions scored against every
video, 16 clips x 2 frames @ 448^2 (reference
`src/tasks/run_video_retrieval.py:628-734`). Decode is stubbed with
native-size synthetic frames (the data plane is measured separately by
scripts/bench_dataplane.py); everything else is the production path.

The BERT side dominates: n_videos x n_captions x n_clips joint forwards.
It is embarrassingly parallel across videos, so a 64-video slice measures
the per-video rate exactly; the full 1000-video figure is that rate x 1000.
The cached-feature design encodes each video's clips ONCE for all 1000
captions — the reference recomputes the CNN for every text minibatch
(run_video_retrieval.py:640-666), i.e. ceil(1000/64) = 16x more CNN work.

Run on the real TPU: python scripts/bench_retrieval_eval.py [--n_videos 64]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_videos", type=int, default=64)
    ap.add_argument("--n_captions", type=int, default=1000)
    ap.add_argument("--n_clips", type=int, default=16)
    ap.add_argument("--num_frm", type=int, default=2)
    ap.add_argument("--video_batch", type=int, default=8)
    ap.add_argument("--caption_batch", type=int, default=64)
    ap.add_argument("--quantize", type=int, default=0,
                    help="int8-quantize the transformer matmul kernels "
                         "(clipbert.quantize_scoring_params) — measures the "
                         "opt-in serving quantization at the full-matrix "
                         "eval shape")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from clipbert_tpu.core import compile_cache
    from clipbert_tpu.core.config import ModelConfig, RunConfig
    from clipbert_tpu.core.mesh import make_mesh
    from clipbert_tpu.data import tokenization
    from clipbert_tpu.data.datasets import VideoRetrievalEvalDataset
    from clipbert_tpu.models import clipbert
    from clipbert_tpu.tasks.run_video_retrieval import inference_retrieval

    compile_cache.enable()

    import tempfile
    td = tempfile.mkdtemp(prefix="retr_eval_")
    vpath = os.path.join(td, "vocab.txt")
    tokenization.write_tiny_vocab(
        vpath, extra_tokens=["caption", "number"] + [str(i) for i in range(10)])
    tokenizer = tokenization.BertTokenizer(vpath)

    datalist = [{"id": i, "txt": f"caption number {i % 97}",
                 "vid_id": f"v{i % args.n_videos}"}
                for i in range(args.n_captions)]

    frames = np.random.default_rng(0).integers(
        0, 256, (args.n_clips * args.num_frm, 240, 320, 3), dtype=np.uint8)

    class StubDecodeDataset(VideoRetrievalEvalDataset):
        """Production dataset with decode stubbed (data plane measured by
        bench_dataplane.py); device resize path stays live."""

        def load_video_multi_clips(self, vid_id, n_clips, random_clips,
                                   prev_clip_fallback=False, rng=None):
            return frames

    ds = StubDecodeDataset(
        datalist, tokenizer, media_store=None, fps=1, num_frm=args.num_frm,
        max_img_size=448, max_txt_len=20, ensemble_n_clips=args.n_clips,
        device_preprocess=True)

    cfg = RunConfig(model_config="", loss_type="ce", num_labels=2,
                    inference_n_clips=args.n_clips, num_frm=args.num_frm,
                    max_img_size=448, max_txt_len=20, score_agg_func="lse",
                    inference_batch_size=args.caption_batch,
                    inference_video_batch_size=args.video_batch, n_workers=2,
                    fps=1)
    model_cfg = ModelConfig(num_labels=2)
    mesh = make_mesh()
    params = clipbert.init_clipbert(jax.random.key(0), model_cfg, "retrieval")
    params = clipbert.fold_cnn_bn_scales(params)
    if args.quantize:
        params = clipbert.quantize_scoring_params(params)
    params = jax.device_put(params)

    # warm compiles on a 2-video slice
    warm = StubDecodeDataset(
        datalist[: 2 * max(1, args.n_captions // args.n_videos)], tokenizer,
        media_store=None, fps=1, num_frm=args.num_frm, max_img_size=448,
        max_txt_len=20, ensemble_n_clips=args.n_clips, device_preprocess=True)
    inference_retrieval(cfg, model_cfg, params, warm, mesh, jnp.bfloat16)

    t0 = time.time()
    inference_retrieval(cfg, model_cfg, params, ds, mesh, jnp.bfloat16)
    dt = time.time() - t0

    per_video = dt / args.n_videos
    print(json.dumps({
        "metric": "msrvtt_retrieval_full_matrix_eval",
        "quantize": bool(args.quantize),
        "n_videos": args.n_videos, "n_captions": args.n_captions,
        "n_clips": args.n_clips, "seconds": round(dt, 1),
        "sec_per_video_vs_1000_caps": round(per_video, 3),
        "full_1000x1000_seconds_est": round(per_video * 1000, 1),
        "pair_clip_scores_per_sec": round(
            args.n_videos * args.n_captions * args.n_clips / dt, 0),
    }))


if __name__ == "__main__":
    main()

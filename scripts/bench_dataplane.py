"""Data-plane benchmark: decode -> device preprocess -> ResNet -> BERT,
END TO END on real video bytes (the north-star unit names decode, not
synthetic pixels — BASELINE.json; reference decode path
`/root/reference/src/datasets/decoder.py:203-283`).

Synthesizes MSRVTT-shaped mp4s (320x240 H.264) with the native encoder,
packs them into a CBPK store, and runs the 16-clip MSRVTT retrieval
inference unit through the REAL pipeline: VideoRetrievalEvalDataset
(native C++ decode, 16-clip ensemble) -> threaded prefetch ->
jitted device resize/pad/normalize -> cached visual encode -> text scoring
(tasks.run_video_retrieval.inference_retrieval).

Reports three clips/s rates as JSON lines:
  host_decode     — loader-only loop (decode + collate, no device work);
                    the 1-CPU-core ceiling of this box
  device_unit     — the device-only rate measured by bench.py (for context;
                    pass --device_rate to override the default)
  end_to_end      — wall-clock of the full overlapped pipeline

Run on the real TPU with the box otherwise idle:
    python scripts/bench_dataplane.py [--n_videos 24]
"""

import argparse
import ctypes
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_store(path: str, n_videos: int, w=320, h=240, frames=120, fps=12.0):
    nd = os.path.join(os.path.dirname(__file__), "..", "native")
    lib_path = os.path.join(nd, "libclipbert_data.so")
    if not os.path.exists(lib_path):
        subprocess.run(["make", "-C", nd], check=True)
    lib = ctypes.CDLL(lib_path)
    lib.venc_make_test_video.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double]
    from clipbert_tpu.data.store import PackWriter
    with tempfile.TemporaryDirectory() as td, PackWriter(path) as wtr:
        for i in range(n_videos):
            # vary frame counts a little so seek paths differ
            mp4 = os.path.join(td, f"v{i}.mp4")
            rc = lib.venc_make_test_video(
                mp4.encode(), w, h, frames + (i % 3) * 8, fps)
            assert rc == 0
            with open(mp4, "rb") as f:
                wtr.put(f"vid{i}", f.read())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_videos", type=int, default=24)
    ap.add_argument("--n_clips", type=int, default=16)
    ap.add_argument("--num_frm", type=int, default=2)
    ap.add_argument("--max_img_size", type=int, default=448)
    ap.add_argument("--device_rate", type=float, default=1200.7,
                    help="bench.py 16-clip device-only clips/s, for context")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from clipbert_tpu.core import compile_cache
    compile_cache.enable()
    from clipbert_tpu.core.config import ModelConfig, RunConfig
    from clipbert_tpu.core.mesh import make_mesh
    from clipbert_tpu.data.datasets import VideoRetrievalEvalDataset
    from clipbert_tpu.data.store import open_store
    from clipbert_tpu.data.tokenization import BertTokenizer
    from clipbert_tpu.models import clipbert
    from clipbert_tpu.tasks.run_video_retrieval import inference_retrieval

    tmp = tempfile.mkdtemp(prefix="dataplane_")
    store_path = os.path.join(tmp, "videos.cbpk")
    t0 = time.time()
    make_store(store_path, args.n_videos)
    print(f"# store built in {time.time() - t0:.1f}s", file=sys.stderr)

    tok_dir = os.environ.get("CLIPBERT_TOKENIZER", "")
    if tok_dir:
        tokenizer = BertTokenizer.from_dir(tok_dir)
    else:
        from clipbert_tpu.data import tokenization
        vpath = os.path.join(tmp, "vocab.txt")
        tokenization.write_tiny_vocab(
            vpath, extra_tokens=["a", "person", "does", "thing", "number"]
            + [str(i) for i in range(10)])
        tokenizer = BertTokenizer(vpath)

    datalist = [{"id": i, "txt": f"a person does thing number {i}",
                 "vid_id": f"vid{i % args.n_videos}"}
                for i in range(args.n_videos)]
    ds = VideoRetrievalEvalDataset(
        datalist, tokenizer, open_store(store_path), fps=1,
        num_frm=args.num_frm, max_img_size=args.max_img_size,
        max_txt_len=20, ensemble_n_clips=args.n_clips,
        device_preprocess=True)

    clips_per_video = args.n_clips
    # -- host decode rate (loader only; decode + vis_item, no device) ------
    t0 = time.time()
    for i in range(len(ds)):
        _ = ds[i]
    host_s = time.time() - t0
    host_rate = args.n_videos * clips_per_video / host_s

    # -- end to end: the real inference_retrieval pipeline -----------------
    cfg = RunConfig(model_config="", loss_type="ce", num_labels=2,
                    inference_n_clips=args.n_clips, num_frm=args.num_frm,
                    max_img_size=args.max_img_size, max_txt_len=20,
                    score_agg_func="lse", inference_batch_size=64,
                    inference_video_batch_size=4, n_workers=4, fps=1)
    model_cfg = ModelConfig(num_labels=2)   # base BERT + R50 defaults
    mesh = make_mesh()
    params = clipbert.init_clipbert(jax.random.key(0), model_cfg, "retrieval")
    params = clipbert.fold_cnn_bn_scales(params)
    params = jax.device_put(params)

    # warm the compile caches with one tiny pass (2 videos)
    small = VideoRetrievalEvalDataset(
        datalist[:2], tokenizer, open_store(store_path), fps=1,
        num_frm=args.num_frm, max_img_size=args.max_img_size,
        max_txt_len=20, ensemble_n_clips=args.n_clips,
        device_preprocess=True)
    inference_retrieval(cfg, model_cfg, params, small, mesh, jnp.bfloat16)

    t0 = time.time()
    inference_retrieval(cfg, model_cfg, params, ds, mesh, jnp.bfloat16)
    e2e_s = time.time() - t0
    e2e_rate = args.n_videos * clips_per_video / e2e_s

    for name, rate in [("host_decode", host_rate),
                       ("device_unit", args.device_rate),
                       ("end_to_end", e2e_rate)]:
        print(json.dumps({"metric": f"dataplane_{name}_clips_per_sec",
                          "value": round(rate, 2), "unit": "clips/s",
                          "host_cores": os.cpu_count()}))


if __name__ == "__main__":
    main()

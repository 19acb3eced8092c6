"""Convergence-length training on the REAL chip + mid-run SIGTERM resume.

VERDICT r4 #3: every multi-step training claim was proven on the CPU mesh
or over 3 steps; this script runs ~100 steps of the MSRVTT-retrieval train
shape (real BERT-base + R50 @ 448, LSE loss, synthetic store data) on the
TPU, asserts the loss descends materially from its step-1 value, sends
SIGTERM mid-run, relaunches, and confirms the resumed curve CONTINUES
(does not restart). Results go to stdout as JSON for PARITY.md.

Usage (TPU, box otherwise idle — budget like a bench):
    python scripts/train_convergence_tpu.py [--steps 100]

The orchestrator health-probes the platform first (CLAUDE.md: the tunnel
can wedge for ~30 min), launches the worker subprocess, SIGTERMs it after
the first restore bundle lands, relaunches to completion, and checks the
two loss curves join.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

NUM_FRM = 2
TRAIN_N_CLIPS = 4
BATCH_VIDEOS = 2
ITM_NEG = 1
N_VIDEOS = 64


def build_corpus(root: str):
    """Synthetic MSRVTT-shaped corpus: 64 distinguishable 320x240 videos +
    captions keyed to them (the model can overfit -> the loss must fall)."""
    from clipbert_tpu.data import store, tokenization, video

    vocab = os.path.join(root, "vocab.txt")
    tokenization.write_tiny_vocab(
        vocab, extra_tokens=["a", "person", "does", "thing", "red", "green",
                             "blue"] + [str(i) for i in range(100)])
    store_path = os.path.join(root, "videos.cbpk")
    rng = np.random.default_rng(5)
    with store.PackWriter(store_path) as w:
        for i in range(N_VIDEOS):
            frames = rng.integers(0, 40, (24, 240, 320, 3)).astype(np.uint8)
            frames[:, :, :, i % 3] += np.uint8(120 + (i * 7) % 100)
            w.put(f"vid{i}", video.encode_jseq_from_array(frames, fps=8))
    ann = os.path.join(root, "ret.jsonl")
    with open(ann, "w") as f:
        for i in range(N_VIDEOS):
            f.write(json.dumps({"vid_id": f"vid{i}", "id": i,
                                "txt": f"a person does thing {i}"}) + "\n")
    return vocab, store_path, ann


def worker(root: str, out_dir: str, steps: int, result_path: str):
    from clipbert_tpu.ckpt import checkpoint as ck
    from clipbert_tpu.core.config import DatasetSpec, RunConfig
    from clipbert_tpu.tasks import run_video_retrieval

    resumed = {"step": None}
    _restore = ck.TrainingRestorer.restore

    def _patched(self, *a, **k):
        out = _restore(self, *a, **k)
        if out is not None:
            resumed["step"] = int(out[0])
        return out

    ck.TrainingRestorer.restore = _patched

    vocab = os.path.join(root, "vocab.txt")
    ann = os.path.join(root, "ret.jsonl")
    store_path = os.path.join(root, "videos.cbpk")
    steps_per_epoch = N_VIDEOS // BATCH_VIDEOS
    cfg = RunConfig(
        model_config="configs/base_model.json",
        tokenizer_dir=root, output_dir=out_dir,
        bf16=True, max_img_size=448, max_txt_len=20,
        train_batch_size=BATCH_VIDEOS, num_frm=NUM_FRM, fps=2,
        train_n_clips=TRAIN_N_CLIPS, itm_neg_size=ITM_NEG,
        loss_type="ce", score_agg_func="lse",
        num_train_epochs=steps / steps_per_epoch,
        learning_rate=1e-4, cnn_learning_rate=1e-4,
        # history entry every ~steps/10; restore bundle every ~steps/4
        num_valid=10, min_valid_steps=1, save_steps_ratio=0.26,
        n_workers=1, seed=11,
        train_datasets=[DatasetSpec(name="ret", txt=ann, img=store_path)],
        val_datasets=[])
    assert os.path.exists(vocab)
    result = run_video_retrieval.start_training(cfg)
    hist = [{"step": h["step"], "loss": h["loss"]}
            for h in result["history"]]
    with open(result_path, "w") as f:
        json.dump({"global_step": result["global_step"],
                   "resumed_step": resumed["step"], "history": hist}, f)
    print("WORKER_DONE", result["global_step"], flush=True)


def health_probe(timeout_s: float = 90.0):
    """A matmul must round-trip before we spend the budget (the platform
    can wedge outright — CLAUDE.md)."""
    import multiprocessing as mp

    def probe(q):
        import jax
        import jax.numpy as jnp
        x = jnp.ones((1024, 1024), jnp.bfloat16)
        q.put(float((x @ x).astype(jnp.float32)[0, 0]))

    q = mp.Queue()
    p = mp.Process(target=probe, args=(q,))
    p.start()
    p.join(timeout_s)
    if p.is_alive():
        p.kill()
        raise SystemExit("health probe timed out: platform wedged, aborting")
    print(f"health probe ok ({q.get():.0f})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--root")
    ap.add_argument("--out")
    ap.add_argument("--result")
    args = ap.parse_args()

    if args.worker:
        worker(args.root, args.out, args.steps, args.result)
        return

    health_probe()
    root = tempfile.mkdtemp(prefix="conv_run_")
    build_corpus(root)
    out_dir = os.path.join(root, "out")
    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

    def launch(tag):
        res = os.path.join(root, f"result_{tag}.json")
        p = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--steps", str(args.steps), "--root", root, "--out", out_dir,
             "--result", res],
            cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        return p, res

    # phase A: run until the first restore bundle lands, then SIGTERM
    pA, resA = launch("a")
    bundle = os.path.join(out_dir, "restore.npz")
    deadline = time.monotonic() + 3600
    while not os.path.exists(bundle) and pA.poll() is None:
        if time.monotonic() > deadline:
            pA.kill()
            raise SystemExit("phase A never produced a restore bundle")
        time.sleep(2)
    assert pA.poll() is None, pA.communicate()[0][-4000:]
    time.sleep(5)                       # a few more steps past the bundle
    pA.send_signal(signal.SIGTERM)
    outA, _ = pA.communicate(timeout=600)
    assert pA.returncode == 0, outA[-4000:]
    a = json.load(open(resA))
    assert a["resumed_step"] is None
    assert 0 < a["global_step"] < args.steps, a["global_step"]

    # phase B: relaunch -> auto-resume -> run to completion
    pB, resB = launch("b")
    outB, _ = pB.communicate(timeout=3600)
    assert pB.returncode == 0, outB[-4000:]
    b = json.load(open(resB))
    assert b["resumed_step"] == a["global_step"], (b["resumed_step"], a)
    assert b["global_step"] == args.steps, b["global_step"]

    first = a["history"][0]["loss"]
    last = b["history"][-1]["loss"]
    resumed_first = b["history"][0]["loss"] if b["history"] else None
    verdicts = {
        "descends": last < 0.6 * first,
        "resume_continues": (resumed_first is not None
                             and resumed_first < 0.9 * first),
    }
    print(json.dumps({
        "metric": "tpu_convergence_run",
        "steps": args.steps,
        "sigterm_at_step": a["global_step"],
        "resumed_step": b["resumed_step"],
        "first_loss": round(first, 4),
        "loss_at_sigterm": round(a["history"][-1]["loss"], 4)
        if a["history"] else None,
        "first_resumed_loss": round(resumed_first, 4)
        if resumed_first is not None else None,
        "final_loss": round(last, 4),
        "history_a": a["history"], "history_b": b["history"],
        **verdicts}, ), flush=True)
    assert all(verdicts.values()), verdicts


if __name__ == "__main__":
    main()

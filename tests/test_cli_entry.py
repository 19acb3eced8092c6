"""The user-facing CLI surface: `python -m clipbert_tpu.tasks.run_vqa
--config <json> --debug 1` as a REAL subprocess (module __main__, argparse
--config resolution, full debug train + artifacts, exit 0) — the same
invocation shape as the reference's horovodrun commands (README.md:93-124).
"""

import io
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from clipbert_tpu.data import store, tokenization

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_vqa_module_cli(tmp_path):
    from PIL import Image
    vocab = tmp_path / "vocab.txt"
    tokenization.write_tiny_vocab(str(vocab), extra_tokens=["cat", "a", "what"])
    tok = tokenization.BertTokenizer(str(vocab))
    (tmp_path / "model_config.json").write_text(json.dumps(dict(
        vocab_size=len(tok), hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, max_grid_row_position_embeddings=8,
        max_grid_col_position_embeddings=8)))
    imgs = tmp_path / "imgs.cbpk"
    with store.PackWriter(str(imgs)) as w:
        for i in range(8):
            buf = io.BytesIO()
            Image.fromarray(
                np.full((40, 48, 3), i * 31 % 255, np.uint8)).save(
                buf, format="JPEG")
            w.put(f"img{i}", buf.getvalue())
    ann = tmp_path / "q.jsonl"
    with open(ann, "w") as f:
        for i in range(8):
            f.write(json.dumps(
                {"question_id": i, "txt": "what a cat",
                 "img_id": f"img{i % 8}", "labels": {"cat": 1.0},
                 "answer_type": "other"}) + "\n")
    (tmp_path / "a2l.json").write_text(json.dumps({"cat": 0, "dog": 1}))

    out_dir = tmp_path / "out"
    cfg = dict(
        model_config=str(tmp_path / "model_config.json"),
        tokenizer_dir=str(tmp_path), output_dir=str(out_dir),
        bf16=False, max_img_size=64, max_txt_len=8, train_batch_size=8,
        val_batch_size=8, num_train_epochs=2, n_workers=2, num_valid=1,
        min_valid_steps=100, learning_rate=1e-4, cnn_learning_rate=1e-4,
        seed=3, ans2label_path=str(tmp_path / "a2l.json"), loss_type="bce",
        max_n_example_per_group=1,
        train_datasets=[{"name": "v", "txt": str(ann), "img": str(imgs)}],
        val_datasets=[{"name": "v", "txt": str(ann), "img": str(imgs)}])
    cfg_path = tmp_path / "run.json"
    cfg_path.write_text(json.dumps(cfg))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the container sitecustomize pins the remote TPU backend via
    # jax.config, which outranks JAX_PLATFORMS — re-pin to cpu before the
    # module main runs, then execute the module exactly as `python -m` does
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "import runpy, sys; "
         f"sys.argv = ['run_vqa', '--config', {str(cfg_path)!r}, "
         "'--debug', '1']; "
         "runpy.run_module('clipbert_tpu.tasks.run_vqa', "
         "run_name='__main__')"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert os.path.exists(out_dir / "restore.npz")
    assert any(f.startswith("model_step") for f in os.listdir(out_dir))
    assert os.path.exists(out_dir / "log" / "args.json")

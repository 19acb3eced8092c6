"""Multi-host PRETRAIN execution test: 2 coordinated processes x 4 virtual
CPU devices drive the real pretraining runner (MetaLoader over two caption
datasets, MLM+ITM) end-to-end, proving the two cross-host contracts the
retrieval multi-host test cannot:

 - the seeded MetaLoader keeps BOTH hosts on the same task sequence across
   every gradient-accumulation window WITHOUT collectives — replacing the
   reference's any_broadcast task sync
   (`/root/reference/src/datasets/dataloader.py:44-46`);
 - MLM/ITM validation counts merge across hosts to identical accuracies on
   every host (run_pretrain.py:205-273's all_gather_list reduction).

Run layout mirrors tests/test_multihost.py (the retrieval variant).
"""

import io
import json
import pathlib

import numpy as np
import pytest

REPO = str(pathlib.Path(__file__).resolve().parent.parent)

WORKER = r'''
import json, os, sys
pid = int(sys.argv[1])
port = sys.argv[2]
cfg_path = sys.argv[3]
result_path = sys.argv[4]
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")

# record the MetaLoader's per-step task choices (the cross-host contract)
from clipbert_tpu.data import loader as ld
task_seq = []
_orig_iter = ld.MetaLoader.__iter__
def _iter(self):
    for task, batch in _orig_iter(self):
        task_seq.append(task)
        yield task, batch
ld.MetaLoader.__iter__ = _iter

from clipbert_tpu.tasks import run_pretrain
result = run_pretrain.main([
    "--config", cfg_path,
    "--coordinator_address", f"localhost:{{port}}",
    "--num_processes", "2", "--process_id", str(pid),
])

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

val = result["history"][-1].get("val", {{}}) if result["history"] else {{}}
out = {{
    "pid": pid,
    "global_step": result["global_step"],
    "final_loss": result["history"][-1]["loss"] if result["history"] else None,
    "task_loss": result["task_loss"],
    "task_seq": task_seq,
    "val": {{k: v for k, v in val.items()}},
}}
with open(result_path, "w") as f:
    json.dump(out, f)
print("WORKER_DONE", pid)
'''


@pytest.fixture(scope="module")
def mh_workspace(tmp_path_factory):
    """Two synthetic caption datasets ("coco", "vg") over one image store —
    the reference's pretraining shape (run_pretrain.py:133-152)."""
    from PIL import Image

    from clipbert_tpu.data import store, tokenization

    root = tmp_path_factory.mktemp("mhp")
    vocab = root / "tok" / "vocab.txt"
    vocab.parent.mkdir()
    tokenization.write_tiny_vocab(
        str(vocab), extra_tokens=["cat", "dog", "runs", "a", "the", "red"])
    tok = tokenization.BertTokenizer(str(vocab))

    model_cfg = dict(
        vocab_size=len(tok), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, max_grid_row_position_embeddings=4,
        max_grid_col_position_embeddings=4)
    (root / "model_config.json").write_text(json.dumps(model_cfg))

    img_store = root / "imgs.cbpk"
    with store.PackWriter(str(img_store)) as w:
        for i in range(16):
            arr = np.full((40, 48, 3), (i * 17) % 255, np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            w.put(f"img{i}", buf.getvalue())

    anns = {}
    for name, phrase in (("coco", "a cat runs"), ("vg", "the red dog")):
        rows = [{"img_id": f"img{i}", "txt": f"{phrase} {i}"}
                for i in range(16)]
        p = root / f"{name}.jsonl"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        anns[name] = str(p)

    out_dir = root / "out"
    run_cfg = dict(
        model_config=str(root / "model_config.json"),
        tokenizer_dir=str(vocab.parent), output_dir=str(out_dir),
        debug=True, bf16=False, max_img_size=64, max_txt_len=10,
        # per-HOST batch x 2 hosts = global 16 groups over the 8-dev mesh
        train_batch_size=8, val_batch_size=4, num_train_epochs=5,
        n_workers=2, num_valid=1, min_valid_steps=100,
        learning_rate=1e-4, cnn_learning_rate=1e-4, seed=7,
        use_mlm=True, use_itm=True, itm_neg_prob=0.5,
        max_n_example_per_group=1,
        # 2-batch accumulation window: the MetaLoader must hold ONE task
        # constant inside each window on BOTH hosts
        gradient_accumulation_steps=2,
        train_datasets=[
            {"name": "coco", "txt": anns["coco"], "img": str(img_store),
             "ratio": 1.0},
            {"name": "vg", "txt": anns["vg"], "img": str(img_store),
             "ratio": 1.0}],
        val_datasets=[
            {"name": "coco", "txt": anns["coco"], "img": str(img_store)}])
    cfg_path = root / "mh_pretrain.json"
    cfg_path.write_text(json.dumps(run_cfg))

    worker_py = root / "worker.py"
    worker_py.write_text(WORKER.format(repo=REPO))
    return {"root": root, "cfg": str(cfg_path), "worker": str(worker_py)}


def test_two_process_pretrain(mh_workspace):
    ws = mh_workspace
    from tests.mh_launch import launch_pair
    results = [str(ws["root"] / f"result_{pid}.json") for pid in (0, 1)]
    r0, r1 = launch_pair(ws["worker"], ws["cfg"], results, REPO)

    # same 3 debug updates on both hosts
    assert r0["global_step"] == 3 and r1["global_step"] == 3

    # IDENTICAL per-step task choices with zero collectives: 3 updates x
    # accum 2 = 6 picks, constant inside each accumulation window
    assert len(r0["task_seq"]) >= 6
    assert r0["task_seq"][:6] == r1["task_seq"][:6], (
        r0["task_seq"], r1["task_seq"])
    for w in range(3):
        window = r0["task_seq"][2 * w:2 * w + 2]
        assert len(set(window)) == 1, (w, r0["task_seq"])
    assert set(r0["task_seq"][:6]) <= {"coco", "vg"}

    # the update is global (GSPMD psum over both hosts' shards): the
    # training loss is THE SAME number on both hosts
    np.testing.assert_allclose(r0["final_loss"], r1["final_loss"],
                               rtol=1e-6)
    assert set(r0["task_loss"]) == set(r1["task_loss"])
    for t in r0["task_loss"]:
        np.testing.assert_allclose(r0["task_loss"][t], r1["task_loss"][t],
                                   rtol=1e-6)

    # MLM/ITM validation merged across hosts: identical accs on every host,
    # and both metrics actually computed (non-degenerate counts)
    assert r0["val"] and r0["val"] == r1["val"], (r0["val"], r1["val"])
    assert "coco_mlm_acc" in r0["val"] and "coco_itm_acc" in r0["val"]
    assert 0.0 <= r0["val"]["coco_mlm_acc"] <= 1.0
    assert 0.0 <= r0["val"]["coco_itm_acc"] <= 1.0

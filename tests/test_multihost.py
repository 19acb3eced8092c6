"""Multi-host execution test: 2 coordinated processes x 4 virtual CPU
devices drive the REAL retrieval runner end-to-end through the CLI flag
surface (`--coordinator_address/--num_processes/--process_id`), exercising
the process_count>1 branches that single-process tests short-circuit:

 - `core.mesh.maybe_init_distributed` wiring at runner entry (the
   reference's hvd.init(), run_pretrain.py:484) and the global 8-device mesh
 - per-host `ShardedBatchSampler` shards (disjoint + complete)
 - global-batch assembly (`put_batch_sharded`) + XLA cross-host grad psum
 - the padded-pickle `all_gather_objects` multi-host branch merging
   validation rows identically on every host, and true `broadcast_object`
 - main-process-only checkpoint/TB writes
 - auto-resume after BOTH processes restart

Reference equivalent being matched: `horovodrun -np N` training
(`/root/reference/README.md:93`, `src/utils/distributed.py:148-203`).
"""

import json
import os
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

# count writer calls to prove main-process-only gating
from clipbert_tpu.ckpt import checkpoint as ck
from clipbert_tpu.utils import logger as lg
calls = {{"saver": 0, "restorer": 0, "tb_create": 0, "resumed_step": None}}
_saver_save = ck.ModelSaver.save
ck.ModelSaver.save = lambda self, *a, **k: (
    calls.__setitem__("saver", calls["saver"] + 1),
    _saver_save(self, *a, **k))[-1]
_rest_save = ck.TrainingRestorer.save
ck.TrainingRestorer.save = lambda self, *a, **k: (
    calls.__setitem__("restorer", calls["restorer"] + 1),
    _rest_save(self, *a, **k))[-1]
_rest_restore = ck.TrainingRestorer.restore
def _restore(self, *a, **k):
    out = _rest_restore(self, *a, **k)
    if out is not None:
        calls["resumed_step"] = int(out[0])
    return out
ck.TrainingRestorer.restore = _restore
_tb_create = lg.TB_LOGGER.create
def _create(*a, **k):
    calls["tb_create"] += 1
    return _tb_create(*a, **k)
lg.TB_LOGGER.create = _create

from clipbert_tpu.tasks import run_video_retrieval
result = run_video_retrieval.main([
    "--config", cfg_path,
    "--coordinator_address", f"localhost:{{port}}",
    "--num_processes", "2", "--process_id", str(pid),
])

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
from clipbert_tpu.utils import distributed as dist
assert dist.is_main_process() == (pid == 0)

# multi-host branch of all_gather_objects: variable-size payloads pad+merge
g = dist.all_gather_objects({{"pid": pid, "blob": "x" * (10 + 500 * pid)}})
assert [o["pid"] for o in g] == [0, 1]
assert [len(o["blob"]) for o in g] == [10, 510]

# true broadcast, default and non-zero roots
assert dist.broadcast_object({{"s": 42}} if pid == 0 else None)["s"] == 42
assert dist.broadcast_object("from1" if pid == 1 else None, root=1) == "from1"

# per-host sampler shards are disjoint and complete
from clipbert_tpu.data.loader import ShardedBatchSampler
s = ShardedBatchSampler(10, 2, shuffle=True, seed=3, process_index=pid,
                        process_count=2, drop_last=False)
mine = [i for b in s for i in b]
shards = dist.all_gather_objects(mine)
assert not (set(shards[0]) & set(shards[1])), shards
assert set(shards[0]) | set(shards[1]) == set(range(10)), shards

import numpy as np
val = result["history"][-1]["val"] if result["history"] else {{}}
out = {{
    "pid": pid,
    "global_step": result["global_step"],
    "opt_step": int(np.asarray(result["state"].opt.step)),
    "t2v_r1": val.get("t2v_r1"),
    "score_matrix": (np.asarray(val["score_matrix"]).tolist()
                     if "score_matrix" in val else None),
    **calls,
}}
with open(result_path, "w") as f:
    json.dump(out, f)
print("WORKER_DONE", pid)
'''


def test_partial_topology_fails_loudly(monkeypatch):
    """num_processes/process_id without a coordinator address must raise,
    not silently run N independent single-process trainings (every host
    would pass is_main_process() and write checkpoints)."""
    from clipbert_tpu.core import mesh
    monkeypatch.setattr(mesh, "_dist_initialized", False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    monkeypatch.setenv("CLIPBERT_NUM_PROCESSES", "4")
    with pytest.raises(ValueError, match="coordinator"):
        mesh.maybe_init_distributed()
    monkeypatch.delenv("CLIPBERT_NUM_PROCESSES", raising=False)
    monkeypatch.setenv("CLIPBERT_PROCESS_ID", "2")
    with pytest.raises(ValueError, match="coordinator"):
        mesh.maybe_init_distributed()
    # no topology at all: plain single-host, no init
    monkeypatch.delenv("CLIPBERT_PROCESS_ID", raising=False)
    assert mesh.maybe_init_distributed() is False


@pytest.fixture(scope="module")
def mh_workspace(tmp_path_factory):
    """Synthetic retrieval corpus shared by both worker processes."""
    from clipbert_tpu.data import store, tokenization, video

    root = tmp_path_factory.mktemp("mh")
    vocab = root / "tok" / "vocab.txt"
    vocab.parent.mkdir()
    tokenization.write_tiny_vocab(
        str(vocab), extra_tokens=["cat", "dog", "runs", "a", "the"])
    tok = tokenization.BertTokenizer(str(vocab))

    model_cfg = dict(
        vocab_size=len(tok), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, max_grid_row_position_embeddings=4,
        max_grid_col_position_embeddings=4)
    (root / "model_config.json").write_text(json.dumps(model_cfg))

    vid_store = root / "vids.cbpk"
    with store.PackWriter(str(vid_store)) as w:
        for i in range(16):
            frames = np.zeros((12, 32, 32, 3), np.uint8)
            frames[:, :, :, 0] = (i * 15) % 255
            for t in range(12):
                frames[t, :, :, 1] = t * 20
            w.put(f"vid{i}", video.encode_jseq_from_array(frames, fps=8))

    rows = [{"vid_id": f"vid{i}", "txt": f"a cat runs {i}", "id": i}
            for i in range(16)]
    ann = root / "ret.jsonl"
    with open(ann, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    out_dir = root / "out"
    run_cfg = dict(
        model_config=str(root / "model_config.json"),
        tokenizer_dir=str(vocab.parent), output_dir=str(out_dir),
        debug=True, bf16=False, max_img_size=64, max_txt_len=10,
        # per-HOST batch (DistributedSampler semantics): 8 rows/host x 2
        # hosts = global 16 over the 8-device mesh
        train_batch_size=8, num_train_epochs=5, n_workers=2, num_valid=1,
        min_valid_steps=100, learning_rate=1e-4, cnn_learning_rate=1e-4,
        seed=7, loss_type="ce", score_agg_func="lse", train_n_clips=2,
        inference_n_clips=2, num_frm=1, fps=4, itm_neg_size=1,
        inference_batch_size=4, save_steps_ratio=0.34,
        train_datasets=[{"name": "ret", "txt": str(ann),
                         "img": str(vid_store)}],
        val_datasets=[{"name": "ret", "txt": str(ann),
                       "img": str(vid_store)}])
    cfg_path = root / "mh_run.json"
    cfg_path.write_text(json.dumps(run_cfg))

    worker_py = root / "worker.py"
    worker_py.write_text(WORKER.format(repo=REPO))
    return {"root": root, "cfg": str(cfg_path), "worker": str(worker_py),
            "out_dir": str(out_dir)}


def _launch_pair(ws, round_tag: str):
    from tests.mh_launch import launch_pair
    results = [str(ws["root"] / f"result_{round_tag}_{pid}.json")
               for pid in (0, 1)]
    return launch_pair(ws["worker"], ws["cfg"], results, REPO)


def test_two_process_train_validate_resume(mh_workspace):
    ws = mh_workspace
    r0, r1 = _launch_pair(ws, "a")

    # training ran the same 3 debug steps on both hosts
    assert r0["global_step"] == 3 and r1["global_step"] == 3
    assert r0["opt_step"] == 3 and r1["opt_step"] == 3

    # validation merged to the SAME complete score matrix on every host:
    # each host scored 8 of the 16 videos, all_gather_objects united them
    m0 = np.asarray(r0["score_matrix"])
    m1 = np.asarray(r1["score_matrix"])
    assert m0.shape == (16, 16)
    np.testing.assert_allclose(m0, m1, rtol=1e-5, atol=1e-6)
    assert r0["t2v_r1"] == r1["t2v_r1"]

    # only the main process writes checkpoints/TB
    assert r0["saver"] > 0 and r0["restorer"] > 0 and r0["tb_create"] == 1
    assert r1["saver"] == 0 and r1["restorer"] == 0 and r1["tb_create"] == 0
    assert r0["resumed_step"] is None and r1["resumed_step"] is None
    out = ws["out_dir"]
    assert any(f.startswith("model_step") for f in os.listdir(out))
    assert os.path.exists(os.path.join(out, "restore.npz"))

    # both processes restart: each auto-resumes from the shared bundle and
    # runs 0 further steps under the same debug budget
    r0b, r1b = _launch_pair(ws, "b")
    assert r0b["resumed_step"] == 3 and r1b["resumed_step"] == 3
    assert r0b["global_step"] == 3 and r1b["global_step"] == 3
    assert r0b["opt_step"] == 3 and r1b["opt_step"] == 3

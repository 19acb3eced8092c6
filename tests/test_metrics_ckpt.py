"""Retrieval metrics vs a reference-faithful torch-sort implementation,
and checkpoint save/restore/rotation tests."""

import os

import numpy as np
import pytest

from clipbert_tpu.ckpt import checkpoint
from clipbert_tpu.evaluation import metrics


# ---------------------------------------------------------------------------
# retrieval metrics
# ---------------------------------------------------------------------------

def ref_metrics(score_matrix, gt_cols):
    """Reference algorithm: torch.sort + bool matrix
    (run_video_retrieval.py:519-560)."""
    import torch
    sm = torch.from_numpy(score_matrix)
    _, idx_sorted = torch.sort(sm, dim=1, descending=True)
    gt = torch.from_numpy(np.asarray(gt_cols)).view(-1, 1)
    bool_matrix = (idx_sorted == gt).numpy()
    n = len(bool_matrix)
    rows, ranks = np.where(bool_matrix)
    return {
        "r1": 100 * bool_matrix[:, 0].sum() / n,
        "r5": 100 * bool_matrix[:, :5].sum() / n,
        "r10": 100 * bool_matrix[:, :10].sum() / n,
        "medianR": float(np.median(ranks + 1)),
        "meanR": float(np.mean(ranks + 1)),
    }


def test_retrieval_metrics_match_reference_sort(rng_np):
    n_txt, n_vid = 40, 20
    scores = rng_np.standard_normal((n_txt, n_vid)).astype(np.float32)
    gt = rng_np.integers(0, n_vid, n_txt)
    got = metrics.metrics_from_ranks(
        metrics.gt_ranks_from_scores(scores, gt))
    want = ref_metrics(scores, gt)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6, err_msg=k)


def test_retrieval_metrics_perfect_and_worst():
    n = 12
    scores = np.eye(n, dtype=np.float32)
    gt = np.arange(n)
    out = metrics.retrieval_metrics(scores, gt)
    assert out["text2video"]["r1"] == 100.0
    assert out["text2video"]["medianR"] == 1.0
    assert out["video2text"]["r1"] == 100.0
    # inverted: GT always ranked last
    scores_bad = 1.0 - np.eye(n, dtype=np.float32)
    out_bad = metrics.retrieval_metrics(scores_bad, gt)
    assert out_bad["text2video"]["r1"] == 0.0
    assert out_bad["text2video"]["meanR"] == n


def test_retrieval_v2t_duplicate_videos_last_caption_wins():
    # captions 0,1 -> video 0; caption 2 -> video 1.
    scores = np.array([[0.9, 0.1],
                       [0.2, 0.3],
                       [0.1, 0.8]], np.float32)
    out = metrics.retrieval_metrics(scores, [0, 0, 1])
    # v2t rows = videos {0,1}; GT captions = {0:1 (last), 1:2}
    # video0 scores over captions: [0.9, 0.2, 0.1], GT caption 1 rank=2
    # video1 scores: [0.1, 0.3, 0.8], GT caption 2 rank=1
    assert out["video2text"]["r1"] == 50.0
    np.testing.assert_allclose(out["video2text"]["meanR"], (2 + 1) / 2)


# ---------------------------------------------------------------------------
# checkpointing
# ---------------------------------------------------------------------------

def tree_eq(a, b):
    fa, fb = checkpoint.flatten_tree(a), checkpoint.flatten_tree(b)
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)


def test_flatten_unflatten_roundtrip(rng_np):
    tree = {"a": {"b": rng_np.standard_normal(3),
                  "list": [rng_np.standard_normal(2) for _ in range(3)]},
            "c": np.int64(7)}
    flat = checkpoint.flatten_tree(tree)
    assert "a/list/1" in flat and "a/b" in flat
    back = checkpoint.unflatten_tree(flat)
    assert isinstance(back["a"]["list"], list) and len(back["a"]["list"]) == 3
    tree_eq(tree, back)


def test_save_load_tree(tmp_path, rng_np):
    tree = {"x": rng_np.standard_normal((4, 5)).astype(np.float32),
            "nested": {"y": np.arange(6).reshape(2, 3)}}
    p = str(tmp_path / "ck.npz")
    checkpoint.save_tree(p, tree)
    tree_eq(tree, checkpoint.load_tree(p))


def test_load_with_mismatch(rng_np):
    target = {"a": np.zeros((2, 3)), "b": np.zeros(4), "c": np.zeros(5)}
    loaded = {"a": rng_np.standard_normal((2, 3)),
              "b": rng_np.standard_normal(9),  # mismatched
              "d": np.ones(1)}                 # unexpected
    merged, report = checkpoint.load_with_mismatch(target, loaded)
    np.testing.assert_array_equal(merged["a"], loaded["a"])
    np.testing.assert_array_equal(merged["b"], target["b"])
    assert report["missing"] == ["c"]
    assert report["mismatched"] == ["b"]
    assert report["unexpected"] == ["d"]


def test_model_saver(tmp_path, rng_np):
    ms = checkpoint.ModelSaver(str(tmp_path))
    ms.save(100, {"w": rng_np.standard_normal(3)})
    ms.save(200, {"w": rng_np.standard_normal(3)})
    assert ms.available_steps() == [100, 200]
    assert os.path.exists(ms.path(100))


def test_training_restorer_rotation_and_resume(tmp_path, rng_np):
    r = checkpoint.TrainingRestorer(str(tmp_path), save_steps=2)
    assert not r.has_checkpoint and r.restore() is None
    s1 = {"params": {"w": rng_np.standard_normal(3).astype(np.float32)}}
    assert not r.step(1, s1)       # 1 % 2 != 0
    assert r.step(2, s1)
    s2 = {"params": {"w": rng_np.standard_normal(3).astype(np.float32)}}
    assert r.step(4, s2)
    # primary has step 4, backup has step 2
    step, state = r.restore()
    assert step == 4
    tree_eq(state, s2)
    # torn primary -> falls back to backup
    with open(r.restore_path, "wb") as f:
        f.write(b"garbage")
    step_b, state_b = r.restore()
    assert step_b == 2
    tree_eq(state_b, s1)


def test_async_model_saver_matches_sync(tmp_path, rng_np):
    params = {"w": rng_np.standard_normal((8, 4)).astype(np.float32),
              "b": {"v": rng_np.standard_normal(4).astype(np.float32)}}
    sync = checkpoint.ModelSaver(str(tmp_path / "sync"))
    asyn = checkpoint.ModelSaver(str(tmp_path / "asyn"), async_write=True)
    p_sync = sync.save(5, params)
    p_asyn = asyn.save(5, params)
    checkpoint.drain_writes()            # async save durable after drain
    tree_eq(checkpoint.load_tree(p_sync), checkpoint.load_tree(p_asyn))


def test_async_restorer_rotation_order(tmp_path, rng_np):
    """Back-to-back async saves must rotate in submission order: the
    primary ends at the LAST save, the backup one before it."""
    r = checkpoint.TrainingRestorer(str(tmp_path), save_steps=1,
                                    async_write=True)
    states = [{"params": {"w": np.full(3, float(i), np.float32)}}
              for i in range(4)]
    for i, s in enumerate(states):
        r.save(i, s)
    # mutate the caller's tree while the write may still be pending: the
    # save must have snapshotted it (fetch_tree_host copies host leaves)
    states[3]["params"]["w"][:] = -1.0
    step, state = r.restore()            # restore() drains pending writes
    assert step == 3
    assert float(np.asarray(state["params"]["w"])[0]) == 3.0
    # backup holds the save before last
    bundle = checkpoint.load_tree(r.backup_path)
    assert int(bundle["global_step"]) == 2


def test_async_write_error_surfaces(tmp_path, rng_np, monkeypatch):
    ms = checkpoint.ModelSaver(str(tmp_path), async_write=True)

    def boom(path, host_flat):
        raise OSError("disk full")

    monkeypatch.setattr(checkpoint, "_write_npz", boom)
    ms.save(1, {"w": np.zeros(2, np.float32)})
    monkeypatch.undo()
    with pytest.raises(OSError, match="disk full"):
        checkpoint.drain_writes()
    # the queue is clear afterwards; later saves work again
    p = ms.save(2, {"w": np.ones(2, np.float32)})
    checkpoint.drain_writes()
    assert os.path.exists(p)


def test_save_training_meta(tmp_path):
    code = tmp_path / "code"
    code.mkdir()
    (code / "m.py").write_text("x = 1\n")
    out = str(tmp_path / "out")
    checkpoint.save_training_meta(out, {"lr": 1e-4}, {"hidden": 8},
                                  code_dir=str(code))
    assert checkpoint.load_training_args(out) == {"lr": 1e-4}
    assert os.path.exists(os.path.join(out, "code.zip"))

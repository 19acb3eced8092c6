"""Multi-chip retrieval eval: video batches shard over the mesh data axis.

On a multi-chip host the cached-feature eval must split the CNN encode
across chips (video axis sharded when inference_video_batch_size divides
the data-axis size) instead of serializing on chip 0; tail/indivisible
batches replicate. Runs on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clipbert_tpu.core.config import ModelConfig, RunConfig
from clipbert_tpu.core.mesh import make_mesh
from clipbert_tpu.data import store, tokenization, video
from clipbert_tpu.data.datasets import VideoRetrievalEvalDataset
from clipbert_tpu.models import clipbert
from clipbert_tpu.tasks.run_video_retrieval import inference_retrieval

MCFG = ModelConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                   num_attention_heads=2, intermediate_size=64,
                   max_position_embeddings=64,
                   max_grid_row_position_embeddings=8,
                   max_grid_col_position_embeddings=8, num_labels=2)


@pytest.fixture(scope="module")
def eval_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("shard_eval")
    vp = root / "vocab.txt"
    tokenization.write_tiny_vocab(str(vp), extra_tokens=["cat", "a"])
    tok = tokenization.BertTokenizer(str(vp))
    vs = root / "v.cbpk"
    with store.PackWriter(str(vs)) as w:
        for i in range(16):
            fr = np.zeros((8, 36, 48, 3), np.uint8)
            fr[:, :, :, 0] = i * 15
            w.put(f"vid{i}", video.encode_jseq_from_array(fr, fps=8))
    dl = [{"id": i, "txt": "a cat", "vid_id": f"vid{i}"} for i in range(16)]
    return VideoRetrievalEvalDataset(
        dl, tok, store.open_store(str(vs)), num_frm=2, max_img_size=64,
        max_txt_len=8, ensemble_n_clips=2, device_preprocess=True), tok


def _run(eval_ds, vb):
    ds, tok = eval_ds
    mcfg = MCFG.replace(vocab_size=len(tok))
    cfg = RunConfig(model_config="", loss_type="ce", num_labels=2,
                    inference_n_clips=2, num_frm=2, max_img_size=64,
                    max_txt_len=8, score_agg_func="lse",
                    inference_batch_size=8, inference_video_batch_size=vb,
                    n_workers=2)
    mesh = make_mesh()
    params = clipbert.init_clipbert(jax.random.key(0), mcfg, "retrieval")
    params = clipbert.fold_cnn_bn_scales(params)
    return inference_retrieval(cfg, mcfg, params, ds, mesh, jnp.float32)


def test_sharded_video_batch_matches_replicated(eval_ds):
    """vb=8 (sharded over the 8-device data axis) and vb=2 (replicated)
    must produce the same score matrix."""
    m8 = _run(eval_ds, 8)
    m2 = _run(eval_ds, 2)
    assert m8["score_matrix"].shape == (16, 16)
    np.testing.assert_allclose(m8["score_matrix"], m2["score_matrix"],
                               rtol=1e-4, atol=1e-5)


def test_eval_work_divides_across_devices(eval_ds, monkeypatch):
    """PARITY.md claims "N chips divide" the eval: assert WORK COUNTS, not
    just result equality — on the 8-device mesh with vb=8 every device must
    hold 1/8 of the encode pixels (video axis) and 1/8 of each caption
    minibatch (the scoring batch axis), i.e. the per-device shard of each
    input is actual_size/8."""
    from clipbert_tpu.train import steps

    enc_fracs, cap_fracs = [], []
    real_enc, real_prob = (steps.make_visual_encode_step,
                           steps.make_text_prob_step)

    def frac(arr):
        return arr.sharding.shard_shape(arr.shape)[0] / arr.shape[0]

    def spy_enc(**kw):
        fn = real_enc(**kw)

        def wrapped(params, pixels):
            enc_fracs.append(frac(pixels))
            return fn(params, pixels)
        return wrapped

    def spy_prob(*a, **kw):
        fn = real_prob(*a, **kw)

        def wrapped(params, feats, ids, mask):
            cap_fracs.append(frac(ids))
            return fn(params, feats, ids, mask)
        return wrapped

    monkeypatch.setattr(steps, "make_visual_encode_step", spy_enc)
    monkeypatch.setattr(steps, "make_text_prob_step", spy_prob)
    m = _run(eval_ds, 8)
    assert m["score_matrix"].shape == (16, 16)
    n_dev = jax.device_count()
    assert enc_fracs and cap_fracs
    assert all(f == 1.0 / n_dev for f in enc_fracs), enc_fracs
    assert all(f == 1.0 / n_dev for f in cap_fracs), cap_fracs


def test_eval_videos_stride_across_hosts(eval_ds, monkeypatch):
    """The per-HOST video shard (index striding by process_index /
    process_count, the reference's DistributedSampler semantics,
    run_video_retrieval.py:693-724) must actually divide the video loop:
    simulate 2 hosts, record which dataset items each decodes, and assert
    the shards are disjoint, cover everything, and merge to the
    single-host score matrix."""
    from clipbert_tpu.tasks import run_video_retrieval as rvr

    single = _run(eval_ds, 2)["score_matrix"]

    ds, tok = eval_ds
    seen = []

    class RecordingDS:
        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, k):
            return getattr(self._inner, k)

        def __len__(self):
            return len(self._inner)

        def __getitem__(self, i):
            seen.append(i)
            return self._inner[i]

    host_rows = []

    class _HostDone(Exception):
        pass

    def fake_gather(rows):
        host_rows.append(rows)
        if len(host_rows) < 2:
            raise _HostDone    # host 0: rows recorded, no metrics yet
        return host_rows

    monkeypatch.setattr(rvr.dist, "all_gather_objects", fake_gather)
    mcfg = MCFG.replace(vocab_size=len(tok))
    cfg = RunConfig(model_config="", loss_type="ce", num_labels=2,
                    inference_n_clips=2, num_frm=2, max_img_size=64,
                    max_txt_len=8, score_agg_func="lse",
                    inference_batch_size=8, inference_video_batch_size=2,
                    n_workers=2)
    mesh = make_mesh()
    params = clipbert.init_clipbert(jax.random.key(0), mcfg, "retrieval")
    params = clipbert.fold_cnn_bn_scales(params)

    per_host_seen = []
    for pi in range(2):
        monkeypatch.setattr(rvr.dist, "process_index", lambda pi=pi: pi)
        monkeypatch.setattr(rvr.dist, "process_count", lambda: 2)
        seen.clear()
        try:
            m = rvr.inference_retrieval(cfg, mcfg, params, RecordingDS(ds),
                                        mesh, jnp.float32)
        except _HostDone:
            m = None
        per_host_seen.append(set(seen))

    assert per_host_seen[0] == set(range(0, 16, 2))   # stride shards
    assert per_host_seen[1] == set(range(1, 16, 2))
    assert len(per_host_seen[0] & per_host_seen[1]) == 0
    merged = m["score_matrix"]                        # host-1 run merged both
    np.testing.assert_allclose(merged, single, rtol=1e-4, atol=1e-5)

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

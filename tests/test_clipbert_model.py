"""End-to-end ClipBERT model composition: shapes, heads, and loss parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clipbert_tpu.core.config import ModelConfig
from clipbert_tpu.core.rng import RngGen
from clipbert_tpu.models import clipbert as cb

TINY = ModelConfig(
    vocab_size=99, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64,
    max_position_embeddings=64, backbone_channel_in_size=2048,
    num_labels=5, loss_type="ce",
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


@pytest.fixture(scope="module")
def params():
    return cb.init_clipbert(jax.random.PRNGKey(0), TINY, "seq_cls")


def _batch(B=2, T=2, HW=64, Lt=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "text_input_ids": jnp.asarray(
            rng.integers(0, TINY.vocab_size, (B, Lt))),
        "text_input_mask": jnp.ones((B, Lt), jnp.int32),
        "visual_inputs": jnp.asarray(
            rng.normal(0, 1, (B, T, HW, HW, 3)).astype(np.float32)),
    }


def test_seq_cls_forward_shapes(params):
    out = cb.clipbert_forward(params, TINY, _batch(), "seq_cls",
                              compute_dtype=jnp.float32)
    assert out["logits"].shape == (2, 5)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_pretrain_forward_shapes():
    cfg = TINY
    params = cb.init_clipbert(jax.random.PRNGKey(1), cfg, "pretrain")
    b = _batch()
    out = cb.clipbert_forward(params, cfg, b, "pretrain",
                              compute_dtype=jnp.float32)
    assert out["mlm_scores"].shape == (2, 8, cfg.vocab_size)
    assert out["itm_scores"].shape == (2, 2)


def test_group_fanout(params):
    """Group size G: visuals (Bv, ...) fan out to (Bv*G, ...) texts; the two
    texts sharing a visual must see identical visual features."""
    b = _batch()
    Bv, G = 2, 2
    rng = np.random.default_rng(1)
    b["text_input_ids"] = jnp.asarray(
        rng.integers(0, TINY.vocab_size, (Bv * G, 8)))
    b["text_input_mask"] = jnp.ones((Bv * G, 8), jnp.int32)
    out = cb.clipbert_forward(params, TINY, b, "seq_cls", group_size=G,
                              compute_dtype=jnp.float32)
    assert out["logits"].shape == (Bv * G, 5)


def test_visual_feature_caching(params):
    """Precomputed visual features must give identical logits to running the
    CNN in-line (the retrieval-eval reuse path)."""
    b = _batch()
    feats = cb.cnn_forward(params["cnn"], b["visual_inputs"], jnp.float32)
    out1 = cb.clipbert_forward(params, TINY, b, "seq_cls",
                               compute_dtype=jnp.float32)
    out2 = cb.clipbert_forward(params, TINY, b, "seq_cls",
                               visual_features=feats,
                               compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out1["logits"]),
                               np.asarray(out2["logits"]), rtol=1e-5, atol=1e-5)


def test_losses_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    logits = rng.normal(0, 2, (4, 7)).astype(np.float32)
    labels = rng.integers(0, 7, (4,))
    # CE with ignore_index
    labels_ig = labels.copy()
    labels_ig[1] = -100
    ref = torch.nn.CrossEntropyLoss(reduction="none")(
        torch.tensor(logits), torch.tensor(labels_ig)).numpy()
    got = np.asarray(cb.cross_entropy(jnp.asarray(logits),
                                      jnp.asarray(labels_ig),
                                      ignore_index=-100))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    # BCE with logits
    targets = rng.uniform(0, 1, (4, 7)).astype(np.float32)
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(targets), reduction="none").numpy()
    got = np.asarray(cb.bce_with_logits(jnp.asarray(logits),
                                        jnp.asarray(targets)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_rank_loss():
    """Triplet rank loss: scores (sample_size, 1+neg), col 0 positive
    (reference modeling.py:567-575)."""
    logits = jnp.asarray(np.array([3.0, -1.0, 0.5, 2.0, 1.0, -2.0]))
    loss = cb.retrieval_rank_loss(logits, sample_size=2, margin=0.2)
    s = 1 / (1 + np.exp(-np.array([3.0, -1.0, 0.5, 2.0, 1.0, -2.0])))
    s = s.reshape(2, 3)
    ref = np.maximum(0.2 + s[:, 1:] - s[:, :1], 0)
    np.testing.assert_allclose(np.asarray(loss), ref, rtol=1e-5)


def test_pixel_random_sampling():
    cfg = TINY.replace(pixel_random_sampling_size=3)
    params = cb.init_clipbert(jax.random.PRNGKey(2), cfg, "pretrain")
    b = _batch()
    rngs = RngGen(jax.random.PRNGKey(3))
    out = cb.clipbert_forward(params, cfg, b, "pretrain", train=True,
                              rngs=rngs, compute_dtype=jnp.float32)
    # visual grid is 64/64 = 1x1 -> 1 token < 3 requested: no-op.
    assert out["itm_scores"].shape == (2, 2)


def test_jit_forward(params):
    @jax.jit
    def f(params, batch):
        return cb.clipbert_forward(params, TINY, batch, "seq_cls")["logits"]

    out = f(params, _batch())
    assert out.shape == (2, 5)

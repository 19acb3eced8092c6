"""Golden logit-parity tests: our functional BERT vs HF torch BertModel.

The reference vendors HF-2.11 BERT (`src/modeling/transformers.py`); modern HF
BertModel computes the same function for a standard config, so a randomly
initialized torch model exported through our importer must match at fp32
tolerance (no network access needed).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clipbert_tpu.core.config import ModelConfig
from clipbert_tpu.models import bert as jbert
from clipbert_tpu.ckpt import torch_import as ti

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

SMALL = ModelConfig(
    vocab_size=131, hidden_size=32, num_hidden_layers=3,
    num_attention_heads=4, intermediate_size=64,
    max_position_embeddings=48, type_vocab_size=2,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
)


def _hf_config(cfg: ModelConfig):
    return transformers.BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=cfg.layer_norm_eps, pad_token_id=cfg.pad_token_id,
        attn_implementation="eager",
    )


@pytest.fixture(scope="module")
def torch_bert():
    torch.manual_seed(0)
    model = transformers.BertModel(_hf_config(SMALL))
    model.eval()
    return model


def _export(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _import_params(sd):
    return {
        "embeddings": ti.import_bert_text_embeddings(sd),
        "encoder": ti.import_bert_encoder(sd, SMALL.num_hidden_layers),
        "pooler": ti.import_bert_pooler(sd),
    }


def test_bert_forward_parity(torch_bert):
    sd = _export(torch_bert)
    params = jax.tree.map(jnp.asarray, _import_params(sd))

    rng = np.random.default_rng(1)
    B, L = 3, 17
    ids = rng.integers(0, SMALL.vocab_size, size=(B, L))
    mask = np.ones((B, L), np.int64)
    mask[0, 12:] = 0
    mask[2, 5:] = 0

    with torch.no_grad():
        out = torch_bert(input_ids=torch.tensor(ids),
                         attention_mask=torch.tensor(mask))
    ref_seq = out.last_hidden_state.numpy()
    ref_pooled = out.pooler_output.numpy()

    emb = jbert.text_embeddings(params["embeddings"], jnp.asarray(ids), SMALL,
                                jnp.float32)
    bias = jbert.extended_attention_mask(jnp.asarray(mask))
    hidden = jbert.encoder(params["encoder"], emb, bias, SMALL)
    pooled = jbert.pooler(params["pooler"], hidden)

    # compare only valid positions (masked positions can differ freely)
    m = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(hidden)[m], ref_seq[m],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled,
                               rtol=1e-4, atol=1e-4)


def test_mlm_head_parity(torch_bert):
    torch.manual_seed(1)
    hf = transformers.BertForPreTraining(_hf_config(SMALL))
    hf.eval()
    sd = _export(hf.bert)
    params = jax.tree.map(jnp.asarray, _import_params(sd))
    head_sd = {k: v.detach().numpy() for k, v in hf.cls.state_dict().items()}
    head_sd = {f"cls.{k}": v for k, v in head_sd.items()}
    heads = jax.tree.map(jnp.asarray, ti.import_pretraining_heads(head_sd))

    rng = np.random.default_rng(2)
    B, L = 2, 9
    ids = rng.integers(0, SMALL.vocab_size, size=(B, L))
    mask = np.ones((B, L), np.int64)

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))
    ref_mlm = out.prediction_logits.numpy()
    ref_itm = out.seq_relationship_logits.numpy()

    emb = jbert.text_embeddings(params["embeddings"], jnp.asarray(ids), SMALL,
                                jnp.float32)
    bias = jbert.extended_attention_mask(jnp.asarray(mask))
    hidden = jbert.encoder(params["encoder"], emb, bias, SMALL)
    pooled = jbert.pooler(params["pooler"], hidden)
    mlm = jbert.mlm_logits(heads, params["embeddings"]["word_embeddings"],
                           hidden, SMALL)
    itm = jbert.itm_logits(heads, pooled)

    np.testing.assert_allclose(np.asarray(mlm), ref_mlm, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(itm), ref_itm, rtol=1e-4, atol=1e-4)


def test_encoder_bf16_close_to_fp32(torch_bert):
    sd = _export(torch_bert)
    params = jax.tree.map(jnp.asarray, _import_params(sd))
    rng = np.random.default_rng(3)
    ids = rng.integers(0, SMALL.vocab_size, size=(2, 12))
    mask = np.ones((2, 12), np.int64)

    def run(dtype):
        emb = jbert.text_embeddings(params["embeddings"], jnp.asarray(ids),
                                    SMALL, dtype)
        bias = jbert.extended_attention_mask(jnp.asarray(mask))
        h = jbert.encoder(params["encoder"], emb, bias, SMALL)
        return np.asarray(jbert.pooler(params["pooler"], h), np.float32)

    f32 = run(jnp.float32)
    bf16 = run(jnp.bfloat16)
    assert np.mean(np.abs(f32 - bf16)) < 0.05


def test_dropout_determinism():
    cfg = SMALL.replace(hidden_dropout_prob=0.1,
                        attention_probs_dropout_prob=0.1)
    key = jax.random.PRNGKey(0)
    params = {
        "embeddings": jbert.init_text_embeddings(key, cfg),
        "encoder": jbert.init_encoder(key, cfg),
    }
    ids = jnp.zeros((2, 8), jnp.int32)
    mask_bias = jbert.extended_attention_mask(jnp.ones((2, 8)))

    def fwd(k):
        emb = jbert.text_embeddings(params["embeddings"], ids, cfg,
                                    jnp.float32, dropout_key=k)
        return jbert.encoder(params["encoder"], emb, mask_bias, cfg,
                             dropout_key=k)

    a = fwd(jax.random.PRNGKey(7))
    b = fwd(jax.random.PRNGKey(7))
    c = fwd(jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0

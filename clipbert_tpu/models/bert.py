"""BERT encoder stack, functional-style.

Behavioral contract follows the reference's vendored HF-2.11 BERT
(`/root/reference/src/modeling/transformers.py`): post-LN transformer,
softmax(QK^T/sqrt(d)+mask)V attention (:202-286), gelu FFN (:354-381),
tanh CLS pooler (:464-476), MLM head with weight tied to the input
embeddings plus a free output bias (:497-515), and a 2-way seq-relationship
(ITM/NSP) head (:538-547).

TPU-first design decisions (deliberately NOT a translation):
 - Parameters are plain nested dicts of jnp arrays; the 12 encoder layers are
   *stacked* along a leading layer axis and executed with `lax.scan`, which
   compiles one layer body instead of unrolling 12 (faster compiles, smaller
   HLO, and XLA pipelines the weight fetches from HBM).
 - All matmuls run in the policy compute dtype (bf16) with fp32 accumulation;
   LayerNorm statistics and softmax run in fp32.
 - Dropout takes explicit rng keys so runs are reproducible under jit.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from clipbert_tpu.core.config import ModelConfig
from clipbert_tpu.ops.activations import ACT2FN
from clipbert_tpu.ops.attention import multi_head_attention
from clipbert_tpu.ops.dropout import dropout
from clipbert_tpu.ops.layernorm import layer_norm
from clipbert_tpu.ops.linear import linear

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _dense_init(key, d_in, d_out, std):
    kkernel, _ = jax.random.split(key)
    return {
        "kernel": jax.random.normal(kkernel, (d_in, d_out), jnp.float32) * std,
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def _ln_init(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def init_text_embeddings(key, cfg: ModelConfig) -> Params:
    kw, kp, kt = jax.random.split(key, 3)
    std = cfg.initializer_range
    D = cfg.hidden_size
    word = jax.random.normal(kw, (cfg.vocab_size, D), jnp.float32) * std
    # padding_idx row is zero-initialized, like nn.Embedding(padding_idx=0)
    word = word.at[cfg.pad_token_id].set(0.0)
    return {
        "word_embeddings": word,
        "position_embeddings": jax.random.normal(
            kp, (cfg.max_position_embeddings, D), jnp.float32) * std,
        "token_type_embeddings": jax.random.normal(
            kt, (cfg.type_vocab_size, D), jnp.float32) * std,
        "ln": _ln_init(D),
    }


def init_encoder(key, cfg: ModelConfig) -> Params:
    """Stacked-layer encoder params: every leaf has shape (num_layers, ...)."""
    D, I, N = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    std = cfg.initializer_range

    def one_layer(k):
        ks = jax.random.split(k, 6)
        return {
            "attention": {
                "self": {
                    "query": _dense_init(ks[0], D, D, std),
                    "key": _dense_init(ks[1], D, D, std),
                    "value": _dense_init(ks[2], D, D, std),
                },
                "output": {"dense": _dense_init(ks[3], D, D, std),
                           "ln": _ln_init(D)},
            },
            "intermediate": {"dense": _dense_init(ks[4], D, I, std)},
            "output": {"dense": _dense_init(ks[5], I, D, std),
                       "ln": _ln_init(D)},
        }

    layers = [one_layer(k) for k in jax.random.split(key, N)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def init_pooler(key, cfg: ModelConfig) -> Params:
    return {"dense": _dense_init(key, cfg.hidden_size, cfg.hidden_size,
                                 cfg.initializer_range)}


def init_pretraining_heads(key, cfg: ModelConfig) -> Params:
    """MLM transform + tied-decoder bias + ITM/NSP linear
    (reference BertPreTrainingHeads, transformers.py:538-547)."""
    k1, k2 = jax.random.split(key)
    D = cfg.hidden_size
    return {
        "predictions": {
            "transform": {"dense": _dense_init(k1, D, D, cfg.initializer_range),
                          "ln": _ln_init(D)},
            "bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
        },
        "seq_relationship": _dense_init(k2, D, 2, cfg.initializer_range),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def text_embeddings(p: Params, input_ids: jnp.ndarray, cfg: ModelConfig,
                    compute_dtype, dropout_key=None,
                    token_type_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """word + absolute-position + token-type embeddings, LN, dropout
    (reference BertEmbeddings, transformers.py:151-199)."""
    B, L = input_ids.shape
    emb = jnp.take(p["word_embeddings"], input_ids, axis=0)
    emb = emb + p["position_embeddings"][:L][None, :, :]
    if token_type_ids is None:
        emb = emb + p["token_type_embeddings"][0][None, None, :]
    else:
        emb = emb + jnp.take(p["token_type_embeddings"], token_type_ids, axis=0)
    emb = layer_norm(emb.astype(compute_dtype), p["ln"]["scale"],
                     p["ln"]["bias"], cfg.layer_norm_eps)
    return dropout(emb, cfg.hidden_dropout_prob, dropout_key)


def extended_attention_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """(B, L) {0,1} mask -> additive bias (B, 1, 1, L); matches HF's
    (1-mask)*-10000 convention used by the reference."""
    return ((1.0 - mask.astype(jnp.float32)) * -10000.0)[:, None, None, :]


def encoder(p: Params, hidden: jnp.ndarray, mask_bias: jnp.ndarray,
            cfg: ModelConfig, dropout_key: Optional[jax.Array] = None,
            remat: bool = False, unroll: bool = False,
            fused_attn: bool = False) -> jnp.ndarray:
    """12-layer post-LN encoder via lax.scan over stacked layer params
    (reference BertEncoder loop, transformers.py:429-461).

    ``unroll=True`` fully unrolls the layer scan — measured +4% on the
    batch-8192 seq-70 retrieval scoring shape (56.8 -> 59.0 TF/s on the
    92 TF/s chip) at the cost of a longer compile; eval/serving scoring
    programs opt in (compiled once, cached), the train step keeps the
    rolled scan (compile time, remat structure)."""
    num_layers = cfg.num_hidden_layers
    train = dropout_key is not None
    if train:
        flat = jax.random.split(dropout_key, num_layers * 3)
        layer_keys = flat.reshape((num_layers, 3) + flat.shape[1:])
    else:
        layer_keys = jnp.zeros((num_layers, 3), dtype=jnp.uint32)  # unused

    def layer_fn(h, xs):
        lp, keys = xs
        attn_key = keys[0] if train else None
        res_key = keys[1] if train else None
        ffn_key = keys[2] if train else None

        ctx = multi_head_attention(
            h, lp["attention"]["self"], cfg.num_attention_heads, mask_bias,
            cfg.attention_probs_dropout_prob, attn_key, fused=fused_attn)
        a = linear(ctx, lp["attention"]["output"]["dense"])
        a = dropout(a, cfg.hidden_dropout_prob, res_key)
        h = layer_norm(a + h, lp["attention"]["output"]["ln"]["scale"],
                       lp["attention"]["output"]["ln"]["bias"],
                       cfg.layer_norm_eps)

        inter = ACT2FN[cfg.hidden_act](linear(h, lp["intermediate"]["dense"]))
        out = linear(inter, lp["output"]["dense"])
        out = dropout(out, cfg.hidden_dropout_prob, ffn_key)
        h = layer_norm(out + h, lp["output"]["ln"]["scale"],
                       lp["output"]["ln"]["bias"], cfg.layer_norm_eps)
        return h, None

    body = jax.checkpoint(layer_fn) if remat else layer_fn
    hidden, _ = jax.lax.scan(body, hidden, (p, layer_keys),
                             unroll=num_layers if unroll else 1)
    return hidden


def pooler(p: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """tanh(W * h[CLS]) (reference BertPooler, transformers.py:464-476)."""
    return jnp.tanh(linear(hidden[:, 0], p["dense"]))


def mlm_logits(heads: Params, word_embeddings: jnp.ndarray,
               hidden: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """MLM prediction scores with decoder weight tied to the input embedding
    matrix (reference BertLMPredictionHead, transformers.py:497-515)."""
    t = heads["predictions"]["transform"]
    h = ACT2FN[cfg.hidden_act](linear(hidden, t["dense"]))
    h = layer_norm(h, t["ln"]["scale"], t["ln"]["bias"], cfg.layer_norm_eps)
    logits = jnp.dot(h, word_embeddings.T.astype(h.dtype),
                     preferred_element_type=jnp.float32)
    return logits + heads["predictions"]["bias"].astype(jnp.float32)


def itm_logits(heads: Params, pooled: jnp.ndarray) -> jnp.ndarray:
    return linear(pooled, heads["seq_relationship"]).astype(jnp.float32)

"""ClipBERT end-to-end model: grid-feature CNN + cross-modal BERT + task heads.

Capability match for the reference's `ClipBert` wrapper + transformer heads
(`/root/reference/src/modeling/e2e_model.py:13-50`,
`/root/reference/src/modeling/modeling.py:156-580`):

 - `ClipBertBaseModel` (modeling.py:156-238): text embeddings ‖ visual
   embeddings concatenated, visual tokens always fully visible (mask of ones),
   12-layer joint encoder, tanh CLS pooler.
 - Heads: PreTraining (MLM on text slice + 2-way ITM, :241-307),
   SequenceClassification (2-layer MLP, bce/ce/mse, :327-384),
   MultipleChoice (:387-451), Regression (:454-507),
   VideoTextRetrieval (ce or margin-rank triplet, :523-580).
 - The e2e wrapper runs the CNN once per unique visual and fans features out
   to the texts grouped with it (e2e_model.py:29-38 + data_utils.py:344-357).

TPU-first design decisions:
 - The ragged `n_examples_list` fan-out becomes a *static* group size G:
   texts arrive as (B_v * G, Lt) and visual features are broadcast with a
   reshape-free `jnp.repeat` along batch (static shapes under jit; eval pads
   and masks). The reference pads train groups to G anyway
   (data_utils.py:293-297), so semantics match.
 - Losses are computed inside the jitted step in fp32; per-element like the
   reference's reduction="none" so step code can reduce identically.
 - Everything (CNN + BERT + head + loss) is one jittable function — the
   whole per-clip unit of work (SURVEY.md §3.4) compiles to a single XLA
   program with no host round-trips.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from clipbert_tpu.core.config import ModelConfig
from clipbert_tpu.core.rng import RngGen
from clipbert_tpu.models import bert, resnet, visual_embed
from clipbert_tpu.ops.dropout import dropout
from clipbert_tpu.ops.linear import linear, quantize_dense

Params = Dict[str, Any]

HEAD_TYPES = ("pretrain", "seq_cls", "multi_choice", "regression", "retrieval")


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _mlp_head_init(key, cfg: ModelConfig, out_dim: int) -> Params:
    k1, k2 = jax.random.split(key)
    D = cfg.hidden_size
    hid = D * cfg.cls_hidden_scale
    return {"fc1": bert._dense_init(k1, D, hid, cfg.initializer_range),
            "fc2": bert._dense_init(k2, hid, out_dim, cfg.initializer_range)}


def init_base_model(key, cfg: ModelConfig) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "embeddings": bert.init_text_embeddings(ks[0], cfg),
        "visual_embeddings": visual_embed.init_visual_embeddings(ks[1], cfg),
        "encoder": bert.init_encoder(ks[2], cfg),
        "pooler": bert.init_pooler(ks[3], cfg),
    }


def init_head(key, cfg: ModelConfig, head_type: str) -> Params:
    if head_type == "pretrain":
        return {"cls": bert.init_pretraining_heads(key, cfg)}
    if head_type in ("seq_cls", "retrieval"):
        return {"classifier": _mlp_head_init(key, cfg, cfg.num_labels)}
    if head_type == "multi_choice":
        return {"classifier": _mlp_head_init(key, cfg, 1)}
    if head_type == "regression":
        k1, k2 = jax.random.split(key)
        D = cfg.hidden_size
        return {"regressor": {
            "fc1": bert._dense_init(k1, D, D, cfg.initializer_range),
            "bn": {"scale": jnp.ones((D,), jnp.float32),
                   "bias": jnp.zeros((D,), jnp.float32),
                   "mean": jnp.zeros((D,), jnp.float32),
                   "var": jnp.ones((D,), jnp.float32)},
            "fc2": bert._dense_init(k2, D, 1, cfg.initializer_range)}}
    raise ValueError(f"unknown head type {head_type}")


def init_clipbert(key, cfg: ModelConfig, head_type: str) -> Params:
    """Full e2e params. Top-level keys 'transformer' / 'cnn' mirror the
    reference's module names so the optimizer's name-based 8-group split
    (optimization/utils.py:96-117) carries over verbatim."""
    k_cnn, k_bert, k_head = jax.random.split(key, 3)
    kr, kg = jax.random.split(k_cnn)
    return {
        "cnn": {"resnet": resnet.init_resnet50(kr),
                "grid_encoder": resnet.init_grid_encoder(
                    kg, cfg.hidden_size, cfg.backbone_channel_in_size)},
        "transformer": {"bert": init_base_model(k_bert, cfg),
                        **init_head(k_head, cfg, head_type)},
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def base_forward(p: Params, cfg: ModelConfig,
                 text_input_ids: jnp.ndarray,       # (B, Lt)
                 text_input_mask: jnp.ndarray,      # (B, Lt)
                 visual_tokens_grid: jnp.ndarray,   # (B, T, H, W, D) grid feats
                 compute_dtype=jnp.bfloat16,
                 rngs: Optional[RngGen] = None,
                 train: bool = False,
                 remat: bool = False,
                 unroll: bool = False,
                 fused_attn: bool = False):
    """ClipBertBaseModel.forward (modeling.py:201-238): returns
    (sequence_output (B, Lt+Lv, D), pooled (B, D))."""
    rngs = rngs or RngGen(None)
    text_emb = bert.text_embeddings(
        p["embeddings"], text_input_ids, cfg, compute_dtype,
        dropout_key=rngs("emb_dropout") if train else None)
    vis_emb = visual_embed.visual_embeddings(
        p["visual_embeddings"], visual_tokens_grid.astype(compute_dtype), cfg,
        dropout_key=rngs("vis_dropout") if train else None,
        pixel_sampling_key=(rngs("pixel_sampling")
                            if train and cfg.pixel_random_sampling_size > 0
                            else None))
    B, Lv = vis_emb.shape[:2]
    full_mask = jnp.concatenate(
        [text_input_mask.astype(jnp.float32),
         jnp.ones((B, Lv), jnp.float32)], axis=1)
    hidden = jnp.concatenate([text_emb, vis_emb], axis=1)
    bias = bert.extended_attention_mask(full_mask)
    hidden = bert.encoder(p["encoder"], hidden, bias, cfg,
                          dropout_key=rngs("enc_dropout") if train else None,
                          remat=remat, unroll=unroll, fused_attn=fused_attn)
    pooled = bert.pooler(p["pooler"], hidden)
    return hidden, pooled


def mlp_head(p: Params, pooled: jnp.ndarray) -> jnp.ndarray:
    """dropout -> Linear -> ReLU -> Linear (modeling.py:338-343); dropout is
    applied by callers (train only)."""
    h = jax.nn.relu(linear(pooled, p["fc1"]))
    return linear(h, p["fc2"]).astype(jnp.float32)


def cnn_forward(p: Params, visual_pixels: jnp.ndarray,
                compute_dtype=jnp.bfloat16, stride_in_1x1: bool = True,
                remat: bool = False) -> jnp.ndarray:
    """(B, T, H, W, 3) preprocessed pixels -> (B, T, Hg, Wg, D) grid feats."""
    return resnet.grid_feat_forward(
        p, visual_pixels.astype(compute_dtype), stride_in_1x1, remat=remat)


def fold_cnn_bn_scales(params: Params) -> Params:
    """Inference param prep: frozen-BN scales folded into the R50 conv
    kernels (resnet.fold_bn_scales) — exact, eval-only; see that docstring."""
    out = dict(params)
    cnn = dict(params["cnn"])
    cnn["resnet"] = resnet.fold_bn_scales(cnn["resnet"])
    out["cnn"] = cnn
    return out


def quantize_scoring_params(params: Params) -> Params:
    """Opt-in int8 param prep for inference SCORING only (ops/linear.py):
    every transformer matmul kernel that flows through ops.linear — the
    stacked encoder QKV / attention-output / FFN kernels, the pooler, and
    the classifier head — becomes {kernel_i8, kscale}; `linear` dispatches
    on the key, and ops.attention merges the three quantized QKV kernels
    column-wise (scales concatenate alongside their columns, so the merged
    projection equals the three separate quantized matmuls exactly —
    tests/test_int8.py pins this). Embedding tables, LayerNorms, biases,
    the MLM head (tied weights) and the CNN stay fp. Training and parity
    oracles never call this."""
    enc = params["transformer"]["bert"]["encoder"]
    q_enc = {
        "attention": {
            "self": {n: quantize_dense(enc["attention"]["self"][n])
                     for n in ("query", "key", "value")},
            "output": {"dense": quantize_dense(
                           enc["attention"]["output"]["dense"]),
                       "ln": enc["attention"]["output"]["ln"]},
        },
        "intermediate": {"dense": quantize_dense(enc["intermediate"]["dense"])},
        "output": {"dense": quantize_dense(enc["output"]["dense"]),
                   "ln": enc["output"]["ln"]},
    }
    bert_p = dict(params["transformer"]["bert"], encoder=q_enc)
    bert_p["pooler"] = {"dense": quantize_dense(bert_p["pooler"]["dense"])}
    tp = dict(params["transformer"], bert=bert_p)
    if "classifier" in tp:
        tp["classifier"] = {k: quantize_dense(v)
                            for k, v in tp["classifier"].items()}
    return dict(params, transformer=tp)


def repeat_for_texts(visual_feats: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """Fan visual features out to the texts grouped with each visual —
    the static-shape equivalent of repeat_tensor_rows (data_utils.py:344-357).
    (B_v, ...) -> (B_v * G, ...), rows repeated consecutively."""
    if group_size == 1:
        return visual_feats
    return jnp.repeat(visual_feats, group_size, axis=0)


def clipbert_forward(
    params: Params,
    cfg: ModelConfig,
    batch: Dict[str, jnp.ndarray],
    head_type: str,
    *,
    train: bool = False,
    rngs: Optional[RngGen] = None,
    compute_dtype=jnp.bfloat16,
    stride_in_1x1: bool = True,
    visual_features: Optional[jnp.ndarray] = None,
    group_size: int = 1,
    remat: bool = False,
    unroll: bool = False,
    fused_attn: bool = False,
) -> Dict[str, jnp.ndarray]:
    """The per-clip unit of work (SURVEY.md §3.4).

    batch keys: text_input_ids (B, Lt), text_input_mask (B, Lt),
    visual_inputs (B_v, T, H, W, 3) with B == B_v * group_size; plus
    head-specific labels. ``visual_features`` short-circuits the CNN with
    precomputed grid features — used by retrieval eval to encode each video
    clip once and reuse it across all 1000 captions (beats the reference's
    per-text-minibatch CNN recompute, run_video_retrieval.py:640-666).
    """
    rngs = rngs or RngGen(None)
    if visual_features is None:
        visual_features = cnn_forward(params["cnn"], batch["visual_inputs"],
                                      compute_dtype, stride_in_1x1,
                                      remat=remat)
    visual_features = repeat_for_texts(visual_features, group_size)

    tp = params["transformer"]
    hidden, pooled = base_forward(
        tp["bert"], cfg, batch["text_input_ids"], batch["text_input_mask"],
        visual_features, compute_dtype, rngs, train, remat=remat,
        unroll=unroll, fused_attn=fused_attn)

    out: Dict[str, jnp.ndarray] = {}
    if head_type == "pretrain":
        txt_len = batch["text_input_mask"].shape[1]
        # text-only slice into the MLM head, like modeling.py:283-285
        out["mlm_scores"] = bert.mlm_logits(
            tp["cls"], tp["bert"]["embeddings"]["word_embeddings"],
            hidden[:, :txt_len], cfg)
        out["itm_scores"] = bert.itm_logits(tp["cls"], pooled)
    elif head_type in ("seq_cls", "retrieval", "multi_choice"):
        pooled = dropout(pooled, cfg.hidden_dropout_prob,
                         rngs("head_dropout") if train else None)
        out["logits"] = mlp_head(tp["classifier"], pooled)
    elif head_type == "regression":
        rp = tp["regressor"]
        h = dropout(pooled, cfg.hidden_dropout_prob,
                    rngs("head_dropout") if train else None)
        h = jax.nn.elu(linear(h, rp["fc1"]).astype(jnp.float32))
        # BatchNorm1d: batch stats in train, stored running stats in eval
        if train:
            mean = jnp.mean(h, axis=0)
            var = jnp.var(h, axis=0)
        else:
            mean, var = rp["bn"]["mean"], rp["bn"]["var"]
        h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
        h = h * rp["bn"]["scale"] + rp["bn"]["bias"]
        h = dropout(h, cfg.hidden_dropout_prob,
                    rngs("reg_dropout") if train else None)
        out["logits"] = linear(h.astype(compute_dtype), rp["fc2"]).astype(jnp.float32)
    else:
        raise ValueError(f"unknown head type {head_type}")
    out["pooled_output"] = pooled
    return out


# ---------------------------------------------------------------------------
# losses (per-element, mirroring the reference's reduction="none")
# ---------------------------------------------------------------------------

def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  ignore_index: Optional[int] = None) -> jnp.ndarray:
    """Per-element CE. With ignore_index, ignored positions contribute 0
    (matching torch CrossEntropyLoss(reduction='none'))."""
    logits = logits.astype(jnp.float32)
    if ignore_index is not None:
        valid = labels != ignore_index
        safe = jnp.where(valid, labels, 0)
    else:
        valid = None
        safe = labels
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if valid is not None:
        nll = jnp.where(valid, nll, 0.0)
    return nll


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Per-element binary CE with logits (modeling.py:310-316 uses the torch
    equivalent with reduction='none')."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    return (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def mse(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.square(logits.astype(jnp.float32).reshape(-1)
                      - labels.astype(jnp.float32).reshape(-1))


def classification_loss(cfg: ModelConfig, logits: jnp.ndarray,
                        labels: jnp.ndarray) -> jnp.ndarray:
    """SequenceClassification.calc_loss (modeling.py:364-384), per-element."""
    if cfg.num_labels == 1:
        return mse(logits, labels)
    if cfg.loss_type == "bce":
        return bce_with_logits(logits, labels)
    if cfg.loss_type == "ce":
        return cross_entropy(logits.reshape(-1, cfg.num_labels),
                             labels.reshape(-1))
    raise ValueError(f"invalid loss_type {cfg.loss_type}")


def retrieval_rank_loss(logits: jnp.ndarray, sample_size: int,
                        margin: float) -> jnp.ndarray:
    """Margin triplet loss over sigmoid scores viewed as (sample_size, -1)
    with column 0 positive (modeling.py:567-575 — note the reference's own
    'wrong!' comment pins the (sample_size, -1) view)."""
    scores = jax.nn.sigmoid(logits.astype(jnp.float32).reshape(-1))
    scores = scores.reshape(sample_size, -1)
    pos = scores[:, :1]
    neg = scores[:, 1:]
    return jnp.maximum(margin + neg - pos, 0.0)


def pretrain_losses(cfg: ModelConfig, out: Dict[str, jnp.ndarray],
                    mlm_labels: Optional[jnp.ndarray],
                    itm_labels: Optional[jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """MLM + ITM per-element losses (modeling.py:287-298). mlm_labels uses
    -100 for ignored positions; like the torch code, ignored positions yield
    0 loss and still count in the mean taken by the step fn."""
    losses = {}
    if mlm_labels is not None:
        losses["mlm_loss"] = cross_entropy(
            out["mlm_scores"].reshape(-1, cfg.vocab_size),
            mlm_labels.reshape(-1), ignore_index=-100)
    if itm_labels is not None:
        losses["itm_loss"] = cross_entropy(out["itm_scores"].reshape(-1, 2),
                                           itm_labels.reshape(-1))
    return losses

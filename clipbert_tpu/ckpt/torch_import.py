"""PyTorch-checkpoint importers.

Converts reference-world checkpoints into our param pytrees for parity
testing and warm starts, covering the reference's three init-time load paths
(`/root/reference/src/utils/load_save.py:71-100`, `e2e_model.py:41-46`,
`grid_feat.py:72-80`):

 - HF/ClipBERT BERT state_dicts  -> transformer params
 - ClipBERT e2e `model_step_N.pt` -> full model params
 - torchvision / detectron2 ResNet-50 -> cnn backbone params

All functions take a flat {name: numpy array} dict, so callers can feed
`{k: v.numpy() for k, v in torch.load(p).items()}` without this module
importing torch.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from clipbert_tpu.core.config import ModelConfig


def _dense(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """torch Linear (out,in) -> our (in,out) kernel + bias."""
    p = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _ln(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out


def import_bert_text_embeddings(sd: Dict[str, np.ndarray]) -> Dict:
    """Keys rooted at `embeddings.` (reference transformers.py:151-170)."""
    return {
        "word_embeddings": sd["embeddings.word_embeddings.weight"],
        "position_embeddings": sd["embeddings.position_embeddings.weight"],
        "token_type_embeddings": sd["embeddings.token_type_embeddings.weight"],
        "ln": _ln(sd, "embeddings.LayerNorm"),
    }


def import_bert_encoder(sd: Dict[str, np.ndarray], num_layers: int) -> Dict:
    """Keys rooted at `encoder.layer.{i}.` -> stacked-layer pytree."""
    def layer(i: int) -> Dict:
        pre = f"encoder.layer.{i}"
        return {
            "attention": {
                "self": {
                    "query": _dense(sd, f"{pre}.attention.self.query"),
                    "key": _dense(sd, f"{pre}.attention.self.key"),
                    "value": _dense(sd, f"{pre}.attention.self.value"),
                },
                "output": {
                    "dense": _dense(sd, f"{pre}.attention.output.dense"),
                    "ln": _ln(sd, f"{pre}.attention.output.LayerNorm"),
                },
            },
            "intermediate": {"dense": _dense(sd, f"{pre}.intermediate.dense")},
            "output": {"dense": _dense(sd, f"{pre}.output.dense"),
                       "ln": _ln(sd, f"{pre}.output.LayerNorm")},
        }

    layers = [layer(i) for i in range(num_layers)]
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs), *layers)


def import_bert_pooler(sd: Dict[str, np.ndarray]) -> Dict:
    return {"dense": _dense(sd, "pooler.dense")}


def import_pretraining_heads(sd: Dict[str, np.ndarray]) -> Dict:
    """Keys rooted at `cls.` (reference BertPreTrainingHeads)."""
    return {
        "predictions": {
            "transform": {
                "dense": _dense(sd, "cls.predictions.transform.dense"),
                "ln": _ln(sd, "cls.predictions.transform.LayerNorm"),
            },
            "bias": sd["cls.predictions.bias"],
        },
        "seq_relationship": _dense(sd, "cls.seq_relationship"),
    }


def import_visual_embeddings(sd: Dict[str, np.ndarray]) -> Dict:
    """Keys rooted at `visual_embeddings.` (reference modeling.py:40-60)."""
    return {
        "position_embeddings": sd["visual_embeddings.position_embeddings.weight"],
        "row_position_embeddings":
            sd["visual_embeddings.row_position_embeddings.weight"],
        "col_position_embeddings":
            sd["visual_embeddings.col_position_embeddings.weight"],
        "token_type_embeddings":
            sd["visual_embeddings.token_type_embeddings.weight"],
        "ln": _ln(sd, "visual_embeddings.LayerNorm"),
    }


def import_clipbert_base(sd: Dict[str, np.ndarray], cfg: ModelConfig) -> Dict:
    """A ClipBertBaseModel state_dict (keys rooted at its own level:
    embeddings./visual_embeddings./encoder./pooler.)."""
    return {
        "embeddings": import_bert_text_embeddings(sd),
        "visual_embeddings": import_visual_embeddings(sd),
        "encoder": import_bert_encoder(sd, cfg.num_hidden_layers),
        "pooler": import_bert_pooler(sd),
    }


def import_mlp_head(sd: Dict[str, np.ndarray], prefix: str = "classifier") -> Dict:
    """2-layer MLP head stored as nn.Sequential: {prefix}.0 / {prefix}.2
    (reference modeling.py:338-343)."""
    return {"fc1": _dense(sd, f"{prefix}.0"), "fc2": _dense(sd, f"{prefix}.2")}

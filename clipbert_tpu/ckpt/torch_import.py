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

from typing import Dict

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


# ---------------------------------------------------------------------------
# ResNet-50 backbone importers
# ---------------------------------------------------------------------------

BN_EPS = 1e-5  # torch BatchNorm2d / detectron2 FrozenBatchNorm2d default


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv (O, I, kh, kw) -> our HWIO (kh, kw, I, O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _fold_bn(sd: Dict[str, np.ndarray], prefix: str,
             weight_key: str = "weight", bias_key: str = "bias",
             mean_key: str = "running_mean", var_key: str = "running_var",
             eps: float = BN_EPS) -> Dict[str, np.ndarray]:
    """BatchNorm (gamma, beta, mean, var) -> frozen (scale, bias) pair."""
    gamma = sd[f"{prefix}.{weight_key}"].astype(np.float64)
    beta = sd[f"{prefix}.{bias_key}"].astype(np.float64)
    mean = sd[f"{prefix}.{mean_key}"].astype(np.float64)
    var = sd[f"{prefix}.{var_key}"].astype(np.float64)
    scale = gamma / np.sqrt(var + eps)
    bias = beta - mean * scale
    return {"scale": scale.astype(np.float32), "bias": bias.astype(np.float32)}


def _flip_rgb_to_bgr_stem(kernel_hwio: np.ndarray) -> np.ndarray:
    """Fold the reference's runtime RGB->BGR channel flip
    (grid_feat.py:92-94) into the stem conv's input-channel axis, so a
    BGR-expecting (caffe-style) checkpoint consumes RGB input directly."""
    return kernel_hwio[:, :, ::-1, :].copy()


def import_resnet50_torchvision(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision resnet50 state_dict -> our params (stride_in_1x1=False).

    Key scheme: conv1/bn1, layer{1..4}.{i}.conv{1..3}/bn{1..3},
    layer{k}.0.downsample.{0,1}. (The reference documents this scheme in its
    torchvision->d2 renamer, load_save.py:315-363.)
    """
    p: Dict = {"stem": {"conv": {"kernel": _conv_kernel(sd["conv1.weight"])},
                        "bn": _fold_bn(sd, "bn1")}}
    from clipbert_tpu.models.resnet import R50_STAGES
    for si, (n, _, _) in enumerate(R50_STAGES):
        blocks = []
        for bi in range(n):
            pre = f"layer{si + 1}.{bi}"
            b = {f"conv{j}": {"kernel": _conv_kernel(sd[f"{pre}.conv{j}.weight"]),
                              "bn": _fold_bn(sd, f"{pre}.bn{j}")}
                 for j in (1, 2, 3)}
            if f"{pre}.downsample.0.weight" in sd:
                b["shortcut"] = {
                    "kernel": _conv_kernel(sd[f"{pre}.downsample.0.weight"]),
                    "bn": _fold_bn(sd, f"{pre}.downsample.1")}
            blocks.append(b)
        p[f"res{si + 2}"] = blocks
    return p


def import_resnet50_d2(sd: Dict[str, np.ndarray],
                       bgr_checkpoint: bool = True) -> Dict:
    """detectron2 grid-feats checkpoint -> our params (stride_in_1x1=True).

    Key scheme: stem.conv1 + stem.conv1.norm (or backbone.stem...),
    res{2..4}.{i}.conv{1..3}(.norm), shortcut(.norm); res5 may live under
    roi_heads.res5 in grid-feats checkpoints (grid_feats/roi_heads.py:164).
    With ``bgr_checkpoint`` the stem input channels are flipped so the model
    takes RGB input with the BGR-trained weights.
    """
    # normalize prefixes: strip "model."/"feature."/"backbone." (the e2e
    # wrapper stores the d2 model as `cnn.feature`, grid_feat.py:42) and map
    # roi_heads.res5 -> res5 (the Res5ROIHeads variant keeps res5 there)
    norm: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        k = k.removeprefix("model.").removeprefix("feature.")
        k = k.removeprefix("backbone.")
        k = k.replace("roi_heads.res5", "res5")
        norm[k] = v
    sd = norm

    stem_kernel = _conv_kernel(sd["stem.conv1.weight"])
    if bgr_checkpoint:
        stem_kernel = _flip_rgb_to_bgr_stem(stem_kernel)
    p: Dict = {"stem": {"conv": {"kernel": stem_kernel},
                        "bn": _fold_bn(sd, "stem.conv1.norm")}}
    from clipbert_tpu.models.resnet import R50_STAGES
    for si, (n, _, _) in enumerate(R50_STAGES):
        blocks = []
        for bi in range(n):
            pre = f"res{si + 2}.{bi}"
            b = {f"conv{j}": {"kernel": _conv_kernel(sd[f"{pre}.conv{j}.weight"]),
                              "bn": _fold_bn(sd, f"{pre}.conv{j}.norm")}
                 for j in (1, 2, 3)}
            if f"{pre}.shortcut.weight" in sd:
                b["shortcut"] = {
                    "kernel": _conv_kernel(sd[f"{pre}.shortcut.weight"]),
                    "bn": _fold_bn(sd, f"{pre}.shortcut.norm")}
            blocks.append(b)
        p[f"res{si + 2}"] = blocks
    return p


def import_grid_encoder(sd: Dict[str, np.ndarray],
                        prefix: str = "grid_encoder") -> Dict:
    """grid_encoder nn.Sequential: {prefix}.0 = conv3x3 (grid_feat.py:43-48)."""
    return {"conv": {"kernel": _conv_kernel(sd[f"{prefix}.0.weight"])}}


# ---------------------------------------------------------------------------
# TF-1 BERT checkpoints (the reference's load_tf_weights_in_bert,
# /root/reference/src/modeling/transformers.py:64-137)
# ---------------------------------------------------------------------------

def tf_bert_to_torch_sd(tf_flat: Dict[str, np.ndarray]
                        ) -> Dict[str, np.ndarray]:
    """TF-1 BERT variable names/layouts -> torch-style state_dict.

    Pure renaming + the reference's layout rules (transformers.py:104-131):
    optimizer slots dropped, `kernel` (in,out) transposed to torch (out,in),
    gamma/beta -> weight/bias, `output_{weights,bias}` -> weight/bias,
    embedding tables get a `.weight` suffix. The result feeds the same
    import_bert_* functions as a torch checkpoint, so both paths share one
    tested structure mapping.
    """
    out = {}
    for name, arr in tf_flat.items():
        if any(s in name for s in
               ("adam_v", "adam_m", "AdamWeightDecayOptimizer", "global_step",
                "LAMB", "bad_steps", "loss_scale", "good_steps")):
            continue                         # transformers.py:94-101
        n = name
        if n.startswith("bert/"):
            n = n[len("bert/"):]
        n = n.replace("layer_", "layer.").replace("/", ".")
        n = n.replace(".gamma", ".weight").replace(".beta", ".bias")
        if n.endswith(".kernel"):
            n = n[:-len("kernel")] + "weight"
            arr = np.ascontiguousarray(np.asarray(arr).T)
        elif n.endswith(".output_weights"):  # cls.seq_relationship: (2, D)
            n = n[:-len("output_weights")] + "weight"
        elif n.endswith(".output_bias"):
            n = n[:-len("output_bias")] + "bias"
        elif n.endswith(("word_embeddings", "position_embeddings",
                         "token_type_embeddings")):
            n = n + ".weight"
        out[n] = np.asarray(arr)
    return out


def load_tf_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read every variable of a TF checkpoint (needs tensorflow, like the
    reference path, transformers.py:79-84)."""
    import tensorflow as tf  # gated: only TF-checkpoint users need it
    reader = tf.train.load_checkpoint(path)
    return {name: reader.get_tensor(name)
            for name in reader.get_variable_to_shape_map()}


def import_bert_tf(path_or_flat, num_layers: int) -> Dict:
    """TF-1 BERT checkpoint -> our {embeddings, encoder, pooler[, cls]}
    pytree (the reference's `from_tf=True` load path)."""
    flat = (path_or_flat if isinstance(path_or_flat, dict)
            else load_tf_checkpoint(path_or_flat))
    sd = tf_bert_to_torch_sd(flat)
    out = {
        "embeddings": import_bert_text_embeddings(sd),
        "encoder": import_bert_encoder(sd, num_layers),
        "pooler": import_bert_pooler(sd),
    }
    if "cls.predictions.bias" in sd:
        out["cls"] = import_pretraining_heads(sd)
    return out

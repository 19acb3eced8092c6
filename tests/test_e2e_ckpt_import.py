"""Reference e2e checkpoint import: a synthetic state_dict in the exact
reference key scheme (`cnn.feature.backbone...`, `transformer.bert...`,
e2e_model.py:13-27 + grid_feat.py:37-48 + detectron2 naming) imports into
our pytree with zero missing/mismatched leaves."""

import numpy as np

import jax

from clipbert_tpu.ckpt import checkpoint
from clipbert_tpu.core.config import ModelConfig
from clipbert_tpu.models import clipbert
from clipbert_tpu.train.trainer import import_torch_e2e

R50 = [("res2", 3, 64, 64, 256), ("res3", 4, 256, 128, 512),
       ("res4", 6, 512, 256, 1024), ("res5", 3, 1024, 512, 2048)]


def synth_reference_e2e_sd(cfg: ModelConfig, rng) -> dict:
    sd = {}

    def conv(name, o, i, kh, kw, norm=True):
        sd[f"{name}.weight"] = rng.standard_normal((o, i, kh, kw)).astype(
            np.float32) * 0.05
        if norm:
            sd[f"{name}.norm.weight"] = np.ones(o, np.float32)
            sd[f"{name}.norm.bias"] = np.zeros(o, np.float32)
            sd[f"{name}.norm.running_mean"] = rng.standard_normal(o).astype(
                np.float32) * 0.1
            sd[f"{name}.norm.running_var"] = np.abs(
                rng.standard_normal(o)).astype(np.float32) + 0.5

    bk = "cnn.feature.backbone"
    conv(f"{bk}.stem.conv1", 64, 3, 7, 7)
    for stage, n, cin, cmid, cout in R50:
        for b in range(n):
            pre = f"{bk}.{stage}.{b}"
            conv(f"{pre}.conv1", cmid, cin if b == 0 else cout, 1, 1)
            conv(f"{pre}.conv2", cmid, cmid, 3, 3)
            conv(f"{pre}.conv3", cout, cmid, 1, 1)
            if b == 0:
                conv(f"{pre}.shortcut", cout, cin, 1, 1)
    sd["cnn.grid_encoder.0.weight"] = rng.standard_normal(
        (cfg.hidden_size, cfg.backbone_channel_in_size, 3, 3)).astype(
            np.float32) * 0.02

    D, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size

    def dense(name, o, i):
        sd[f"{name}.weight"] = rng.standard_normal((o, i)).astype(
            np.float32) * 0.02
        sd[f"{name}.bias"] = np.zeros(o, np.float32)

    def ln(name, d):
        sd[f"{name}.weight"] = np.ones(d, np.float32)
        sd[f"{name}.bias"] = np.zeros(d, np.float32)

    tb = "transformer.bert"
    sd[f"{tb}.embeddings.word_embeddings.weight"] = rng.standard_normal(
        (V, D)).astype(np.float32) * 0.02
    sd[f"{tb}.embeddings.position_embeddings.weight"] = rng.standard_normal(
        (cfg.max_position_embeddings, D)).astype(np.float32) * 0.02
    sd[f"{tb}.embeddings.token_type_embeddings.weight"] = rng.standard_normal(
        (cfg.type_vocab_size, D)).astype(np.float32) * 0.02
    ln(f"{tb}.embeddings.LayerNorm", D)
    ve = f"{tb}.visual_embeddings"
    sd[f"{ve}.position_embeddings.weight"] = rng.standard_normal(
        (cfg.max_position_embeddings, D)).astype(np.float32) * 0.02
    sd[f"{ve}.row_position_embeddings.weight"] = rng.standard_normal(
        (cfg.max_grid_row_position_embeddings, D)).astype(np.float32) * 0.02
    sd[f"{ve}.col_position_embeddings.weight"] = rng.standard_normal(
        (cfg.max_grid_col_position_embeddings, D)).astype(np.float32) * 0.02
    sd[f"{ve}.token_type_embeddings.weight"] = rng.standard_normal(
        (1, D)).astype(np.float32) * 0.02
    ln(f"{ve}.LayerNorm", D)
    for l in range(cfg.num_hidden_layers):
        pre = f"{tb}.encoder.layer.{l}"
        for q in ("query", "key", "value"):
            dense(f"{pre}.attention.self.{q}", D, D)
        dense(f"{pre}.attention.output.dense", D, D)
        ln(f"{pre}.attention.output.LayerNorm", D)
        dense(f"{pre}.intermediate.dense", I, D)
        dense(f"{pre}.output.dense", D, I)
        ln(f"{pre}.output.LayerNorm", D)
    dense(f"{tb}.pooler.dense", D, D)
    dense("transformer.classifier.0", D * cfg.cls_hidden_scale, D)
    dense("transformer.classifier.2", cfg.num_labels,
          D * cfg.cls_hidden_scale)
    return sd


def test_reference_e2e_state_dict_imports_cleanly(rng_np):
    cfg = ModelConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=64,
                      max_grid_row_position_embeddings=4,
                      max_grid_col_position_embeddings=4, num_labels=2)
    sd = synth_reference_e2e_sd(cfg, rng_np)
    imported = import_torch_e2e(sd, cfg, "retrieval")

    target = clipbert.init_clipbert(jax.random.key(0), cfg, "retrieval")
    merged, report = checkpoint.load_with_mismatch(
        target, checkpoint.flatten_tree(imported))
    assert report["mismatched"] == [], report["mismatched"]
    # only the (torch-buffer-free) sequence position table may be missing
    assert report["missing"] == [], report["missing"][:10]

    # BN got folded: imported scale = gamma/sqrt(var+eps)
    got = np.asarray(merged["cnn"]["resnet"]["stem"]["bn"]["scale"])
    var = sd["cnn.feature.backbone.stem.conv1.norm.running_var"]
    np.testing.assert_allclose(got, 1.0 / np.sqrt(var + 1e-5), rtol=1e-5)

    # the BGR->RGB fold flipped the stem input channels
    w = sd["cnn.feature.backbone.stem.conv1.weight"]  # (O, 3, 7, 7) BGR
    stem = np.asarray(merged["cnn"]["resnet"]["stem"]["conv"]["kernel"])
    np.testing.assert_allclose(stem[:, :, 0, :],
                               np.transpose(w, (2, 3, 1, 0))[:, :, 2, :])

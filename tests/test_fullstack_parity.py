"""FULL-STACK logit parity: pixels -> R50 -> grid encoder -> visual embed ->
joint BERT -> head, torch vs ours, through the real e2e checkpoint importer.

The torch side restates the complete reference model from live pieces:
the golden R50 (test_resnet_parity.TorchR50, d2/caffe stride_in_1x1 + BGR),
the grid encoder (grid_feat.py:37-48), a verbatim VisualInputEmbedding
(`/root/reference/src/modeling/modeling.py:40-101`: temporal mean-pool +
row/col 2D position embeddings + token type + LayerNorm), HF BertModel for
the text embeddings / joint encoder / pooler (the reference vendors HF BERT,
transformers.py), the (1-mask)*-10000 extended mask (modeling.py:201-238)
and the 2-layer MLP head (modeling.py:338-343). Weights are exported in the
reference `model_step_N.pt` key scheme (e2e_model.py:13-27) and imported
with `import_torch_e2e`, so this also proves the released-checkpoint path
end-to-end (BGR stem fold + BN fold + every key mapping) on executable
weights, not just key-scheme round-trips.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clipbert_tpu.core.config import ModelConfig
from clipbert_tpu.models import clipbert
from clipbert_tpu.train.trainer import import_torch_e2e

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
nn = torch.nn

from test_resnet_parity import TorchR50, _randomize_bn  # noqa: E402

CFG = ModelConfig(
    vocab_size=131, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64,
    max_position_embeddings=48, type_vocab_size=2,
    max_grid_row_position_embeddings=4, max_grid_col_position_embeddings=4,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    num_labels=2, loss_type="ce", backbone_channel_in_size=2048,
)

TV2D2 = {"layer1": "res2", "layer2": "res3", "layer3": "res4",
         "layer4": "res5", "bn1": "conv1.norm", "bn2": "conv2.norm",
         "bn3": "conv3.norm", "downsample.0": "shortcut",
         "downsample.1": "shortcut.norm"}


class TorchVisualEmbed(nn.Module):
    """VisualInputEmbedding forward restated (modeling.py:40-101; the
    sequence position_embeddings table exists but is unused in forward)."""

    def __init__(self, cfg: ModelConfig):
        super().__init__()
        D = cfg.hidden_size
        self.position_embeddings = nn.Embedding(
            cfg.max_position_embeddings, D)
        self.row_position_embeddings = nn.Embedding(
            cfg.max_grid_row_position_embeddings, D)
        self.col_position_embeddings = nn.Embedding(
            cfg.max_grid_col_position_embeddings, D)
        self.token_type_embeddings = nn.Embedding(1, D)
        self.LayerNorm = nn.LayerNorm(D, eps=cfg.layer_norm_eps)

    def forward(self, grid):                     # (B, T, H, W, D)
        g = grid.mean(1)                         # temporal mean pool (:73)
        H, W = g.shape[1:3]
        g = g + self.row_position_embeddings.weight[:H][None, :, None, :]
        g = g + self.col_position_embeddings.weight[:W][None, None, :, :]
        tokens = g.reshape(g.shape[0], H * W, -1)     # (:76)
        tokens = tokens + self.token_type_embeddings.weight[0][None, None]
        return self.LayerNorm(tokens)            # (:93-100, eval: no dropout)


@pytest.fixture(scope="module")
def torch_stack():
    torch.manual_seed(7)
    r50 = TorchR50(stride_in_1x1=True)
    _randomize_bn(r50)
    genc = nn.Sequential(
        nn.Conv2d(2048, CFG.hidden_size, 3, stride=1, padding=1, bias=False),
        nn.MaxPool2d(2, stride=2), nn.ReLU())
    vemb = TorchVisualEmbed(CFG)
    hf_cfg = transformers.BertConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        intermediate_size=CFG.intermediate_size,
        max_position_embeddings=CFG.max_position_embeddings,
        type_vocab_size=CFG.type_vocab_size, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=CFG.layer_norm_eps,
        pad_token_id=CFG.pad_token_id, attn_implementation="eager")
    bm = transformers.BertModel(hf_cfg)
    clf = nn.Sequential(
        nn.Linear(CFG.hidden_size, CFG.hidden_size * CFG.cls_hidden_scale),
        nn.ReLU(),
        nn.Linear(CFG.hidden_size * CFG.cls_hidden_scale, CFG.num_labels))
    for m in (r50, genc, vemb, bm, clf):
        m.eval()
    return r50, genc, vemb, bm, clf


def export_reference_sd(r50, genc, vemb, bm, clf):
    """state_dict in the reference e2e key scheme (e2e_model.py:13-27)."""
    sd = {}
    for k, v in r50.state_dict().items():
        for old, new in TV2D2.items():
            k = k.replace(old, new)
        if not k.startswith("res"):
            k = f"stem.{k}"
        sd[f"cnn.feature.backbone.{k}"] = v.detach().numpy()
    for k, v in genc.state_dict().items():
        sd[f"cnn.grid_encoder.{k}"] = v.detach().numpy()
    for k, v in vemb.state_dict().items():
        sd[f"transformer.bert.visual_embeddings.{k}"] = v.detach().numpy()
    for k, v in bm.state_dict().items():
        sd[f"transformer.bert.{k}"] = v.detach().numpy()
    for k, v in clf.state_dict().items():
        sd[f"transformer.classifier.{k}"] = v.detach().numpy()
    return sd


def torch_full_forward(stack, pixels_rgb, ids, mask, group_size):
    """The complete reference eval forward (e2e_model.py:29-38 +
    modeling.py:201-238). Consumes BGR like a caffe-d2 checkpoint."""
    r50, genc, vemb, bm, clf = stack
    with torch.no_grad():
        px = torch.tensor(
            np.ascontiguousarray(pixels_rgb[..., ::-1]))       # RGB -> BGR
        B, T = px.shape[:2]
        x = px.reshape(B * T, *px.shape[2:]).permute(0, 3, 1, 2)
        feat = genc(r50(x))                                    # (B*T, D, h, w)
        D = feat.shape[1]
        feat = feat.permute(0, 2, 3, 1).reshape(
            B, T, feat.shape[2], feat.shape[3], D)
        vis = vemb(feat)                                       # (B, Lv, D)
        vis = vis.repeat_interleave(group_size, dim=0)
        tids = torch.tensor(ids)
        txt = bm.embeddings(input_ids=tids)
        hidden = torch.cat([txt, vis], dim=1)
        full_mask = torch.cat(
            [torch.tensor(mask).float(),
             torch.ones(vis.shape[0], vis.shape[1])], dim=1)
        ext = (1.0 - full_mask)[:, None, None, :] * -10000.0
        enc = bm.encoder(hidden, attention_mask=ext).last_hidden_state
        pooled = bm.pooler(enc)
        return clf(pooled).numpy()


def test_fullstack_logits_match_torch(torch_stack):
    sd = export_reference_sd(*torch_stack)
    params = jax.tree.map(jnp.asarray, import_torch_e2e(sd, CFG, "retrieval"))

    rng = np.random.default_rng(11)
    B_v, T, G, Lt = 2, 2, 2, 10
    pixels = rng.normal(0, 1, (B_v, T, 128, 128, 3)).astype(np.float32)
    ids = rng.integers(1, CFG.vocab_size, (B_v * G, Lt)).astype(np.int32)
    mask = np.ones((B_v * G, Lt), np.int32)
    mask[:, 7:] = 0                       # padded text tail exercises the bias

    ref = torch_full_forward(torch_stack, pixels, ids, mask, G)

    batch = {"visual_inputs": jnp.asarray(pixels),
             "text_input_ids": jnp.asarray(ids),
             "text_input_mask": jnp.asarray(mask)}
    out = clipbert.clipbert_forward(params, CFG, batch, "retrieval",
                                    compute_dtype=jnp.float32,
                                    group_size=G)
    got = np.asarray(out["logits"])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-3)


def test_fullstack_pretrain_heads_match_torch(torch_stack):
    """MLM + ITM heads on the same joint stack (modeling.py:241-307):
    prediction head transform + decoder tied to word embeddings + seq_rel."""
    r50, genc, vemb, bm, clf = torch_stack
    torch.manual_seed(13)
    D = CFG.hidden_size

    class Heads(nn.Module):
        def __init__(self):
            super().__init__()
            self.dense = nn.Linear(D, D)
            self.LayerNorm = nn.LayerNorm(D, eps=CFG.layer_norm_eps)
            self.decoder = nn.Linear(D, CFG.vocab_size)
            self.seq_relationship = nn.Linear(D, 2)

        def forward(self, seq, pooled):
            h = torch.nn.functional.gelu(self.dense(seq))
            h = self.LayerNorm(h)
            return self.decoder(h), self.seq_relationship(pooled)

    heads = Heads().eval()
    # tie decoder to word embeddings, as BertLMPredictionHead does
    with torch.no_grad():
        heads.decoder.weight.copy_(bm.embeddings.word_embeddings.weight)

    sd = export_reference_sd(r50, genc, vemb, bm, clf)
    hp = "transformer.cls.predictions"
    hsd = heads.state_dict()
    sd[f"{hp}.transform.dense.weight"] = hsd["dense.weight"].numpy()
    sd[f"{hp}.transform.dense.bias"] = hsd["dense.bias"].numpy()
    sd[f"{hp}.transform.LayerNorm.weight"] = hsd["LayerNorm.weight"].numpy()
    sd[f"{hp}.transform.LayerNorm.bias"] = hsd["LayerNorm.bias"].numpy()
    sd[f"{hp}.bias"] = hsd["decoder.bias"].numpy()
    sd["transformer.cls.seq_relationship.weight"] = \
        hsd["seq_relationship.weight"].numpy()
    sd["transformer.cls.seq_relationship.bias"] = \
        hsd["seq_relationship.bias"].numpy()
    params = jax.tree.map(jnp.asarray, import_torch_e2e(sd, CFG, "pretrain"))

    rng = np.random.default_rng(17)
    B_v, T, Lt = 2, 1, 8
    pixels = rng.normal(0, 1, (B_v, T, 128, 128, 3)).astype(np.float32)
    ids = rng.integers(1, CFG.vocab_size, (B_v, Lt)).astype(np.int32)
    mask = np.ones((B_v, Lt), np.int32)

    # torch side: joint stack then heads on the text slice / pooled
    with torch.no_grad():
        px = torch.tensor(np.ascontiguousarray(pixels[..., ::-1]))
        x = px.reshape(B_v * T, *px.shape[2:]).permute(0, 3, 1, 2)
        feat = genc(r50(x))
        feat = feat.permute(0, 2, 3, 1).reshape(
            B_v, T, feat.shape[2], feat.shape[3], D)
        vis = vemb(feat)
        txt = bm.embeddings(input_ids=torch.tensor(ids))
        hidden = torch.cat([txt, vis], dim=1)
        full_mask = torch.cat([torch.tensor(mask).float(),
                               torch.ones(B_v, vis.shape[1])], dim=1)
        ext = (1.0 - full_mask)[:, None, None, :] * -10000.0
        enc = bm.encoder(hidden, attention_mask=ext).last_hidden_state
        pooled = bm.pooler(enc)
        mlm_ref, itm_ref = heads(enc[:, :Lt], pooled)
        mlm_ref, itm_ref = mlm_ref.numpy(), itm_ref.numpy()

    batch = {"visual_inputs": jnp.asarray(pixels),
             "text_input_ids": jnp.asarray(ids),
             "text_input_mask": jnp.asarray(mask)}
    out = clipbert.clipbert_forward(params, CFG, batch, "pretrain",
                                    compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out["mlm_scores"]), mlm_ref,
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["itm_scores"]), itm_ref,
                               rtol=1e-3, atol=2e-3)

"""TRAINING-DYNAMICS parity: a 3-step joint e2e training run, torch vs ours.

The strongest offline proxy for released-checkpoint quality parity: the
fullstack test pins single-forward logits; this pins the *integration* —
MIL clip loop + LSE loss (run_video_retrieval.py:396-421), reference AdamW
(`/root/reference/src/optimization/adamw.py:60-101`: decoupled weight decay
applied to the POST-update param, bias correction), the 8-group optimizer
split with separate cnn/transformer LRs + a grid_encoder lr_mul
(optimization/utils.py:96-161), warmup-linear schedule evaluated at the
post-increment step (run_video_qa.py:515-546), zero_none_grad
(misc.py:28-31) and global-norm grad clipping — run jointly for 3 steps
from identical init on identical batches, asserting per-step losses and
post-training logits match at fp32 tolerance.

The torch twin below RESTATES those semantics from the documented behavior
(it is not reference code): frozen BN params excluded from the optimizer
(FrozenBatchNorm2d buffers never train), None grads zeroed, HF-style AdamW
with wd after the update.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clipbert_tpu.models import clipbert
from clipbert_tpu.train import steps
from clipbert_tpu.train.optim import OptimConfig, build_group_meta
from clipbert_tpu.train.trainer import import_torch_e2e

torch = pytest.importorskip("torch")
nn = torch.nn

from test_fullstack_parity import (CFG, TorchVisualEmbed,  # noqa: E402
                                   export_reference_sd, torch_full_forward)
from test_fullstack_parity import torch_stack  # noqa: E402,F401 (fixture)

B_V, NC, NF, G, LT = 2, 2, 1, 2, 8
IMG = 96
N_STEPS = 3
LR, CNN_LR = 1e-3, 2e-3
WD, CNN_WD = 0.01, 0.05
CNN_LR_MUL = 2.0
GRAD_NORM = 2.0
NUM_TRAIN_STEPS, WARMUP_RATIO = 20, 0.1
BETAS, EPS = (0.9, 0.98), 1e-6


def make_batches(rng):
    """N_STEPS identical-on-both-sides synthetic retrieval batches."""
    batches = []
    for _ in range(N_STEPS + 1):            # +1 held-out eval batch
        pixels = rng.normal(0, 1, (B_V, NC * NF, IMG, IMG, 3)).astype(
            np.float32)
        ids = rng.integers(1, CFG.vocab_size, (B_V * G, LT)).astype(np.int32)
        mask = np.ones((B_V * G, LT), np.int32)
        mask[:, 6:] = 0
        labels = np.tile([1, 0], B_V).astype(np.int32)  # pos, neg per group
        batches.append({"visual_inputs": pixels, "text_input_ids": ids,
                        "text_input_mask": mask, "labels": labels})
    return batches


def warmup_linear_lr(step, base):
    """get_lr_sched linear decay restated (reference sched.py:14-17,44-46)."""
    warm = max(int(WARMUP_RATIO * NUM_TRAIN_STEPS), 1)
    if step < warm:
        f = step / warm
    else:
        f = max(0.0, (NUM_TRAIN_STEPS - step) / max(NUM_TRAIN_STEPS - warm, 1))
    return max(base * f, 1e-8)


def torch_param_groups(stack, tr_named=None):
    """The reference 8-group split restated (optimization/utils.py:96-161):
    {transformer, cnn} x {lr_mul prefix, rest} x {decay, no_decay}; frozen
    BN params excluded entirely (requires_grad False). ``tr_named``
    overrides the transformer-family param list (the pretrain twin swaps
    the classifier for the MLM/ITM heads)."""
    r50, genc, vemb, bm, clf = stack
    no_decay_keys = ("bias", "LayerNorm.weight", "LayerNorm.bias")

    def split(named, base_wd):
        dec, nodec = [], []
        for name, p in named:
            if not p.requires_grad:
                continue
            (nodec if any(name.endswith(k) for k in no_decay_keys)
             else dec).append(p)
        return [(dec, base_wd), (nodec, 0.0)]

    if tr_named is None:
        tr_named = (list(vemb.named_parameters())
                    + list(bm.named_parameters())
                    + [(f"classifier.{n}", p)
                       for n, p in clf.named_parameters()])
    genc_named = [(f"grid_encoder.{n}", p) for n, p in genc.named_parameters()]
    r50_named = list(r50.named_parameters())

    groups = []
    # transformer: no lr_mul prefix -> top groups empty (kept for the count)
    for params, wd in split([], WD) + split(tr_named, WD):
        groups.append((params, wd, "transformer", 1.0))
    # cnn: grid_encoder params are the lr_mul prefix group
    for params, wd in split(genc_named, CNN_WD):
        groups.append((params, wd, "cnn", CNN_LR_MUL))
    for params, wd in split(r50_named, CNN_WD):
        groups.append((params, wd, "cnn", 1.0))
    assert len(groups) == 8
    return groups


def ref_adamw_step(groups, opt_state, t, lr_t, lr_c):
    """Reference AdamW semantics restated (adamw.py:60-101): m/v moments,
    bias-corrected step size, decoupled weight decay applied to the
    post-update parameter."""
    b1, b2 = BETAS
    corr = math.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
    with torch.no_grad():
        for params, wd, fam, mul in groups:
            lr = (lr_c if fam == "cnn" else lr_t) * mul
            for p in params:
                g = p.grad
                st = opt_state.setdefault(
                    id(p), {"m": torch.zeros_like(p), "v": torch.zeros_like(p)})
                st["m"].mul_(b1).add_(g, alpha=1 - b1)
                st["v"].mul_(b2).addcmul_(g, g, value=1 - b2)
                p.addcdiv_(st["m"], st["v"].sqrt().add(EPS), value=-lr * corr)
                if wd > 0:
                    p.add_(p, alpha=-lr * wd)


def torch_mil_loss(stack, batch):
    """MIL clip loop + LSE loss (run_video_retrieval.py:392-418)."""
    pixels = batch["visual_inputs"].reshape(B_V, NC, NF, IMG, IMG, 3)
    clip_logits = []
    for c in range(NC):
        clip_logits.append(torch_train_forward(
            stack, pixels[:, c], batch["text_input_ids"],
            batch["text_input_mask"], G))
    logits = torch.stack(clip_logits, dim=1)             # (B_t, nc, 2)
    labels = torch.tensor(batch["labels"], dtype=torch.long)
    all_lse = torch.logsumexp(logits.reshape(logits.shape[0], -1), dim=-1)
    per_label = torch.logsumexp(logits, dim=1)           # (B_t, 2)
    return (all_lse - per_label.gather(1, labels[:, None])[:, 0]).mean()


def torch_train_forward(stack, pixels_rgb, ids, mask, group_size):
    """torch_full_forward without no_grad (gradients must flow e2e)."""
    r50, genc, vemb, bm, clf = stack
    px = torch.tensor(np.ascontiguousarray(pixels_rgb[..., ::-1]))
    B, T = px.shape[:2]
    x = px.reshape(B * T, *px.shape[2:]).permute(0, 3, 1, 2)
    feat = genc(r50(x))
    D = feat.shape[1]
    feat = feat.permute(0, 2, 3, 1).reshape(
        B, T, feat.shape[2], feat.shape[3], D)
    vis = vemb(feat)
    vis = vis.repeat_interleave(group_size, dim=0)
    txt = bm.embeddings(input_ids=torch.tensor(ids))
    hidden = torch.cat([txt, vis], dim=1)
    full_mask = torch.cat(
        [torch.tensor(mask).float(),
         torch.ones(vis.shape[0], vis.shape[1])], dim=1)
    ext = (1.0 - full_mask)[:, None, None, :] * -10000.0
    enc = bm.encoder(hidden, attention_mask=ext).last_hidden_state
    return clf(bm.pooler(enc))


def test_training_dynamics_match_torch(torch_stack):  # noqa: F811
    r50, genc, vemb, bm, clf = torch_stack
    # frozen BN: params are buffers in the reference (FrozenBatchNorm2d)
    for m in r50.modules():
        if isinstance(m, nn.BatchNorm2d):
            for p in m.parameters():
                p.requires_grad_(False)

    sd = export_reference_sd(*torch_stack)
    params = jax.tree.map(jnp.asarray, import_torch_e2e(sd, CFG, "retrieval"))

    ts = steps.TaskSettings(head_type="retrieval", num_labels=2,
                            loss_type="ce", score_agg_func="lse",
                            train_n_clips=NC, group_size=G)
    oc = OptimConfig(learning_rate=LR, cnn_learning_rate=CNN_LR,
                     weight_decay=WD, cnn_weight_decay=CNN_WD,
                     betas=BETAS, eps=EPS, grad_norm=GRAD_NORM,
                     cnn_lr_mul=CNN_LR_MUL)
    ss = steps.ScheduleSettings(learning_rate=LR, cnn_learning_rate=CNN_LR,
                                decay="linear", cnn_decay="linear",
                                num_train_steps=NUM_TRAIN_STEPS,
                                warmup_ratio=WARMUP_RATIO)
    meta = build_group_meta(params, oc)
    step_fn = steps.make_train_step(CFG, ts, oc, ss, meta,
                                    compute_dtype=jnp.float32)
    state = steps.init_train_state(params)

    batches = make_batches(np.random.default_rng(23))
    groups = torch_param_groups(torch_stack)
    trainables = [p for g in groups for p in g[0]]
    opt_state = {}

    for i in range(N_STEPS):
        b = batches[i]
        # ours
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        state, metrics = step_fn(state, jb, jax.random.key(i))
        our_loss = float(metrics["loss"])

        # torch twin
        for p in trainables:
            p.grad = None
        loss = torch_mil_loss(torch_stack, b)
        loss.backward()
        for p in trainables:                # zero_none_grad (misc.py:28-31)
            if p.grad is None:
                p.grad = torch.zeros_like(p)
        torch.nn.utils.clip_grad_norm_(trainables, GRAD_NORM)
        t = i + 1                           # post-increment global step
        ref_adamw_step(groups, opt_state, t,
                       warmup_linear_lr(t, LR), warmup_linear_lr(t, CNN_LR))

        np.testing.assert_allclose(our_loss, float(loss.detach()), rtol=2e-3,
                                   err_msg=f"step {t} loss diverged")

    # post-training logits on a held-out batch: the integrated-dynamics
    # fingerprint (covers every updated parameter at once)
    hb = batches[N_STEPS]
    ref_logits = torch_full_forward(
        torch_stack, hb["visual_inputs"][:, :NF], hb["text_input_ids"],
        hb["text_input_mask"], G)
    ts_eval = steps.TaskSettings(head_type="retrieval", num_labels=2,
                                 loss_type="ce", score_agg_func="lse",
                                 train_n_clips=1, group_size=G)
    eval_fn = steps.make_eval_step(CFG, ts_eval, compute_dtype=jnp.float32)
    out = eval_fn(state.params,
                  {"visual_inputs": jnp.asarray(hb["visual_inputs"][:, :NF]),
                   "text_input_ids": jnp.asarray(hb["text_input_ids"]),
                   "text_input_mask": jnp.asarray(hb["text_input_mask"])})
    got = np.asarray(out["clip_logits"])[:, 0]
    np.testing.assert_allclose(got, ref_logits, rtol=5e-3, atol=5e-3)


# ---------------------------------------------------------------------------
# pretrain twin: MLM+ITM summed losses through the 8-group optimizer
# (run_pretrain.py:387-440; modeling.py:241-307)
# ---------------------------------------------------------------------------

def _freeze_bn(r50):
    """FrozenBatchNorm2d semantics: BN params are buffers, never trained."""
    for m in r50.modules():
        if isinstance(m, nn.BatchNorm2d):
            for p in m.parameters():
                p.requires_grad_(False)


def _make_pretrain_heads(bm):
    """BertPreTrainingHeads twin (transformers.py:497-547): MLM transform +
    decoder TIED to the word embeddings (shared Parameter, so gradients
    from both uses accumulate like the reference's weight tying) + 2-way
    seq-relationship head."""
    from test_fullstack_parity import CFG as _CFG
    D = _CFG.hidden_size

    class Heads(nn.Module):
        def __init__(self):
            super().__init__()
            self.dense = nn.Linear(D, D)
            self.LayerNorm = nn.LayerNorm(D, eps=_CFG.layer_norm_eps)
            self.decoder = nn.Linear(D, _CFG.vocab_size)
            self.seq_relationship = nn.Linear(D, 2)

        def forward(self, seq, pooled):
            h = torch.nn.functional.gelu(self.dense(seq))
            h = self.LayerNorm(h)
            return self.decoder(h), self.seq_relationship(pooled)

    torch.manual_seed(29)
    heads = Heads()
    heads.decoder.weight = bm.embeddings.word_embeddings.weight  # tie
    return heads


def _export_pretrain_sd(stack, heads):
    """Reference pretrain checkpoint key scheme (the fullstack pretrain
    parity test pins the import of these keys)."""
    sd = export_reference_sd(*stack)
    hsd = heads.state_dict()
    hp = "transformer.cls.predictions"
    sd[f"{hp}.transform.dense.weight"] = hsd["dense.weight"].numpy()
    sd[f"{hp}.transform.dense.bias"] = hsd["dense.bias"].numpy()
    sd[f"{hp}.transform.LayerNorm.weight"] = hsd["LayerNorm.weight"].numpy()
    sd[f"{hp}.transform.LayerNorm.bias"] = hsd["LayerNorm.bias"].numpy()
    sd[f"{hp}.bias"] = hsd["decoder.bias"].numpy()
    sd["transformer.cls.seq_relationship.weight"] = \
        hsd["seq_relationship.weight"].numpy()
    sd["transformer.cls.seq_relationship.bias"] = \
        hsd["seq_relationship.bias"].numpy()
    return sd


def _torch_joint_encode(stack, batch):
    """Shared grad-enabled joint forward: pixels+text -> (enc, pooled)."""
    r50, genc, vemb, bm, _ = stack
    px = torch.tensor(np.ascontiguousarray(batch["visual_inputs"][..., ::-1]))
    B, T = px.shape[:2]
    x = px.reshape(B * T, *px.shape[2:]).permute(0, 3, 1, 2)
    feat = genc(r50(x))
    D = feat.shape[1]
    feat = feat.permute(0, 2, 3, 1).reshape(
        B, T, feat.shape[2], feat.shape[3], D)
    vis = vemb(feat)
    txt = bm.embeddings(input_ids=torch.tensor(batch["text_input_ids"]))
    hidden = torch.cat([txt, vis], dim=1)
    mask = torch.tensor(batch["text_input_mask"]).float()
    full_mask = torch.cat([mask, torch.ones(B, vis.shape[1])], dim=1)
    ext = (1.0 - full_mask)[:, None, None, :] * -10000.0
    enc = bm.encoder(hidden, attention_mask=ext).last_hidden_state
    return enc, bm.pooler(enc)


def _torch_pretrain_loss(stack, heads, batch):
    """loss = mlm_loss.mean() + itm_loss.mean() with reduction='none' CE
    (default ignore_index=-100 zeroes masked-out positions, which still
    count in the mean) — run_pretrain.py:387-395 + modeling.py:283-298."""
    enc, pooled = _torch_joint_encode(stack, batch)
    Lt = batch["text_input_mask"].shape[1]
    mlm_scores, itm_scores = heads(enc[:, :Lt], pooled)
    ce = nn.CrossEntropyLoss(reduction="none")
    mlm = ce(mlm_scores.reshape(-1, CFG.vocab_size),
             torch.tensor(batch["mlm_labels"], dtype=torch.long).reshape(-1))
    itm = ce(itm_scores,
             torch.tensor(batch["itm_labels"], dtype=torch.long))
    return mlm.mean() + itm.mean()


def make_pretrain_batches(rng):
    batches = []
    for _ in range(N_STEPS):
        pixels = rng.normal(0, 1, (B_V, NF, IMG, IMG, 3)).astype(np.float32)
        ids = rng.integers(1, CFG.vocab_size, (B_V, LT)).astype(np.int32)
        mask = np.ones((B_V, LT), np.int32)
        mask[:, 6:] = 0
        mlm_labels = np.full((B_V, LT), -100, np.int32)
        # ~25% of valid positions carry an MLM target
        sel = rng.random((B_V, LT)) < 0.25
        sel &= mask.astype(bool)
        mlm_labels[sel] = rng.integers(1, CFG.vocab_size, sel.sum())
        itm_labels = rng.integers(0, 2, (B_V,)).astype(np.int32)
        batches.append({"visual_inputs": pixels, "text_input_ids": ids,
                        "text_input_mask": mask, "mlm_labels": mlm_labels,
                        "itm_labels": itm_labels})
    return batches


def test_pretrain_dynamics_match_torch(torch_stack):  # noqa: F811
    r50, genc, vemb, bm, clf = torch_stack
    _freeze_bn(r50)
    heads = _make_pretrain_heads(bm)
    params = jax.tree.map(
        jnp.asarray,
        import_torch_e2e(_export_pretrain_sd(torch_stack, heads),
                         CFG, "pretrain"))

    ts = steps.TaskSettings(head_type="pretrain", use_mlm=True, use_itm=True,
                            group_size=1)
    oc = OptimConfig(learning_rate=LR, cnn_learning_rate=CNN_LR,
                     weight_decay=WD, cnn_weight_decay=CNN_WD,
                     betas=BETAS, eps=EPS, grad_norm=GRAD_NORM,
                     cnn_lr_mul=CNN_LR_MUL)
    ss = steps.ScheduleSettings(learning_rate=LR, cnn_learning_rate=CNN_LR,
                                decay="linear", cnn_decay="linear",
                                num_train_steps=NUM_TRAIN_STEPS,
                                warmup_ratio=WARMUP_RATIO)
    meta = build_group_meta(params, oc)
    step_fn = steps.make_train_step(CFG, ts, oc, ss, meta,
                                    compute_dtype=jnp.float32)
    state = steps.init_train_state(params)

    # transformer family = visual embed + BERT + pretrain heads; the tied
    # decoder.weight is EXCLUDED (it is the word-embedding Parameter, which
    # named_parameters() of the reference model yields once)
    tr_named = (list(vemb.named_parameters())
                + list(bm.named_parameters())
                + [(f"cls.{n}", p) for n, p in heads.named_parameters()
                   if n != "decoder.weight"])
    groups = torch_param_groups(torch_stack, tr_named=tr_named)
    trainables = [p for g in groups for p in g[0]]
    assert len(set(map(id, trainables))) == len(trainables)
    opt_state = {}

    for i, b in enumerate(make_pretrain_batches(np.random.default_rng(31))):
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        state, metrics = step_fn(state, jb, jax.random.key(i))

        for p in trainables:
            p.grad = None
        loss = _torch_pretrain_loss(torch_stack, heads, b)
        loss.backward()
        for p in trainables:
            if p.grad is None:
                p.grad = torch.zeros_like(p)
        torch.nn.utils.clip_grad_norm_(trainables, GRAD_NORM)
        t = i + 1
        ref_adamw_step(groups, opt_state, t,
                       warmup_linear_lr(t, LR), warmup_linear_lr(t, CNN_LR))

        np.testing.assert_allclose(
            float(metrics["loss"]), float(loss.detach()), rtol=2e-3,
            err_msg=f"pretrain step {t} loss diverged")

    # integrated fingerprint: post-training MLM+ITM scores on a fresh batch
    hb = make_pretrain_batches(np.random.default_rng(37))[0]
    with torch.no_grad():
        enc, pooled = _torch_joint_encode(torch_stack, hb)
        mlm_ref, itm_ref = heads(enc[:, :LT], pooled)
    out = clipbert.clipbert_forward(
        state.params, CFG,
        {k: jnp.asarray(v) for k, v in hb.items()
         if k in ("visual_inputs", "text_input_ids", "text_input_mask")},
        "pretrain", compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out["mlm_scores"]),
                               mlm_ref.numpy(), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["itm_scores"]),
                               itm_ref.numpy(), rtol=5e-3, atol=5e-3)


# ---------------------------------------------------------------------------
# VQA twin: bce x num_labels through the same optimizer
# (run_vqa.py:340-419; modeling.py:310-316)
# ---------------------------------------------------------------------------

def make_vqa_batches(rng):
    batches = []
    for _ in range(N_STEPS):
        pixels = rng.normal(0, 1, (B_V, 1, IMG, IMG, 3)).astype(np.float32)
        ids = rng.integers(1, CFG.vocab_size, (B_V * G, LT)).astype(np.int32)
        mask = np.ones((B_V * G, LT), np.int32)
        mask[:, 6:] = 0
        # soft VQA targets in [0, 1] (the 0/0.3/0.6/0.9/1 score scatter)
        labels = rng.choice([0.0, 0.3, 0.6, 0.9, 1.0],
                            (B_V * G, CFG.num_labels)).astype(np.float32)
        batches.append({"visual_inputs": pixels, "text_input_ids": ids,
                        "text_input_mask": mask, "labels": labels})
    return batches


def test_vqa_dynamics_match_torch(torch_stack):  # noqa: F811
    r50, genc, vemb, bm, clf = torch_stack
    _freeze_bn(r50)
    sd = export_reference_sd(*torch_stack)
    params = jax.tree.map(jnp.asarray, import_torch_e2e(sd, CFG, "seq_cls"))

    ts = steps.TaskSettings(head_type="seq_cls", num_labels=CFG.num_labels,
                            loss_type="bce", train_n_clips=1, group_size=G,
                            scale_loss_by_num_labels=True)
    oc = OptimConfig(learning_rate=LR, cnn_learning_rate=CNN_LR,
                     weight_decay=WD, cnn_weight_decay=CNN_WD,
                     betas=BETAS, eps=EPS, grad_norm=GRAD_NORM,
                     cnn_lr_mul=CNN_LR_MUL)
    ss = steps.ScheduleSettings(learning_rate=LR, cnn_learning_rate=CNN_LR,
                                decay="linear", cnn_decay="linear",
                                num_train_steps=NUM_TRAIN_STEPS,
                                warmup_ratio=WARMUP_RATIO)
    meta = build_group_meta(params, oc)
    step_fn = steps.make_train_step(CFG, ts, oc, ss, meta,
                                    compute_dtype=jnp.float32)
    state = steps.init_train_state(params)

    groups = torch_param_groups(torch_stack)
    trainables = [p for g in groups for p in g[0]]
    opt_state = {}

    for i, b in enumerate(make_vqa_batches(np.random.default_rng(41))):
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        state, metrics = step_fn(state, jb, jax.random.key(i))

        for p in trainables:
            p.grad = None
        logits = torch_train_forward(
            torch_stack, b["visual_inputs"], b["text_input_ids"],
            b["text_input_mask"], G)
        # instance_bce_with_logits: mean bce x num_labels
        # (modeling.py:310-316; run_vqa.py:355-356)
        loss = torch.nn.functional.binary_cross_entropy_with_logits(
            logits, torch.tensor(b["labels"]),
            reduction="mean") * CFG.num_labels
        loss.backward()
        for p in trainables:
            if p.grad is None:
                p.grad = torch.zeros_like(p)
        torch.nn.utils.clip_grad_norm_(trainables, GRAD_NORM)
        t = i + 1
        ref_adamw_step(groups, opt_state, t,
                       warmup_linear_lr(t, LR), warmup_linear_lr(t, CNN_LR))

        np.testing.assert_allclose(
            float(metrics["loss"]), float(loss.detach()), rtol=2e-3,
            err_msg=f"vqa step {t} loss diverged")

    # integrated fingerprint: post-training logits on a fresh batch
    hb = make_vqa_batches(np.random.default_rng(43))[0]
    ref_logits = torch_full_forward(
        torch_stack, hb["visual_inputs"], hb["text_input_ids"],
        hb["text_input_mask"], G)
    out = clipbert.clipbert_forward(
        state.params, CFG,
        {"visual_inputs": jnp.asarray(hb["visual_inputs"]),
         "text_input_ids": jnp.asarray(hb["text_input_ids"]),
         "text_input_mask": jnp.asarray(hb["text_input_mask"])},
        "seq_cls", compute_dtype=jnp.float32, group_size=G)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref_logits,
                               rtol=5e-3, atol=5e-3)

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


def torch_param_groups(stack):
    """The reference 8-group split restated (optimization/utils.py:96-161):
    {transformer, cnn} x {lr_mul prefix, rest} x {decay, no_decay}; frozen
    BN params excluded entirely (requires_grad False)."""
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

    tr_named = (list(vemb.named_parameters())
                + list(bm.named_parameters())
                + [(f"classifier.{n}", p) for n, p in clf.named_parameters()])
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

"""Train/eval step engine tests on the 8-device virtual CPU mesh.

Covers the per-step semantics pinned in SURVEY.md §3.1-3.2: MIL clip fold +
mean/max/lse aggregation (run_video_retrieval.py:396-421), lse loss exactness
(:415-418), grad-accumulation equivalence (run_pretrain.py:398-404), and the
data-parallel GSPMD step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clipbert_tpu.core.config import ModelConfig
from clipbert_tpu.core.mesh import make_mesh, replicate_tree, shard_batch
from clipbert_tpu.models import clipbert
from clipbert_tpu.train import optim, steps


def tiny_cfg(**kw):
    base = dict(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=64,
                max_position_embeddings=64,
                max_grid_row_position_embeddings=4,
                max_grid_col_position_embeddings=4,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    base.update(kw)
    return ModelConfig(**base)


def make_batch(rng, B_v, nc, nf, G, img=64, txt=8, num_labels=2,
               label_mode="ce"):
    B_t = B_v * G
    batch = {
        "text_input_ids": jnp.asarray(rng.integers(1, 128, (B_t, txt)),
                                      jnp.int32),
        "text_input_mask": jnp.ones((B_t, txt), jnp.int32),
        "visual_inputs": jnp.asarray(
            rng.standard_normal((B_v, nc * nf, img, img, 3)) * 0.1,
            jnp.float32),
    }
    if label_mode == "ce":
        batch["labels"] = jnp.asarray(rng.integers(0, num_labels, (B_t,)),
                                      jnp.int32)
    elif label_mode == "bce":
        batch["labels"] = jnp.asarray(
            rng.random((B_t, num_labels)), jnp.float32)
    return batch


def test_lse_loss_matches_manual(rng_np):
    logits = rng_np.standard_normal((4, 3, 5)).astype(np.float32)
    labels = rng_np.integers(0, 5, (4,))
    got = steps.lse_loss(jnp.asarray(logits), jnp.asarray(labels))
    # manual: LSE over flattened (nc*L) minus LSE over clips, gather label
    flat = logits.reshape(4, -1)
    lse_all = np.log(np.exp(flat).sum(-1, keepdims=True))
    lse_clip = np.log(np.exp(logits).sum(1))
    want = (lse_all - lse_clip)[np.arange(4), labels]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_pool_clip_logits(rng_np):
    logits = jnp.asarray(rng_np.standard_normal((3, 4, 2)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(steps.pool_clip_logits(logits, "mean")),
        np.asarray(logits).mean(1), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(steps.pool_clip_logits(logits, "max")),
        np.asarray(logits).max(1), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(steps.pool_clip_logits(logits, "lse")),
        np.log(np.exp(np.asarray(logits)).sum(1)), rtol=1e-5)


@pytest.mark.parametrize("agg", ["lse"])
def test_train_step_mesh_runs_and_learns(agg):
    rng = np.random.default_rng(0)
    cfg = tiny_cfg(num_labels=2, loss_type="ce", score_agg_func=agg)
    ts = steps.TaskSettings(head_type="retrieval", num_labels=2,
                            loss_type="ce", score_agg_func=agg,
                            train_n_clips=2, group_size=2)
    oc = optim.OptimConfig(learning_rate=1e-3, cnn_learning_rate=1e-3,
                           grad_norm=2.0)
    ss = steps.ScheduleSettings(learning_rate=1e-3, cnn_learning_rate=1e-3,
                                num_train_steps=50, warmup_ratio=0.0,
                                decay="constant", cnn_decay="constant")
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "retrieval")
    meta = optim.build_group_meta(params, oc)
    mesh = make_mesh()
    step_fn = steps.make_train_step(cfg, ts, oc, ss, meta, mesh=mesh,
                                    compute_dtype=jnp.float32)

    state = replicate_tree(mesh, steps.init_train_state(params))
    batch = shard_batch(mesh, make_batch(rng, B_v=8, nc=2, nf=1, G=2))

    losses = []
    for i in range(4):
        state, metrics = step_fn(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses  # overfits the fixed batch
    assert int(state.opt.step) == 4


def test_grad_accum_equivalence():
    """accum_steps=2 over two half batches == one step on the full batch
    (dropout off, constant lr)."""
    rng = np.random.default_rng(1)
    cfg = tiny_cfg(num_labels=3, loss_type="ce")
    ts = steps.TaskSettings(head_type="seq_cls", num_labels=3,
                            loss_type="ce", train_n_clips=1, group_size=1)
    oc = optim.OptimConfig(learning_rate=1e-3, cnn_learning_rate=1e-3)
    ss = steps.ScheduleSettings(learning_rate=1e-3, cnn_learning_rate=1e-3,
                                num_train_steps=10, warmup_ratio=0.0,
                                decay="constant", cnn_decay="constant")
    params = clipbert.init_clipbert(jax.random.key(2), cfg, "seq_cls")
    meta = optim.build_group_meta(params, oc)

    full = make_batch(rng, B_v=2, nc=1, nf=1, G=1, num_labels=3)
    micro = jax.tree.map(lambda x: x.reshape((2, 1) + x.shape[1:]), full)

    s1 = steps.make_train_step(cfg, ts, oc, ss, meta, accum_steps=1,
                               compute_dtype=jnp.float32)
    s2 = steps.make_train_step(cfg, ts, oc, ss, meta, accum_steps=2,
                               compute_dtype=jnp.float32)
    # the step donates its input state: give each call its own param copy
    st1, m1 = s1(steps.init_train_state(jax.tree.map(jnp.copy, params)),
                 full, jax.random.key(3))
    st2, m2 = s2(steps.init_train_state(jax.tree.map(jnp.copy, params)),
                 micro, jax.random.key(3))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    a = jax.tree.leaves(st1.params)
    b = jax.tree.leaves(st2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-6)


def test_multi_choice_shapes_and_loss():
    rng = np.random.default_rng(2)
    cfg = tiny_cfg(num_labels=5, loss_type="ce")
    ts = steps.TaskSettings(head_type="multi_choice", num_labels=5,
                            loss_type="ce", train_n_clips=2, group_size=5)
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "multi_choice")
    # 2 videos x 5 option-texts each -> 2 questions
    batch = make_batch(rng, B_v=2, nc=2, nf=1, G=5, label_mode=None)
    batch["labels"] = jnp.asarray([1, 3], jnp.int32)
    loss, metrics = steps.compute_loss(params, cfg, ts, batch,
                                       jax.random.key(1), train=False,
                                       compute_dtype=jnp.float32)
    assert np.isfinite(float(loss))
    assert "acc" in metrics


def test_vqa_bce_scaling():
    rng = np.random.default_rng(3)
    cfg = tiny_cfg(num_labels=4, loss_type="bce")
    ts_scaled = steps.TaskSettings(head_type="seq_cls", num_labels=4,
                                   loss_type="bce", train_n_clips=1,
                                   scale_loss_by_num_labels=True)
    ts_plain = steps.TaskSettings(head_type="seq_cls", num_labels=4,
                                  loss_type="bce", train_n_clips=1)
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "seq_cls")
    batch = make_batch(rng, B_v=2, nc=1, nf=1, G=1, num_labels=4,
                       label_mode="bce")
    l1, _ = steps.compute_loss(params, cfg, ts_scaled, batch, None, False,
                               jnp.float32)
    l2, _ = steps.compute_loss(params, cfg, ts_plain, batch, None, False,
                               jnp.float32)
    np.testing.assert_allclose(float(l1), 4 * float(l2), rtol=1e-6)


def test_rank_loss_path():
    rng = np.random.default_rng(4)
    cfg = tiny_cfg(num_labels=1, loss_type="rank")
    ts = steps.TaskSettings(head_type="retrieval", num_labels=1,
                            loss_type="rank", train_n_clips=1, group_size=3,
                            margin=0.2)
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "retrieval")
    batch = make_batch(rng, B_v=2, nc=1, nf=1, G=3, label_mode=None)
    batch["labels"] = jnp.zeros((6,), jnp.int32)  # unused by rank loss
    loss, _ = steps.compute_loss(params, cfg, ts, batch, None, False,
                                 jnp.float32)
    assert 0.0 <= float(loss) <= 1.0 + 0.2


def test_pretrain_step():
    rng = np.random.default_rng(5)
    cfg = tiny_cfg()
    ts = steps.TaskSettings(head_type="pretrain", use_mlm=True, use_itm=True,
                            group_size=1)
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "pretrain")
    batch = make_batch(rng, B_v=2, nc=1, nf=1, G=1, label_mode=None)
    mlm_labels = np.full((2, 8), -100, np.int32)
    mlm_labels[:, 2] = rng.integers(0, 128, (2,))
    batch["mlm_labels"] = jnp.asarray(mlm_labels)
    batch["itm_labels"] = jnp.asarray([0, 1], jnp.int32)
    loss, metrics = steps.compute_loss(params, cfg, ts, batch, None, False,
                                       jnp.float32)
    assert np.isfinite(float(loss))
    assert {"mlm_loss", "itm_loss", "mlm_acc", "itm_acc"} <= set(metrics)
    # loss = mlm.mean() + itm.mean() (run_pretrain.py:387-395)
    np.testing.assert_allclose(
        float(loss), float(metrics["mlm_loss"]) + float(metrics["itm_loss"]),
        rtol=1e-6)


def test_retrieval_eval_feature_cache_consistency():
    """Cached-visual-feature scoring == direct mil_forward scoring."""
    rng = np.random.default_rng(6)
    cfg = tiny_cfg(num_labels=2, loss_type="ce")
    ts = steps.TaskSettings(head_type="retrieval", num_labels=2,
                            loss_type="ce", score_agg_func="lse",
                            train_n_clips=2, group_size=1)
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "retrieval")
    batch = make_batch(rng, B_v=1, nc=2, nf=1, G=1, label_mode=None)

    enc = steps.make_visual_encode_step(compute_dtype=jnp.float32)
    score = steps.make_text_score_step(cfg, ts, compute_dtype=jnp.float32)
    vis = batch["visual_inputs"].reshape(2, 1, 64, 64, 3)  # (nc, nf, H, W, 3)
    feats = enc(params, vis)
    got = score(params, feats[None], batch["text_input_ids"],
                batch["text_input_mask"])[0]  # (B_v=1 ->) (B_t, nc, 2)

    from clipbert_tpu.core.rng import RngGen
    want = steps.mil_forward(params, cfg, ts, batch, RngGen(None), False,
                             jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_remat_equivalence():
    """remat=True changes memory, not numerics."""
    rng = np.random.default_rng(7)
    cfg = tiny_cfg(num_labels=2, loss_type="ce")
    batch = make_batch(rng, B_v=2, nc=1, nf=1, G=1)
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "seq_cls")
    outs = []
    for remat in (False, True):
        ts = steps.TaskSettings(head_type="seq_cls", num_labels=2,
                                loss_type="ce", train_n_clips=1,
                                group_size=1, remat=remat)
        loss, _ = steps.compute_loss(params, cfg, ts, batch,
                                     jax.random.key(1), train=True,
                                     compute_dtype=jnp.float32)
        outs.append(float(loss))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6)


def test_learning_sanity_text_separable():
    """The full e2e gradient path (CNN+BERT+head+AdamW) drives a
    text-separable task to near-zero loss from random init.

    (A fully cross-modal matching task does NOT train from tiny random
    init — post-LN BERT at hidden<100 propagates cross-token differences
    too weakly to bootstrap, which is why, like the reference, real runs
    start from pretrained BERT/R50 weights.)
    """
    cfg = tiny_cfg(num_labels=2, loss_type="ce", hidden_size=48,
                   num_attention_heads=4, intermediate_size=96,
                   initializer_range=0.15)
    ts = steps.TaskSettings(head_type="retrieval", num_labels=2,
                            loss_type="ce", score_agg_func="lse",
                            train_n_clips=1, group_size=2)
    oc = optim.OptimConfig(learning_rate=5e-4, cnn_learning_rate=5e-4,
                           weight_decay=0.0, cnn_weight_decay=0.0)
    ss = steps.ScheduleSettings(learning_rate=5e-4, cnn_learning_rate=5e-4,
                                num_train_steps=300, warmup_ratio=0.0,
                                decay="constant", cnn_decay="constant")
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "retrieval")
    meta = optim.build_group_meta(params, oc)
    step_fn = steps.make_train_step(cfg, ts, oc, ss, meta,
                                    compute_dtype=jnp.float32)
    state = steps.init_train_state(params)

    rng = np.random.default_rng(0)
    pix = np.zeros((4, 1, 64, 64, 3), np.float32)
    for i in range(4):
        pix[i, :, :, :, 0] = i * 0.2
    ids = np.zeros((8, 8), np.int32)
    mask = np.zeros((8, 8), np.int32)
    labels = np.zeros((8,), np.int32)
    for r in range(8):
        tok = 10 + r
        ids[r, :3] = [2, tok, 3]
        mask[r, :3] = 1
        labels[r] = tok % 2  # separable from the text token alone
    batch = {"visual_inputs": jnp.asarray(pix),
             "text_input_ids": jnp.asarray(ids),
             "text_input_mask": jnp.asarray(mask),
             "labels": jnp.asarray(labels)}
    losses = []
    for i in range(40):
        state, m = step_fn(state, batch, jax.random.fold_in(
            jax.random.key(1), i))
        losses.append(float(m["loss"]))
    assert losses[-1] < 0.3, losses[::8]

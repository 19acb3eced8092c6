"""adam / adamax variants vs torch.optim reference implementations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clipbert_tpu.train import optim


def run_ours(optim_name, params0, grads_seq, lr=1e-3, wd=0.0,
             betas=(0.9, 0.98)):
    cfg = optim.OptimConfig(optim=optim_name, learning_rate=lr,
                            cnn_learning_rate=lr, weight_decay=wd,
                            cnn_weight_decay=wd, betas=betas,
                            grad_norm=-1.0, eps=1e-6)
    params = {"transformer": {"w": jnp.asarray(params0)}}
    meta = optim.build_group_meta(params, cfg)
    state = optim.init_adamw_state(params)
    for g in grads_seq:
        grads = {"transformer": {"w": jnp.asarray(g)}}
        params, state, _ = optim.adamw_update(
            params, grads, state, meta, cfg,
            jnp.float32(lr), jnp.float32(lr))
    return np.asarray(params["transformer"]["w"])


def run_torch(optim_cls_name, params0, grads_seq, lr=1e-3, wd=0.0,
              betas=(0.9, 0.98)):
    import torch
    p = torch.nn.Parameter(torch.tensor(params0, dtype=torch.float64))
    cls = getattr(torch.optim, optim_cls_name)
    opt = cls([p], lr=lr, betas=betas, eps=1e-6, weight_decay=wd)
    for g in grads_seq:
        opt.zero_grad()
        p.grad = torch.tensor(g, dtype=torch.float64)
        opt.step()
    return p.detach().numpy()


@pytest.mark.parametrize("name,torch_name,wd", [
    ("adam", "Adam", 0.0), ("adam", "Adam", 0.01),
    ("adamax", "Adamax", 0.0), ("adamax", "Adamax", 0.01)])
def test_variant_matches_torch(name, torch_name, wd, rng_np):
    params0 = rng_np.standard_normal(16).astype(np.float32)
    grads = [rng_np.standard_normal(16).astype(np.float32) for _ in range(5)]
    ours = run_ours(name, params0, grads, wd=wd)
    want = run_torch(torch_name, params0, grads, wd=wd)
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=1e-6)


def test_freeze_cnn_stops_cnn_updates(rng_np):
    import jax
    from clipbert_tpu.core.config import ModelConfig
    from clipbert_tpu.models import clipbert
    from clipbert_tpu.train import steps

    cfg = ModelConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=64,
                      max_grid_row_position_embeddings=4,
                      max_grid_col_position_embeddings=4, num_labels=2)
    oc = optim.OptimConfig(freeze_cnn=True, learning_rate=1e-2,
                           cnn_learning_rate=1e-2)
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "seq_cls")
    meta = optim.build_group_meta(params, oc)
    # all cnn leaves are frozen (group -1)
    flat_meta = jax.tree.leaves(
        meta["cnn"], is_leaf=lambda x: isinstance(x, optim.GroupMeta))
    assert all(not gm.trainable for gm in flat_meta)
    ss = steps.ScheduleSettings(learning_rate=1e-2, cnn_learning_rate=1e-2,
                                num_train_steps=10, warmup_ratio=0.0,
                                decay="constant", cnn_decay="constant")
    step = steps.make_train_step(cfg, oc=oc, ss=ss, meta=meta,
                                 ts=steps.TaskSettings(head_type="seq_cls",
                                                       num_labels=2),
                                 compute_dtype=jnp.float32)
    from tests.test_train_steps import make_batch
    batch = make_batch(np.random.default_rng(0), B_v=2, nc=1, nf=1, G=1)
    state0 = steps.init_train_state(jax.tree.map(jnp.copy, params))
    state1, _ = step(state0, batch, jax.random.key(1))
    for a, b in zip(jax.tree.leaves(params["cnn"]),
                    jax.tree.leaves(state1.params["cnn"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # transformer DID update
    t0 = jax.tree.leaves(params["transformer"])
    t1 = jax.tree.leaves(state1.params["transformer"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(t0, t1))


def test_lr_mul_prefix_groups(rng_np):
    import jax
    from clipbert_tpu.core.config import ModelConfig
    from clipbert_tpu.models import clipbert

    cfg = ModelConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=64,
                      max_grid_row_position_embeddings=4,
                      max_grid_col_position_embeddings=4)
    oc = optim.OptimConfig(transformer_lr_mul=5.0,
                           transformer_lr_mul_prefix="classifier",
                           cnn_lr_mul=3.0, cnn_lr_mul_prefix="grid_encoder")
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "seq_cls")
    meta = optim.build_group_meta(params, oc)
    cls_meta = jax.tree.leaves(
        meta["transformer"]["classifier"],
        is_leaf=lambda x: isinstance(x, optim.GroupMeta))
    assert all(gm.lr_mul == 5.0 and gm.group_id in (0, 1) for gm in cls_meta)
    ge_meta = jax.tree.leaves(
        meta["cnn"]["grid_encoder"],
        is_leaf=lambda x: isinstance(x, optim.GroupMeta))
    assert all(gm.lr_mul == 3.0 and gm.group_id in (4, 5) for gm in ge_meta)
    counts = optim.count_groups(meta)
    assert set(counts) <= set(range(-1, 8))

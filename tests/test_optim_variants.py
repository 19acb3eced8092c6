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

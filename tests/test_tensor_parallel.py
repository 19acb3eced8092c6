"""Tensor-parallel sharding: TP+DP train step matches pure-DP numerics."""

import numpy as np

import jax
import jax.numpy as jnp

from clipbert_tpu.core.mesh import shard_batch
from clipbert_tpu.models import clipbert
from clipbert_tpu.parallel import sharding as psh
from clipbert_tpu.train import optim, steps
from tests.test_train_steps import make_batch, tiny_cfg


def build(mesh, model_par):
    cfg = tiny_cfg(num_labels=2, loss_type="ce")
    ts = steps.TaskSettings(head_type="seq_cls", num_labels=2,
                            loss_type="ce", train_n_clips=1, group_size=1)
    oc = optim.OptimConfig(learning_rate=1e-3, cnn_learning_rate=1e-3)
    ss = steps.ScheduleSettings(learning_rate=1e-3, cnn_learning_rate=1e-3,
                                num_train_steps=10, warmup_ratio=0.0,
                                decay="constant", cnn_decay="constant")
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "seq_cls")
    meta = optim.build_group_meta(params, oc)
    state_sh = psh.train_state_shardings(params, mesh,
                                         tensor_parallel=model_par > 1)
    step = steps.make_train_step(cfg, ts, oc, ss, meta, mesh=mesh,
                                 compute_dtype=jnp.float32,
                                 state_shardings=state_sh)
    state = psh.shard_train_state(
        steps.init_train_state(jax.tree.map(jnp.copy, params)), mesh,
        tensor_parallel=model_par > 1)
    return cfg, step, state


def run_one(model_par, batch_np):
    devs = jax.devices()[:8]
    mesh = jax.sharding.Mesh(
        np.array(devs).reshape(8 // model_par, model_par),
        ("data", "model"))
    cfg, step, state = build(mesh, model_par)
    batch = shard_batch(mesh, batch_np)
    state, metrics = step(state, batch, jax.random.key(1))
    return float(metrics["loss"]), jax.tree.map(np.asarray, state.params)


def test_tp_matches_dp():
    rng = np.random.default_rng(0)
    batch = make_batch(rng, B_v=8, nc=1, nf=1, G=1)
    loss_dp, params_dp = run_one(1, batch)
    loss_tp, params_tp = run_one(2, batch)
    np.testing.assert_allclose(loss_tp, loss_dp, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(params_dp), jax.tree.leaves(params_tp)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-6)


def test_tp_sharding_specs():
    devs = jax.devices()[:8]
    mesh = jax.sharding.Mesh(np.array(devs).reshape(4, 2), ("data", "model"))
    cfg = tiny_cfg()
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "seq_cls")
    shardings = psh.param_shardings(params, mesh, tensor_parallel=True)
    enc = shardings["transformer"]["bert"]["encoder"]
    assert enc["intermediate"]["dense"]["kernel"].spec == \
        jax.sharding.PartitionSpec(None, None, "model")
    assert enc["output"]["dense"]["kernel"].spec == \
        jax.sharding.PartitionSpec(None, "model", None)
    assert enc["attention"]["self"]["query"]["kernel"].spec == \
        jax.sharding.PartitionSpec(None, None, "model")
    # CNN stays replicated
    cnn_leaf = shardings["cnn"]["resnet"]["stem"]["conv"]["kernel"]
    assert cnn_leaf.spec == jax.sharding.PartitionSpec()

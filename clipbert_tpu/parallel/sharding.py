"""Parameter sharding rules: data parallelism + optional tensor parallelism.

The reference's only strategy is Horovod data parallelism
(`/root/reference/src/pretrain/run_pretrain.py:295-301`; SURVEY.md §2.2).
Data parallelism here is GSPMD (batch sharded on the mesh `data` axis,
params replicated — XLA inserts the gradient psum over ICI).

This module adds the optional **tensor-parallel** layout over the mesh
`model` axis for scaling past one chip per replica (not required for parity
— BERT-base + R50 fit on a chip — but a first-class capability of the mesh
design). Megatron-style column/row split per BERT layer:

 - attention q/k/v kernels: split the head (output) dim     -> column
 - attention output kernel: split the input dim             -> row
 - FFN intermediate kernel: split the intermediate (out) dim-> column
 - FFN output kernel:       split the intermediate (in) dim -> row

With these param shardings alone, GSPMD propagates the activation layouts
and inserts exactly the two all-reduces per layer the hand-written Megatron
schedule would (after attention-output and FFN-output row matmuls). The CNN
and embeddings stay replicated: R50's conv channel dims are small enough
that TP would be all communication.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clipbert_tpu.core.mesh import MODEL_AXIS


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
    return "/".join(parts)


# encoder kernels are stacked (num_layers, d_in, d_out): dim 1 = in, 2 = out
_TP_RULES = (
    ("attention/self/query/kernel", 2),
    ("attention/self/key/kernel", 2),
    ("attention/self/value/kernel", 2),
    ("attention/self/query/bias", 1),
    ("attention/self/key/bias", 1),
    ("attention/self/value/bias", 1),
    ("attention/output/dense/kernel", 1),   # row-parallel (input dim)
    ("intermediate/dense/kernel", 2),
    ("intermediate/dense/bias", 1),
    ("output/dense/kernel", 1),             # row-parallel (input dim)
)


def _tp_spec(name: str, ndim: int) -> P:
    if "encoder/" in name:
        for suffix, dim in _TP_RULES:
            if name.endswith(suffix):
                spec = [None] * ndim
                spec[dim] = MODEL_AXIS
                return P(*spec)
    return P()


def param_shardings(params: Dict, mesh: Mesh,
                    tensor_parallel: bool = False) -> Any:
    """Pytree of NamedShardings for the model params.

    tensor_parallel=False -> everything replicated (pure DP).
    tensor_parallel=True  -> BERT encoder matmuls Megatron-split over the
    mesh `model` axis; everything else replicated.
    """

    def spec_for(path, leaf):
        if not tensor_parallel or mesh.shape.get(MODEL_AXIS, 1) == 1:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _tp_spec(_path_str(path), leaf.ndim))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def train_state_shardings(params: Dict, mesh: Mesh,
                          tensor_parallel: bool = False):
    """TrainState-shaped pytree of shardings (params + AdamW moments)."""
    from clipbert_tpu.train.optim import AdamWState
    from clipbert_tpu.train.steps import TrainState
    p_sh = param_shardings(params, mesh, tensor_parallel)
    return TrainState(p_sh, AdamWState(NamedSharding(mesh, P()),
                                       p_sh, jax.tree.map(lambda s: s, p_sh)))


def shard_train_state(state, mesh: Mesh, tensor_parallel: bool = False):
    """device_put a TrainState with params/opt-moments sharded identically."""
    p_sh = param_shardings(state.params, mesh, tensor_parallel)
    params = jax.tree.map(jax.device_put, state.params, p_sh)
    mu = jax.tree.map(jax.device_put, state.opt.mu, p_sh)
    nu = jax.tree.map(jax.device_put, state.opt.nu, p_sh)
    step = jax.device_put(state.opt.step, NamedSharding(mesh, P()))
    from clipbert_tpu.train.optim import AdamWState
    from clipbert_tpu.train.steps import TrainState
    return TrainState(params, AdamWState(step, mu, nu))

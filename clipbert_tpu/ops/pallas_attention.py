"""Pallas fused multi-head attention for short joint sequences.

XLA executes attention as scores-matmul -> softmax -> probs-matmul with the
(B, H, S, S) fp32 score tensor materialized in HBM between the two (it does
not re-fuse across an MXU op); at the retrieval scoring shape (B=8192,
H=12, S~70) that is ~2 GB of scores written and re-read per layer, plus
tiny (S, dh)x(dh, S) batched matmuls. This kernel computes
softmax(QK^T * scale + bias) V per (batch block, head) with everything
resident in VMEM: one HBM read of q/k/v, one HBM write of the context.

Exact math, not online/flash softmax: ClipBERT joint sequences are <= ~620
tokens (SURVEY.md §5 "long-video mechanisms"), so the full (S, S) score
tile fits in VMEM and the softmax is the same full-row fp32 softmax as the
XLA path (`ops/attention.py`) — parity-tested in
tests/test_pallas_kernels.py.

Layout: operands arrive (B, H, S, dh) so the Mosaic-tiled trailing dims are
(S, dh) and every in-kernel op is a plain 2D dot/softmax (4D squeezes of
tiled dims are unsupported shape casts). The caller's (B, S, H, dh) ->
(B, H, S, dh) transposes sit adjacent to the QKV-projection matmul and the
context consumer, where XLA folds them into the matmul layouts.

The attention-probability dropout used at train time is NOT implemented
here (the reference applies dropout to the probs, transformers.py:202-286);
callers keep the XLA path when a dropout key is live. Inference/eval paths
(retrieval scoring, serving, eval steps) are the targets.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# batch items per grid cell; q/k/v cell blocks are (BLK_B, S, dh) per head
# (~570 KB each at the scoring shape), scores (BLK_B, S, S) fp32 live.
# Swept on-chip at the B=8192/S=69 scoring shape (scripts/perf_attn_ab.py):
# kernel-only 8->~29 ms, 32->25.1, 64->24.3, 128/256->24.4 — a plateau at
# 64 set by MXU occupancy on the tiny (S,dh)x(dh,S) per-item matmuls, not
# by grid overhead or bandwidth (143 GB/s effective vs ~800 available).
# Env override is for perf A/Bs — set it before import; traced programs
# bake the value in.
BLK_B = int(os.environ.get("CLIPBERT_ATTN_BLK_B", "64"))


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    # one batched dot over the whole block (batch dim = block items): Mosaic
    # lowers this directly, where an unrolled per-item Python loop costs
    # 25x the compile time (201 s vs 8 s at the scoring shape) for slightly
    # worse runtime
    q = q_ref[:, 0]                                      # (BLK_B, S, dh)
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    bias = bias_ref[:, :]                                # (BLK_B, S)
    s = s * scale + bias[:, None, :]                     # (BLK_B, S, S) fp32
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(p.astype(v.dtype), v,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[:, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "blk_b"))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    key_bias: jnp.ndarray, scale: float,
                    blk_b: int | None = None) -> jnp.ndarray:
    """softmax(q k^T * scale + key_bias) v, fused in VMEM.

    q/k/v: (B, S, H, dh) in the compute dtype (the layout
    `ops/attention.py` produces). key_bias: (B, S) additive fp32 bias per
    KEY position (the HF (1-mask)*-10000 convention, broadcast over queries
    and heads). Returns (B, S, H, dh) in q.dtype.
    """
    B, S, H, dh = q.shape
    # adapt the block to small batches: a single-query serving call (B=8
    # captions x 1 clip) must not pad 8x to the eval-shape optimum — the
    # kernel at block<=B was measured latency-neutral vs einsum there,
    # while padding to 64 cost ~20 ms p50 (scripts/bench_serving.py)
    BLK_B = min(blk_b or globals()["BLK_B"], _cdiv(B, 8) * 8)
    assert k.shape == q.shape and v.shape == q.shape
    assert key_bias.shape == (B, S), (key_bias.shape, (B, S))

    Bp = _cdiv(B, BLK_B) * BLK_B
    if Bp != B:
        pad = ((0, Bp - B), (0, 0), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        # padded rows: bias 0 everywhere -> uniform softmax, result sliced off
        key_bias = jnp.pad(key_bias, ((0, Bp - B), (0, 0)))

    # (B, S, H, dh) -> (B, H, S, dh): puts (S, dh) in the tiled trailing dims
    q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))

    qkv_spec = pl.BlockSpec((BLK_B, 1, S, dh), lambda i, h: (i, h, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((BLK_B, S), lambda i, h: (i, 0),
                             memory_space=pltpu.VMEM)
    flops = 2 * 2 * Bp * H * S * S * dh
    bytes_accessed = 4 * Bp * S * H * dh * q.dtype.itemsize

    interpret = jax.default_backend() == "cpu"
    # blocks >64 items exceed the 16M default scoped-vmem budget; the chip
    # has far more — raise the cap so env-override A/Bs at 128+ compile
    params = {} if interpret else dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024))
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((Bp, H, S, dh), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(Bp // BLK_B, H),
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
            out_specs=qkv_spec),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=Bp * H * S * S),
        # interpret mode lets the CPU test mesh execute the same kernel
        interpret=interpret,
        **params,
    )(q, k, v, key_bias.astype(jnp.float32))
    return out.transpose(0, 2, 1, 3)[:B]


def fused_attention_shard_heads(q: jnp.ndarray, k: jnp.ndarray,
                                v: jnp.ndarray, key_bias: jnp.ndarray,
                                scale: float, mesh) -> jnp.ndarray:
    """The fused kernel on a TENSOR-PARALLEL mesh: shard_map over
    (data: batch, model: HEADS).

    Under the Megatron param split (parallel/sharding.py) q/k/v arrive
    head-sharded on the mesh `model` axis; GSPMD cannot partition a
    pallas_call, so this wraps ONLY the attention core in a shard_map whose
    specs match the surrounding GSPMD layout — each device runs the kernel
    on its (batch shard x head shard), zero collectives (attention is
    embarrassingly parallel over heads; the Megatron all-reduce stays where
    GSPMD puts it, after the row-parallel output matmul). Lifts the TP
    exclusion that kept einsum attention on model-parallel meshes
    (steps.fused_attn_default, VERDICT r3 #8).
    """
    from jax.sharding import PartitionSpec as P

    from clipbert_tpu.core.mesh import DATA_AXIS, MODEL_AXIS
    B, S, H, dh = q.shape
    n_data = mesh.shape[DATA_AXIS]
    n_model = mesh.shape[MODEL_AXIS]
    assert B % n_data == 0, (B, n_data)
    assert H % n_model == 0, (H, n_model)
    spec = P(DATA_AXIS, None, MODEL_AXIS, None)
    fn = jax.shard_map(
        functools.partial(fused_attention, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec, P(DATA_AXIS, None)),
        out_specs=spec, check_vma=False)
    return fn(q, k, v, key_bias)

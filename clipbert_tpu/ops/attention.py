"""Multi-head self-attention.

Semantics match the reference BertSelfAttention
(`src/modeling/transformers.py:202-286`): softmax(QK^T/sqrt(d) + bias)V with
an additive mask bias and dropout on the attention probabilities.

TPU notes: joint ClipBERT sequences are short (<= ~620 tokens), so a single
batched einsum chain keeps the MXU busy without flash-style tiling; softmax
runs in fp32. The einsum formulation avoids the reshape/permute round-trips
of the torch code — XLA fuses scale+bias+softmax into the matmul epilogue.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from clipbert_tpu.ops.dropout import dropout
from clipbert_tpu.ops.linear import linear


def multi_head_attention(
    hidden: jnp.ndarray,            # (B, L, D)
    params: Dict,                   # {query,key,value: {kernel,bias}}
    num_heads: int,
    mask_bias: Optional[jnp.ndarray] = None,  # (B, 1, 1, L) or (B,1,L,L) additive
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    fused=False,
) -> jnp.ndarray:
    """``fused=True`` routes the core (QK^T -> softmax -> PV) through the
    Pallas VMEM-resident kernel (ops/pallas_attention.py) — same fp32
    softmax math, no HBM round-trip for the score tensor. Only taken for
    dropout-free (inference) calls with the standard per-key mask; other
    configurations keep the einsum path.

    ``fused=<Mesh>`` (a tensor-parallel mesh, model axis > 1) takes the
    same kernel via a shard_map over (batch, HEADS) so each device runs it
    on its Megatron head shard — GSPMD cannot partition a pallas_call
    directly (steps.fused_attn_default picks this mode)."""
    B, L, D = hidden.shape
    head_dim = D // num_heads

    # one fused (D -> 3D) projection: reads the activations from HBM once
    # instead of three times and tiles the MXU 3x wider; column-block
    # concatenation plus the same fp32-accumulate / fp32-bias / single-cast
    # recipe as ops.linear makes it bit-identical to the separate matmuls
    if "kernel_i8" in params["query"]:
        # int8 scoring path (ops/linear.py): per-output-channel scales
        # concatenate alongside their kernel columns, so the merged int8
        # projection equals the three separate quantized matmuls
        merged = {"kernel_i8": jnp.concatenate(
                      [params[n]["kernel_i8"]
                       for n in ("query", "key", "value")], axis=1),
                  "kscale": jnp.concatenate(
                      [params[n]["kscale"]
                       for n in ("query", "key", "value")]),
                  "bias": jnp.concatenate(
                      [params[n]["bias"]
                       for n in ("query", "key", "value")])}
        qkv = linear(hidden, merged)
    else:
        w = jnp.concatenate([params["query"]["kernel"],
                             params["key"]["kernel"],
                             params["value"]["kernel"]], axis=1)
        b = jnp.concatenate([params["query"]["bias"], params["key"]["bias"],
                             params["value"]["bias"]])
        qkv = jnp.dot(hidden, w.astype(hidden.dtype),
                      preferred_element_type=jnp.float32)
        qkv = (qkv + b.astype(jnp.float32)).astype(hidden.dtype)
    q, k, v = (t.reshape(B, L, num_heads, head_dim)
               for t in jnp.split(qkv, 3, axis=-1))

    from jax.sharding import Mesh
    # strict gate: only True or a TP Mesh select the kernel — any other
    # value (None, 0, ...) means "not configured" and takes the einsum path
    use_fused = ((fused is True or isinstance(fused, Mesh))
                 and (dropout_rate == 0.0 or dropout_key is None)
                 and mask_bias is not None
                 and mask_bias.shape == (B, 1, 1, L))
    if use_fused:
        from clipbert_tpu.ops.pallas_attention import (
            fused_attention, fused_attention_shard_heads)
        scale = float(1.0 / head_dim ** 0.5)
        key_bias = mask_bias[:, 0, 0, :]
        if fused is True:
            ctx = fused_attention(q, k, v, key_bias, scale)
        else:                       # tensor-parallel mesh: shard the heads
            ctx = fused_attention_shard_heads(q, k, v, key_bias, scale,
                                              mesh=fused)
        return ctx.reshape(B, L, D)

    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(head_dim))
    if mask_bias is not None:
        scores = scores + mask_bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = dropout(probs, dropout_rate, dropout_key)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(hidden.dtype), v,
                     preferred_element_type=jnp.float32).astype(hidden.dtype)
    return ctx.reshape(B, L, D)

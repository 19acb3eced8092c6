"""LayerNorm.

The reference uses apex FusedLayerNorm in every BERT sublayer
(`src/modeling/transformers.py:32,148`). On TPU, XLA fuses the normalization
chain into adjacent ops natively, so the baseline implementation is plain jnp
with fp32 statistics; a Pallas fused residual+LN kernel can be slotted in via
the same signature if profiling shows a win (it rarely does for 768-wide LN).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-12) -> jnp.ndarray:
    """Normalize over the last axis with fp32 statistics.

    Returns in the input dtype (bf16 in -> bf16 out) so surrounding matmuls
    stay on the MXU fast path.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)

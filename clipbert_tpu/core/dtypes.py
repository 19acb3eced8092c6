"""Mixed-precision policy for TPU.

Replaces the reference's apex amp O2 (fp16 + fp32 master weights + dynamic
loss scaling, `run_pretrain.py:303-305,399-404`) with the TPU-native recipe:
fp32 parameters, bfloat16 compute on the MXU, fp32 reductions where precision
matters (LayerNorm statistics, softmax, losses). bf16 has the fp32 exponent
range, so no loss scaling is needed.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # dtype for numerically sensitive reductions (LN stats, softmax, loss)
    reduce_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, tree):
        import jax
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


BF16 = Policy()
FP32 = Policy(compute_dtype=jnp.float32)


def policy_for(bf16: bool) -> Policy:
    return BF16 if bf16 else FP32

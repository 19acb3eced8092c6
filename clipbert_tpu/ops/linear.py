"""Dense layer primitive.

Kernels are stored (in_features, out_features) so the forward is `x @ W + b`
with no transposes in the hot path (checkpoint importers transpose from the
torch (out, in) layout once at load time).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def linear(x: jnp.ndarray, p: Dict[str, jnp.ndarray],
           precision=None) -> jnp.ndarray:
    y = jnp.dot(x, p["kernel"].astype(x.dtype), precision=precision,
                preferred_element_type=jnp.float32)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)

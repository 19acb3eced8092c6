"""Dense layer primitive (+ opt-in int8 quantized path).

Kernels are stored (in_features, out_features) so the forward is `x @ W + b`
with no transposes in the hot path (checkpoint importers transpose from the
torch (out, in) layout once at load time).

int8 path: `quantize_dense` converts {kernel, bias} to
{kernel_i8, kscale, bias} (symmetric per-output-channel weights), and
`linear` dispatches on the presence of "kernel_i8" — activations are
quantized dynamically per token (symmetric, abs-max over the feature dim)
so the matmul runs int8 x int8 -> int32 on the MXU, then dequantizes by
row_scale x col_scale in fp32. Measured on the target chip: chained int8
matmuls sustain 112.9 TOP/s vs 75.4 TF/s bf16 at the same shape (1.5x).
Opt-in for inference scoring only (models/clipbert.py::
quantize_scoring_params); training and parity oracles keep bf16/fp32.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

_QMAX = 127.0


def quantize_dense(p: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """{kernel (..., d_in, d_out), bias} -> {kernel_i8, kscale, bias}.

    Symmetric per-output-channel scales over the contraction (d_in) axis;
    leading dims (e.g. the scan-stacked layer axis) are preserved, so the
    encoder's (L, d_in, d_out) kernels quantize in one call and slice per
    layer inside the scan exactly like the fp kernels do.

    Idempotent: already-quantized params pass through unchanged (callers
    that share prepared params across scorer configs re-enter this path).
    """
    if "kernel_i8" in p:
        return p
    w = jnp.asarray(p["kernel"], jnp.float32)
    s = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / _QMAX
    s = jnp.maximum(s, 1e-12)
    wi = jnp.clip(jnp.round(w / s), -_QMAX, _QMAX).astype(jnp.int8)
    out = {"kernel_i8": wi, "kscale": jnp.squeeze(s, -2)}
    if "bias" in p and p["bias"] is not None:
        out["bias"] = p["bias"]
    return out


def _qlinear(x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    rs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / _QMAX
    rs = jnp.maximum(rs, 1e-12)
    xi = jnp.clip(jnp.round(xf / rs), -_QMAX, _QMAX).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xi, p["kernel_i8"], (((xi.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * rs * p["kscale"].astype(jnp.float32)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def linear(x: jnp.ndarray, p: Dict[str, jnp.ndarray],
           precision=None) -> jnp.ndarray:
    if "kernel_i8" in p:
        return _qlinear(x, p)
    y = jnp.dot(x, p["kernel"].astype(x.dtype), precision=precision,
                preferred_element_type=jnp.float32)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)

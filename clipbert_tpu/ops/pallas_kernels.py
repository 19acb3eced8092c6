"""Pallas TPU kernels for the ResNet hot path.

The reference leans on apex/detectron2 CUDA kernels for its fused
conv+BN+ReLU blocks (`/root/reference/src/modeling/grid_feat.py:42`,
SURVEY.md §2.3). On TPU the 3x3 convs are best left to XLA's conv emitter,
but ~2/3 of ResNet-50's FLOPs are 1x1 convolutions — pure matmuls over the
channel axis — followed by folded-BN scale/bias, optional residual add, and
ReLU. This module implements that fused epilogue chain as a tiled Pallas
matmul so the scale/bias/residual/ReLU ride along in VMEM instead of
round-tripping through HBM.

Measured on TPU v5e (B64 448^2 R50 fwd): XLA path 26.0 ms vs this kernel
swapped in for the 1x1s 55.2 ms — XLA's conv emitter already fuses the
BN/ReLU/residual epilogue and pipelines K better than this single-K-block
schedule, so `use_pallas` defaults to OFF and exists as a correctness-tested
extension point (e.g. for future int8 epilogues XLA can't express).

Kernel: out[r, n] = act((x[r, :] @ w[:, n]) * scale[n] + bias[n] + res[r, n])
  x: (R, K) bf16 rows = B*H*W pixels, K = C_in
  w: (K, N) bf16, N = C_out
  scale/bias: (N,) fp32 folded FrozenBatchNorm
  res: optional (R, N) residual (bottleneck shortcut merge)

Grid: (R / BLOCK_R, N / BLOCK_N); K is loaded whole per tile (<= 2048
channels = 512 KB bf16 per operand tile at the default blocks, well inside
the ~16 MB VMEM budget). fp32 accumulation via preferred_element_type.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_R = 256
BLOCK_N = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel_no_res(x_ref, w_ref, sb_ref, o_ref, *, relu: bool):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    acc = acc * sb_ref[0, :][None, :] + sb_ref[1, :][None, :]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[:] = acc.astype(o_ref.dtype)


def _kernel_res(x_ref, w_ref, sb_ref, r_ref, o_ref, *, relu: bool):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    acc = acc * sb_ref[0, :][None, :] + sb_ref[1, :][None, :]
    acc = acc + r_ref[:].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu",))
def matmul_bn_act(x: jnp.ndarray, w: jnp.ndarray, scale: jnp.ndarray,
                  bias: jnp.ndarray, residual: Optional[jnp.ndarray] = None,
                  relu: bool = True) -> jnp.ndarray:
    """act((x @ w) * scale + bias [+ residual]) with one HBM round-trip.

    x: (R, K); w: (K, N); scale/bias: (N,); residual: (R, N) or None.
    R and N are padded to block multiples internally; K is used whole.
    """
    R, K = x.shape
    K2, N = w.shape
    assert K == K2, (x.shape, w.shape)
    out_dtype = x.dtype

    Rp = _cdiv(R, BLOCK_R) * BLOCK_R
    Np = _cdiv(N, BLOCK_N) * BLOCK_N
    if Rp != R:
        x = jnp.pad(x, ((0, Rp - R), (0, 0)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, Rp - R), (0, 0)))
    if Np != N:
        w = jnp.pad(w, ((0, 0), (0, Np - N)))
        scale = jnp.pad(scale, (0, Np - N))
        bias = jnp.pad(bias, (0, Np - N))
        if residual is not None:
            residual = jnp.pad(residual, ((0, 0), (0, Np - N)))

    sb = jnp.stack([scale.astype(jnp.float32),
                    bias.astype(jnp.float32)])  # (2, Np)

    grid = (Rp // BLOCK_R, Np // BLOCK_N)
    x_spec = pl.BlockSpec((BLOCK_R, K), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((K, BLOCK_N), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    sb_spec = pl.BlockSpec((2, BLOCK_N), lambda i, j: (0, j),
                           memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((BLOCK_R, BLOCK_N), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((Rp, Np), out_dtype)

    flops = 2 * Rp * K * Np
    bytes_accessed = (Rp * K + K * Np + Rp * Np) * x.dtype.itemsize
    # interpret mode lets the CPU test mesh execute the same kernel
    interpret = jax.default_backend() == "cpu"

    if residual is None:
        out = pl.pallas_call(
            functools.partial(_kernel_no_res, relu=relu),
            out_shape=out_shape,
            grid_spec=pl.GridSpec(grid=grid,
                                  in_specs=[x_spec, w_spec, sb_spec],
                                  out_specs=o_spec),
            cost_estimate=pl.CostEstimate(flops=flops,
                                          bytes_accessed=bytes_accessed,
                                          transcendentals=0),
            interpret=interpret,
        )(x, w, sb)
    else:
        r_spec = pl.BlockSpec((BLOCK_R, BLOCK_N), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_kernel_res, relu=relu),
            out_shape=out_shape,
            grid_spec=pl.GridSpec(grid=grid,
                                  in_specs=[x_spec, w_spec, sb_spec, r_spec],
                                  out_specs=o_spec),
            cost_estimate=pl.CostEstimate(flops=flops,
                                          bytes_accessed=bytes_accessed,
                                          transcendentals=0),
            interpret=interpret,
        )(x, w, sb, residual)

    return out[:R, :N]


def conv1x1_bn_act(x: jnp.ndarray, kernel: jnp.ndarray, scale: jnp.ndarray,
                   bias: jnp.ndarray, stride: int = 1,
                   residual: Optional[jnp.ndarray] = None,
                   relu: bool = True) -> jnp.ndarray:
    """Fused 1x1 conv + folded BN + optional residual + ReLU (NHWC).

    x: (B, H, W, Cin); kernel: (1, 1, Cin, Cout) or (Cin, Cout).
    Stride subsamples spatially before the matmul (a strided 1x1 conv reads
    only the kept pixels, so slicing first is FLOP-identical).
    """
    if kernel.ndim == 4:
        kernel = kernel[0, 0]
    if stride > 1:
        x = x[:, ::stride, ::stride, :]
    B, H, W, Cin = x.shape
    rows = x.reshape(B * H * W, Cin)
    res_rows = (residual.reshape(B * H * W, -1)
                if residual is not None else None)
    out = matmul_bn_act(rows, kernel.astype(x.dtype), scale, bias,
                        residual=res_rows, relu=relu)
    return out.reshape(B, H, W, -1)

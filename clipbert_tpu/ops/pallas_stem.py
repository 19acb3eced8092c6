"""Fused ResNet stem Pallas kernel: conv7x7/s2 + frozen-BN + ReLU + maxpool3x3/s2.

Why: the stem is the R50 forward's worst hot spot on TPU — XLA runs the
C_in=3 big-spatial conv at ~10 TF/s and the maxpool `reduce_window` at
~130 GB/s, together ~6 ms of a ~44 ms R50 forward at the MSRVTT bench shape
(128 frames @ 448^2). Both are bandwidth victims: conv writes the full
(B, H/2, W/2, 64) activation to HBM, pool reads it back and writes again.
This kernel keeps the conv activation in VMEM and emits only the pooled
(B, H/4, W/4, 64) output — HBM traffic drops from ~1.3 GB to ~280 MB per
128-frame batch, and the conv itself runs on the MXU as dense matmuls.

Formulation (space-to-depth^3): the input is reorganized into 8x8-pixel
cells, (B, H/8, W/8, 192) — one cell holds exactly 4x4 stride-2 conv
outputs ("phases" (a, b) in 0..3^2). A conv output in phase (a, b) of cell
(I, J) reads input rows 8I + 2a + du - 3 (du in 0..6), i.e. only cells
(I + cv, J + ch) with cv, ch in {-1, 0, 1}. The conv therefore becomes 9
shifted (cells, 192) x (192, N) matmuls, where each term's weight matrix
embeds the 7x7x3 kernel taps that fall in that cell offset, with the
output columns packed over all phases using that offset (N up to 16*64) —
full MXU lanes, no im2col copies.

Mosaic layout discipline: the padded cell grid is flattened host-side to
(B, padded_rows * PC, 192) so each term's (cv, ch) shift becomes ONE flat
dynamic-slice start and the matmul operand needs no in-kernel reshape; the
only reshapes are sublane-aligned (flat -> (rows, PC, 64) with PC % 8 == 0),
and the pooled column parity pair is emitted on the channel axis
(..., W/8, 128) and bitcast-reshaped to (..., W/4, 64) by XLA outside.

STATUS — experimental, NOT wired into any production path: measured on
the v5e bench shape this formulation's 4x FLOP inflation loses to XLA's
native stem (7.4-13.9 ms vs 6.1 ms; see PARITY "measured dead ends"), so
`resnet50_forward` never calls it. It stays as a correctness-tested
(tests/test_pallas_kernels.py, interpret mode) extension point for TPU
generations where the tradeoff flips. Functionally it computes the
reference's detectron2 stem (`grid_feat.py:95`, d2 BasicStem conv1 +
frozen BN + relu + maxpool), inference only (no VJP). The conv
accumulates in fp32 like XLA's conv emitter; pooling is exact (zero
pool-padding is equivalent to the reference's -inf because ReLU outputs
are >= 0 and every window has at least one real element).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# N-columns per matmul chunk (4 phase blocks of 64) — keeps the transient
# (rows, chunk) fp32 result ~1.9 MB at the 448^2 band size
_CHUNK_PHASES = 4


def _phase_spans() -> Dict[int, List[int]]:
    """Which cell offsets cv a phase `a` reads: {(2a + du - 3) // 8}."""
    return {a: sorted({(2 * a + du - 3) // 8 for du in range(7)})
            for a in range(4)}


def _term_layout() -> List[Tuple[int, int, List[Tuple[int, int]]]]:
    """[(cv, ch, [(a, b), ...])] for the 9 shifted matmul terms."""
    spans = _phase_spans()
    terms = []
    for cv in (-1, 0, 1):
        for ch in (-1, 0, 1):
            abs_ = [(a, b)
                    for a in range(4) if cv in spans[a]
                    for b in range(4) if ch in spans[b]]
            if abs_:
                terms.append((cv, ch, abs_))
    return terms


def packed_width() -> int:
    """Total (128-aligned) column count of the packed weight matrix."""
    cols = 0
    for _, _, abs_ in _term_layout():
        cols += -(-64 * len(abs_) // 128) * 128
    return cols


def pack_stem_weights(kernel, scale=None) -> np.ndarray:
    """(7, 7, 3, 64) stem kernel -> (192, packed_width()) term-packed matrix.

    `scale` (64,) folds the frozen-BN multiply into the weights. Host-side
    (numpy) — run once at inference param prep, not under jit.
    """
    k = np.asarray(kernel, np.float32)
    assert k.shape == (7, 7, 3, 64), k.shape
    if scale is not None:
        k = k * np.asarray(scale, np.float32)
    blocks = []
    for cv, ch, abs_ in _term_layout():
        nt = 64 * len(abs_)
        wt = np.zeros((192, nt), np.float32)
        for idx, (a, b) in enumerate(abs_):
            off = idx * 64
            for du in range(7):
                for dv in range(7):
                    cvv, rr = divmod(2 * a + du - 3, 8)
                    chh, cc = divmod(2 * b + dv - 3, 8)
                    if (cvv, chh) != (cv, ch):
                        continue
                    krow = (rr * 8 + cc) * 3
                    wt[krow:krow + 3, off:off + 64] = k[du, dv]
        pad = (-nt) % 128
        if pad:
            wt = np.pad(wt, ((0, 0), (0, pad)))
        blocks.append(wt)
    return np.concatenate(blocks, axis=1)


def s2d3(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/8, W/8, 192) cell layout, channel order
    (row-in-cell, col-in-cell, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 8, w // 8, 64 * c)


def _stem_kernel(x_ref, w_ref, bias_ref, oe_ref, oo_ref, *, band: int,
                 cells_w: int, pc: int):
    g = pl.program_id(1)
    i0 = g * band
    n = (band + 1) * pc

    # phase buffer: cells (i0-1 .. i0+band-1) x (-1 .. pc-4); buffer (r, j)
    # holds cell (i0-1+r, j-1). term (cv, ch) contributes cell (.. + cv,
    # .. + ch): the row shift folds into an ALIGNED flat slice start
    # ((i0+1+cv)*pc, pc % 8 == 0 — Mosaic requires provable sublane
    # alignment); the +-1 column shift becomes a STATIC-offset sublane
    # slice of the fp32 result after the aligned (.., pc, 64) reshape.
    sw = pc - 2
    base: Dict[int, jnp.ndarray] = {}
    for cv in (-1, 0, 1):
        start = pl.multiple_of((i0 + 1 + cv) * pc, pc)
        base[cv] = x_ref[0, pl.ds(start, n), :]
    phases: Dict[Tuple[int, int], jnp.ndarray] = {}
    col = 0
    for cv, ch, abs_ in _term_layout():
        for c0 in range(0, len(abs_), _CHUNK_PHASES):
            chunk = abs_[c0:c0 + _CHUNK_PHASES]
            res = jnp.dot(base[cv],
                          w_ref[:, pl.ds(col + c0 * 64, len(chunk) * 64)],
                          preferred_element_type=jnp.float32)
            res = res.reshape(band + 1, pc, len(chunk) * 64)
            # buffer col j reads result grid col j + 1 + ch
            res = res[:, 1 + ch:1 + ch + sw, :]
            for idx, ab in enumerate(chunk):
                part = res[:, :, idx * 64:(idx + 1) * 64]
                phases[ab] = phases.get(ab, 0.0) + part
        col += -(-64 * len(abs_) // 128) * 128

    # bias + relu + zero out-of-image halo cells (buffer row 0 is a real
    # cell only for g > 0; buffer col 0 is always conv col < 0)
    bias = bias_ref[0, :].astype(jnp.float32)
    row_ok = jnp.logical_or(
        jax.lax.broadcasted_iota(jnp.int32, (band + 1, sw, 64), 0) > 0,
        g > 0)
    col_ok = jax.lax.broadcasted_iota(jnp.int32, (band + 1, sw, 64), 1) > 0
    ok = jnp.logical_and(row_ok, col_ok)
    for ab in phases:
        p = jnp.maximum(phases[ab] + bias, 0.0)
        phases[ab] = jnp.where(ok, p, 0.0)

    # --- maxpool 3x3 stride 2 over the phase layout -----------------------
    # pool row 2I   = max(conv rows 4I-1, 4I, 4I+1) = a3[I-1], a0[I], a1[I]
    # pool row 2I+1 = max(conv rows 4I+1..4I+3)     = a1[I], a2[I], a3[I]
    rowc = {}
    for b in range(4):
        even = jnp.maximum(jnp.maximum(phases[(3, b)][:band],
                                       phases[(0, b)][1:]),
                           phases[(1, b)][1:])
        odd = jnp.maximum(jnp.maximum(phases[(1, b)][1:],
                                      phases[(2, b)][1:]),
                          phases[(3, b)][1:])
        rowc[b] = jnp.stack([even, odd], axis=1)  # (band, 2, pc, 64)

    even = jnp.maximum(jnp.maximum(rowc[3][:, :, :cells_w],
                                   rowc[0][:, :, 1:cells_w + 1]),
                       rowc[1][:, :, 1:cells_w + 1])
    odd = jnp.maximum(jnp.maximum(rowc[1][:, :, 1:cells_w + 1],
                                  rowc[2][:, :, 1:cells_w + 1]),
                      rowc[3][:, :, 1:cells_w + 1])
    # column parities as two outputs (Mosaic rejects the lane-concat);
    # the caller interleaves them into (.., W/4, 64) outside
    oe_ref[:] = even.reshape(1, band * 2, cells_w, 64).astype(oe_ref.dtype)
    oo_ref[:] = odd.reshape(1, band * 2, cells_w, 64).astype(oo_ref.dtype)


def fused_stem_pool(x: jnp.ndarray, w_packed: jnp.ndarray,
                    bias: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) pixels -> (B, H/4, W/4, 64) pooled stem activations.

    x: compute-dtype pixels, H and W divisible by 16.
    w_packed: (192, packed_width()) from :func:`pack_stem_weights`
      (frozen-BN scale already folded in).
    bias: (64,) frozen-BN bias.
    """
    B, H, W, C = x.shape
    assert C == 3 and H % 16 == 0 and W % 16 == 0, x.shape
    cells_h, cells_w = H // 8, W // 8
    # more bands -> smaller per-program fp32 phase buffers (VMEM budget)
    n_bands = next(n for n in (8, 4, 2, 1) if cells_h % n == 0)
    band = cells_h // n_bands
    pc = -(-(cells_w + 4) // 8) * 8   # padded column count, sublane-aligned

    x3 = s2d3(x)
    x3 = jnp.pad(x3, ((0, 0), (2, 2), (2, pc - cells_w - 2), (0, 0)))
    x3 = x3.reshape(B, (cells_h + 4) * pc, 192)
    w_packed = w_packed.astype(x.dtype)
    bias2 = bias.reshape(1, 64).astype(jnp.float32)

    kern = functools.partial(_stem_kernel, band=band, cells_w=cells_w, pc=pc)
    rows = (band + 1) * pc
    flops = 2 * B * n_bands * rows * 192 * w_packed.shape[1]
    bytes_accessed = (x3.size + w_packed.size
                      + B * (H // 4) * (W // 4) * 64) * x.dtype.itemsize
    out_spec = pl.BlockSpec((1, 2 * band, W // 8, 64),
                            lambda b, g: (b, g, 0, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((B, H // 4, W // 8, 64), x.dtype)
    even, odd = pl.pallas_call(
        kern,
        out_shape=(out_sds, out_sds),
        grid_spec=pl.GridSpec(
            grid=(B, n_bands),
            in_specs=[
                pl.BlockSpec((1, (cells_h + 4) * pc, 192),
                             lambda b, g: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((192, w_packed.shape[1]),
                             lambda b, g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 64), lambda b, g: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(out_spec, out_spec),
        ),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=jax.default_backend() == "cpu",
    )(x3, w_packed, bias2)
    # interleave the column parities: (.., W/8, 2, 64) -> (.., W/4, 64)
    out = jnp.stack([even, odd], axis=-2)
    return out.reshape(B, H // 4, W // 4, 64)

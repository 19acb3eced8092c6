"""ResNet-50 grid-feature backbone, TPU-native.

Capability match for the reference's detectron2-based GridFeatBackbone
(`/root/reference/src/modeling/grid_feat.py:37-105`): ResNet-50
stem->res5 with *frozen* BatchNorm and res5 dilation forced to 1
(`grid_feat.py:62-63`), followed by a `grid_encoder` head —
conv3x3(2048->hidden) + 2x2 maxpool + ReLU (`grid_feat.py:43-48`) — emitting
(B, n_frm, H', W', hidden) channels-last grid features (`grid_feat.py:99-105`).

TPU-first design decisions:
 - NHWC layout end-to-end (TPU conv units want channels-last; the reference's
   NCHW + final permute disappears entirely).
 - FrozenBatchNorm is stored as a precomputed per-channel (scale, bias) pair
   (gamma/sqrt(var+eps), beta - mean*scale) applied as a fused multiply-add
   that XLA folds into the conv epilogue. The pairs live in the param pytree
   under "bn" so checkpoints round-trip, and the optimizer freezes them by
   name (the reference's FrozenBatchNorm2d buffers likewise never train).
 - The reference's runtime RGB->BGR flip (`grid_feat.py:92-94`) is folded into
   the stem conv's input-channel order at weight-import time, so the hot path
   never touches it. Our own random init is channel-order agnostic.
 - `stride_in_1x1=True` matches detectron2's caffe-style blocks (stride on the
   1x1 reduce conv); importers from torchvision use False.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

Params = Dict

# (num_blocks, bottleneck_channels, out_channels) per stage res2..res5
R50_STAGES: Tuple[Tuple[int, int, int], ...] = (
    (3, 64, 256), (4, 128, 512), (6, 256, 1024), (3, 512, 2048))

CONV_DIMS = ("NHWC", "HWIO", "NHWC")


def conv2d(x: jnp.ndarray, kernel: jnp.ndarray, stride: int = 1,
           padding="SAME", dilation: int = 1) -> jnp.ndarray:
    # no preferred_element_type: its transpose rule rejects mixed bf16/f32
    # cotangents; XLA already accumulates bf16 convs in fp32 on the MXU.
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride), padding,
        rhs_dilation=(dilation, dilation), dimension_numbers=CONV_DIMS)


def frozen_bn(x: jnp.ndarray, bn: Params) -> jnp.ndarray:
    # params through fold_bn_scales() carry no "scale": the multiply lives
    # in the conv kernel and the BN collapses to a bias add (inference path)
    if "scale" in bn:
        x = x * bn["scale"].astype(x.dtype)
    return x + bn["bias"].astype(x.dtype)


def fold_bn_scales(p: Params) -> Params:
    """Inference-time transform: per-channel frozen-BN scale folded into the
    preceding conv kernel (kernel *= scale; BN becomes a bias-only add).

    Identical to the unfolded forward in real arithmetic — conv(x, W)·s + b
    == conv(x, W·s) + b — and removes a full-activation multiply per conv.
    In the bf16 compute path the rounding point moves (kernel·s rounds once
    at the conv input vs conv output·s), so folded eval logits can differ
    from the unfolded training forward by ~1 bf16 ulp (bounded by
    test_fold_bn_scales_exact). Training keeps the unfolded form so
    checkpoints/optimizer see the reference's geometry.
    """
    def fold(node):
        if not isinstance(node, dict):
            return node
        if "kernel" in node and "bn" in node and "scale" in node["bn"]:
            s = node["bn"]["scale"]
            return {"kernel": node["kernel"] * s.reshape(1, 1, 1, -1),
                    "bn": {"bias": node["bn"]["bias"]}}
        if "conv" in node and "bn" in node and "scale" in node["bn"]:
            # stem layout: {"conv": {"kernel": ...}, "bn": {...}}
            s = node["bn"]["scale"]
            return {"conv": {"kernel":
                             node["conv"]["kernel"] * s.reshape(1, 1, 1, -1)},
                    "bn": {"bias": node["bn"]["bias"]}}
        return {k: ([fold(b) for b in v] if isinstance(v, list) else fold(v))
                for k, v in node.items()}
    return fold(p)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout):
    # He-normal fan_out, matching torch Conv2d(kaiming) closely enough for
    # from-scratch runs; parity runs always import pretrained weights.
    fan_out = kh * kw * cout
    std = (2.0 / fan_out) ** 0.5
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std


def _bn_init(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def _block_init(key, cin, cmid, cout, has_shortcut):
    ks = jax.random.split(key, 4)
    p = {
        "conv1": {"kernel": _conv_init(ks[0], 1, 1, cin, cmid), "bn": _bn_init(cmid)},
        "conv2": {"kernel": _conv_init(ks[1], 3, 3, cmid, cmid), "bn": _bn_init(cmid)},
        "conv3": {"kernel": _conv_init(ks[2], 1, 1, cmid, cout), "bn": _bn_init(cout)},
    }
    if has_shortcut:
        p["shortcut"] = {"kernel": _conv_init(ks[3], 1, 1, cin, cout),
                         "bn": _bn_init(cout)}
    return p


def init_resnet50(key) -> Params:
    keys = jax.random.split(key, 5)
    p: Params = {"stem": {"conv": {"kernel": _conv_init(keys[0], 7, 7, 3, 64)},
                          "bn": _bn_init(64)}}
    cin = 64
    for si, (n, cmid, cout) in enumerate(R50_STAGES):
        bkeys = jax.random.split(keys[si + 1], n)
        blocks: List[Params] = []
        for bi in range(n):
            blocks.append(_block_init(bkeys[bi], cin if bi == 0 else cout,
                                      cmid, cout, has_shortcut=(bi == 0)))
        p[f"res{si + 2}"] = blocks
        cin = cout
    return p


def init_grid_encoder(key, hidden_size: int, in_channels: int = 2048) -> Params:
    # reference conv3x3 uses torch default kaiming-uniform; he-normal is fine
    # for scratch init (pretrained paths import real weights)
    return {"conv": {"kernel": _conv_init(key, 3, 3, in_channels, hidden_size)}}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def bottleneck(x: jnp.ndarray, p: Params, stride: int,
               stride_in_1x1: bool = True, dilation: int = 1,
               use_pallas: bool = False) -> jnp.ndarray:
    if use_pallas:
        return bottleneck_pallas(x, p, stride, stride_in_1x1, dilation)
    # torch-style symmetric padding must be explicit: XLA "SAME" pads (0, 1)
    # for strided 3x3 convs while torch pads (1, 1), shifting the grid.
    s1, s2 = (stride, 1) if stride_in_1x1 else (1, stride)
    pad3 = [(dilation, dilation), (dilation, dilation)]
    sc = x
    if "shortcut" in p and s1 == stride:
        # conv1 and the shortcut are 1x1 convs over the SAME input at the
        # same stride: run them as ONE conv with concatenated output
        # channels — exact, reads the stage input from HBM once instead of
        # twice and tiles the MXU at width cmid+cout instead of cmid
        cmid = p["conv1"]["kernel"].shape[-1]
        merged = jnp.concatenate(
            [p["conv1"]["kernel"], p["shortcut"]["kernel"]], axis=-1)
        both = conv2d(x, merged, stride, padding="VALID")
        out = jax.nn.relu(frozen_bn(both[..., :cmid], p["conv1"]["bn"]))
        sc = frozen_bn(both[..., cmid:], p["shortcut"]["bn"])
    else:
        out = jax.nn.relu(frozen_bn(
            conv2d(x, p["conv1"]["kernel"], s1, padding="VALID"),
            p["conv1"]["bn"]))
        if "shortcut" in p:
            sc = frozen_bn(
                conv2d(x, p["shortcut"]["kernel"], stride, padding="VALID"),
                p["shortcut"]["bn"])
    out = jax.nn.relu(frozen_bn(
        conv2d(out, p["conv2"]["kernel"], s2, padding=pad3, dilation=dilation),
        p["conv2"]["bn"]))
    out = frozen_bn(conv2d(out, p["conv3"]["kernel"], 1, padding="VALID"),
                    p["conv3"]["bn"])
    return jax.nn.relu(out + sc)


def bottleneck_pallas(x: jnp.ndarray, p: Params, stride: int,
                      stride_in_1x1: bool = True,
                      dilation: int = 1) -> jnp.ndarray:
    """Bottleneck with the 1x1 convs (2/3 of the FLOPs) as fused Pallas
    matmul+BN+ReLU(+residual) kernels; the 3x3 stays on XLA's conv emitter.
    Numerically identical to :func:`bottleneck` (same fp32 epilogue)."""
    from clipbert_tpu.ops.pallas_kernels import conv1x1_bn_act

    def sb(bn, cout):
        # fold_bn_scales() removes "scale" (it lives in the conv kernel):
        # the fused epilogue then multiplies by 1
        s = bn.get("scale")
        return (jnp.ones((cout,), jnp.float32) if s is None else s,
                bn["bias"])

    s1, s2 = (stride, 1) if stride_in_1x1 else (1, stride)
    pad3 = [(dilation, dilation), (dilation, dilation)]
    sc1, b1 = sb(p["conv1"]["bn"], p["conv1"]["kernel"].shape[-1])
    out = conv1x1_bn_act(x, p["conv1"]["kernel"], sc1, b1, stride=s1,
                         relu=True)
    out = jax.nn.relu(frozen_bn(
        conv2d(out, p["conv2"]["kernel"], s2, padding=pad3, dilation=dilation),
        p["conv2"]["bn"]))
    if "shortcut" in p:
        scs, bs = sb(p["shortcut"]["bn"], p["shortcut"]["kernel"].shape[-1])
        sc = conv1x1_bn_act(x, p["shortcut"]["kernel"], scs, bs,
                            stride=stride, relu=False)
    else:
        sc = x
    # final 1x1 with the residual add + relu fused into the epilogue
    sc3, b3 = sb(p["conv3"]["bn"], p["conv3"]["kernel"].shape[-1])
    return conv1x1_bn_act(out, p["conv3"]["kernel"], sc3, b3, stride=1,
                          residual=sc, relu=True)


def max_pool(x: jnp.ndarray, window: int, stride: int, padding) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1), padding)


# ---------------------------------------------------------------------------
# space-to-depth stem
# ---------------------------------------------------------------------------
# Optional stem form. Measured on TPU v5e, XLA's native handling of the
# 7x7/s2 C=3 stem (6.1 ms @ B64 448^2) slightly beats this explicit
# space-to-depth form (7.4 ms) — XLA evidently does its own input-channel
# packing — so the default stays off; kept as a tested option for other
# TPU generations. The transform is mathematically identical:
#   y[o,k] = sum_{u,v,c} w[u,v,c,k] x[2o+u-3, ...]   (7x7, stride 2, pad 3)
# with u = 2a + dy - 1 (a in 0..3, dy in 0..1) becomes a 4x4 conv with
# padding (2,1) over X_s2d[i,j,(dy*2+dx)*3+c] = x[2i+dy, 2j+dx, c].

def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (dy, dx, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def stem_s2d_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(7, 7, C, K) stem kernel -> (4, 4, 4C, K) space-to-depth kernel."""
    kh, kw, C, K = kernel.shape
    assert kh == 7 and kw == 7
    k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # zero tap at -4
    k8 = k8.reshape(4, 2, 4, 2, C, K)
    k8 = k8.transpose(0, 2, 1, 3, 4, 5)  # (4, 4, dy, dx, C, K)
    return k8.reshape(4, 4, 4 * C, K)


def resnet50_forward(p: Params, x: jnp.ndarray,
                     stride_in_1x1: bool = True,
                     stem_s2d: bool = False,
                     use_pallas: bool = False,
                     remat=False) -> jnp.ndarray:
    """(B, H, W, 3) preprocessed pixels -> (B, H/32, W/32, 2048) res5 features.

    Equivalent of the reference's `backbone(x)` +
    `roi_heads.get_conv5_features` pipeline (grid_feat.py:95-97) with
    RES5_DILATION=1, i.e. a plain strided res5. ``stem_s2d`` switches the
    stem to the mathematically-identical space-to-depth form (even input
    sizes only); params are shared between both paths.

    ``remat`` trades backward-pass HBM for recompute FLOPs — the
    early-stage activations (e.g. 112^2 x 256 per frame) dominate
    train-step HBM and cap the per-chip batch otherwise (the apex-amp
    reference has no equivalent; this is the TPU-native memory/FLOPs
    dial). Granularities, A/B'd at the train shape (448^2, 64 visuals x 2
    frames, bf16) in scripts/perf_conv_bwd_ab.py — CNN fwd+bwd clips/s:
    no-remat 348 (OOMs the full step at batch>=8), early 317, block 312,
    stage 297; full-step winner is "early" (231.7 vs 221.0 clips/s at
    batch 8, scripts/bench_train_step.py):

      False          — store everything (largest HBM, zero recompute)
      True / "early" — (production default) checkpoint only stem+res2+res3,
                       the big activations; res4/res5 store theirs (small
                       at 1/16, 1/32 scale) and skip the recompute
      "stage"        — `jax.checkpoint` around the stem and every residual
                       stage (smallest HBM short of per-block)
      "block"        — per-bottleneck checkpoints: stores every block
                       boundary, recomputes only intra-block tensors
    """
    assert remat in (False, True, "stage", "block", "early"), remat

    def stem_fn(sp, x):
        if stem_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            h = conv2d(space_to_depth(x), stem_s2d_kernel(sp["conv"]["kernel"]),
                       stride=1, padding=[(2, 1), (2, 1)])
        else:
            h = conv2d(x, sp["conv"]["kernel"], stride=2,
                       padding=[(3, 3), (3, 3)])
        h = jax.nn.relu(frozen_bn(h, sp["bn"]))
        return max_pool(h, 3, 2, [(0, 0), (1, 1), (1, 1), (0, 0)])

    if remat:
        stem_fn = jax.checkpoint(stem_fn)
    h = stem_fn(p["stem"], x)
    for si in range(4):
        stage_stride = 1 if si == 0 else 2
        def block_fn(h, bp, s):
            if remat != "block":
                return bottleneck(h, bp, s, stride_in_1x1=stride_in_1x1,
                                  use_pallas=use_pallas)
            return jax.checkpoint(
                lambda h, bp: bottleneck(h, bp, s,
                                         stride_in_1x1=stride_in_1x1,
                                         use_pallas=use_pallas))(h, bp)

        def stage_fn(blocks, h, _ss=stage_stride, _bf=block_fn):
            for bi, bp in enumerate(blocks):
                h = _bf(h, bp, _ss if bi == 0 else 1)
            return h

        stage_remat = (remat == "stage"
                       or (remat in (True, "early") and si < 2))
        if stage_remat:
            stage_fn = jax.checkpoint(stage_fn)
        h = stage_fn(p[f"res{si + 2}"], h)
    return h


def grid_encoder_forward(p: Params, feat: jnp.ndarray) -> jnp.ndarray:
    """conv3x3 (2048->hidden) + maxpool2x2/2 + ReLU (grid_feat.py:43-48)."""
    h = conv2d(feat, p["conv"]["kernel"], 1, padding=[(1, 1), (1, 1)])
    h = max_pool(h, 2, 2, "VALID")
    return jax.nn.relu(h)


def grid_feat_forward(p: Params, frames: jnp.ndarray,
                      stride_in_1x1: bool = True,
                      remat: bool = False) -> jnp.ndarray:
    """(B, T, H, W, 3) -> (B, T, H/64, W/64, hidden) grid features.

    The frame axis folds into batch for one big conv pipeline (the MXU wants
    batched convs), mirroring the reference's view(B*n_frm, ...) at
    grid_feat.py:90-102 — but already channels-last, no final permute.
    """
    B, T, H, W, C = frames.shape
    x = frames.reshape(B * T, H, W, C)
    feat = resnet50_forward(p["resnet"], x, stride_in_1x1, remat=remat)
    grid = grid_encoder_forward(p["grid_encoder"], feat)
    _, Hg, Wg, D = grid.shape
    return grid.reshape(B, T, Hg, Wg, D)

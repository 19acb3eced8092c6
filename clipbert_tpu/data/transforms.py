"""Host- and device-side data transforms.

Behavioral contracts from the reference:
 - MLM masking 15% / 80-10-10 (`/root/reference/src/datasets/data_utils.py:23-70`)
 - resize longer side -> max_size, bilinear align_corners=False
   (data_utils.py:230-233, get_resize_size :166-197 with int truncation)
 - zero-pad to (max, max) at bottom/right (data_utils.py:112-133 get_padding
   with pad_all=False, :136-160 ImagePad)
 - ImageNorm: mean/std with div-255 guard, applied on the accelerator
   (data_utils.py:256-276; mean ~ImageNet*255 / std 1.0 so no division
   triggers for the standard configs)
 - example grouping chunk_list / mk_input_group (data_utils.py:279-340)

TPU-first split of responsibilities: decode + resize + pad happen on host
(uint8 out, 4x cheaper host->device transfer than fp32), float cast +
normalization happen on device inside the jitted step where XLA fuses them
into the stem conv's input.
"""

from __future__ import annotations

import functools
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# MLM masking (numpy; collator-side)
# ---------------------------------------------------------------------------


def mask_text_tokens(inputs: np.ndarray, special_tokens_mask: np.ndarray,
                     mask_token_id: int, vocab_size: int,
                     rng: np.random.Generator,
                     mlm_probability: float = 0.15,
                     pad_token_id: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """BERT MLM corruption (data_utils.py:23-70). Returns (inputs, labels);
    labels are -100 except at masked positions (original token kept there).

    inputs: (B, L) int array (already padded); modified copy returned.
    special_tokens_mask: (B, L) bool/int — 1 where CLS/SEP/special.
    """
    inputs = inputs.copy()
    labels = inputs.copy()
    prob = np.full(labels.shape, mlm_probability)
    prob[special_tokens_mask.astype(bool)] = 0.0
    prob[labels == pad_token_id] = 0.0
    masked = rng.random(labels.shape) < prob
    labels[~masked] = -100

    # 80%: [MASK]
    replaced = (rng.random(labels.shape) < 0.8) & masked
    inputs[replaced] = mask_token_id
    # 10%: random token
    randomized = (rng.random(labels.shape) < 0.5) & masked & ~replaced
    rand_words = rng.integers(0, vocab_size, labels.shape)
    inputs[randomized] = rand_words[randomized]
    # remaining 10%: keep
    return inputs, labels


# ---------------------------------------------------------------------------
# resize / pad (host; uint8 in, uint8 out)
# ---------------------------------------------------------------------------

def get_resize_size(h: int, w: int, max_size: int) -> Tuple[int, int]:
    """Longer side -> max_size keeping aspect ratio; int truncation exactly
    as the reference (data_utils.py:166-197)."""
    if h >= w:
        new_h = max_size
        new_w = new_h * (w * 1.0 / h)
    else:
        new_w = max_size
        new_h = new_w * (h * 1.0 / w)
    return int(new_h), int(new_w)


def resize_frames(frames: np.ndarray, max_size: int) -> np.ndarray:
    """Bilinear resize, longer side -> max_size, align_corners=False.

    frames: (T, H, W, C) uint8 -> (T, H', W', C) uint8. Uses torch's
    interpolate on host for exact parity with the reference transform
    (data_utils.py:230-233); torch here is a host-side CPU tool only.
    """
    import torch
    T, H, W, C = frames.shape
    new_h, new_w = get_resize_size(H, W, max_size)
    if (new_h, new_w) == (H, W):
        return frames
    if not frames.flags.writeable:   # e.g. mmap-backed store views
        frames = frames.copy()
    t = torch.from_numpy(np.ascontiguousarray(frames)).permute(0, 3, 1, 2)
    t = torch.nn.functional.interpolate(
        t.float(), size=(new_h, new_w), mode="bilinear", align_corners=False)
    out = t.round_().clamp_(0, 255).byte().permute(0, 2, 3, 1).numpy()
    return np.ascontiguousarray(out)


def pad_frames(frames: np.ndarray, max_h: int, max_w: int) -> np.ndarray:
    """Zero-pad (T, H, W, C) at bottom/right to (T, max_h, max_w, C)
    (data_utils.py:112-133, keep image at upper-left corner)."""
    T, H, W, C = frames.shape
    if (H, W) == (max_h, max_w):
        return frames
    out = np.zeros((T, max_h, max_w, C), dtype=frames.dtype)
    out[:, :H, :W] = frames
    return out


def is_extreme_aspect_ratio(h: int, w: int, max_ratio: float = 5.0) -> bool:
    """dataset_base.py:228-233 guard."""
    r = h / float(w)
    return r > max_ratio or r < 1.0 / max_ratio


# ---------------------------------------------------------------------------
# device-side normalization (inside jit)
# ---------------------------------------------------------------------------

# reference configs (RGB order; the RGB->BGR flip is folded into imported
# stem-conv weights, models/resnet.py docstring)
IMAGENET_MEAN_255 = (123.675, 116.28, 103.53)
IMAGENET_STD_1 = (1.0, 1.0, 1.0)


def normalize_pixels(frames: jnp.ndarray,
                     mean: Sequence[float] = IMAGENET_MEAN_255,
                     std: Sequence[float] = IMAGENET_STD_1,
                     compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """uint8 (..., H, W, 3) -> normalized compute-dtype pixels.

    Matches ImageNorm (data_utils.py:256-276) incl. the div-255 guard:
    values >1 with a <=1 mean are first scaled to [0,1].
    """
    x = frames.astype(jnp.float32)
    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    if max(mean) <= 1.0:
        x = x / 255.0
    x = (x - mean_a) / std_a
    return x.astype(compute_dtype)


# ---------------------------------------------------------------------------
# device-resident resize + pad + normalize (inside jit)
# ---------------------------------------------------------------------------
#
# TPU-first formulation: bilinear resize is two small matmuls per frame,
#   out = R_h @ frame @ R_w^T
# where R_h (S, Hbuf) / R_w (S, Wbuf) are per-item interpolation matrices
# built IN-JIT from dynamic source sizes (arrays, not shapes) — so one
# compiled program serves every video resolution that shares a physical
# buffer bucket. Rows past the per-item resize target are all-zero, which
# realizes the reference's bottom/right zero-pad (data_utils.py:112-160)
# for free. The contraction runs on the MXU; there are no gathers and no
# data-dependent shapes. The reference keeps frames as FLOAT after resize
# (dataset_base.py:207-275: .float() -> interpolate -> pad -> GPU ImageNorm),
# so this float-through path matches its semantics more closely than the
# host path above (which re-rounds to uint8 to cheapen the H2D transfer).


def _resize_weights(src, new, out_size: int, buf_size: int) -> jnp.ndarray:
    """(B,) int src sizes + (B,) int resize targets -> (B, out_size, buf_size)
    fp32 bilinear weights with torch `interpolate(..., align_corners=False)`
    semantics (half-pixel centers, lower clamp to 0, edge replicate at the
    top end), zero rows for i >= new (the pad region)."""
    srcf = src.astype(jnp.float32)[:, None]
    newf = new.astype(jnp.float32)[:, None]
    i = jnp.arange(out_size, dtype=jnp.float32)[None, :]
    pos = (i + 0.5) * (srcf / newf) - 0.5
    pos = jnp.clip(pos, 0.0, srcf - 1.0)          # (B, out)
    k = jnp.arange(buf_size, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, :, None] - k[None, None, :]))
    return jnp.where((i < newf)[:, :, None], w, 0.0)


def resize_pad_normalize(frames: jnp.ndarray, src_hw: jnp.ndarray,
                         out_size: int,
                         mean: Sequence[float] = IMAGENET_MEAN_255,
                         std: Sequence[float] = IMAGENET_STD_1,
                         compute_dtype=jnp.bfloat16,
                         exact: bool = False) -> jnp.ndarray:
    """Device resize (longer side -> out_size) + zero-pad + ImageNorm.

    frames: (B, T, Hbuf, Wbuf, 3) uint8 — native-size frames packed into a
        per-batch buffer bucket (see `collate_visual`).
    src_hw: (B, 4) int32 — [native_h, native_w, new_h, new_w] per item; the
        resize targets are host-computed by `get_resize_size` so the int
        truncation is bit-identical to the reference (data_utils.py:166-197).
    Returns (B, T, out_size, out_size, 3) in compute_dtype, normalized.

    exact=False (production): single-pass bf16 MXU contractions with fp32
    accumulation. uint8 pixel values are exactly representable in bf16;
    only the interpolation weights round (<=0.4%), bounding the error at
    ~1 pixel unit — the same order as the bf16 cast every model input
    undergoes anyway, and comparable to the reference host path's uint8
    re-rounding. exact=True (parity oracle / tests): fp32-highest, which
    costs ~6x the MXU passes — measured to dominate the whole data plane
    if used in production (scripts/bench_dataplane.py).
    """
    B, T, Hb, Wb, C = frames.shape
    rh = _resize_weights(src_hw[:, 0], src_hw[:, 2], out_size, Hb)
    rw = _resize_weights(src_hw[:, 1], src_hw[:, 3], out_size, Wb)
    if exact:
        x = frames.astype(jnp.float32)
        x = jnp.einsum("bih,bthwc->btiwc", rh, x, precision="highest")
        x = jnp.einsum("bjw,btiwc->btijc", rw, x, precision="highest")
    else:
        x = frames.astype(jnp.bfloat16)
        x = jnp.einsum("bih,bthwc->btiwc", rh.astype(jnp.bfloat16), x,
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)
        x = jnp.einsum("bjw,btiwc->btijc", rw.astype(jnp.bfloat16), x,
                       preferred_element_type=jnp.float32)
    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    if max(mean) <= 1.0:
        x = x / 255.0
    x = (x - mean_a) / std_a
    return x.astype(compute_dtype)


@functools.lru_cache(maxsize=None)
def _preprocess_jit(out_size: int, mean: tuple, std: tuple, dtype_name: str,
                    exact: bool):
    dtype = jnp.dtype(dtype_name)
    return jax.jit(functools.partial(resize_pad_normalize, out_size=out_size,
                                     mean=mean, std=std,
                                     compute_dtype=dtype, exact=exact))


def device_preprocess(frames, src_hw, out_size: int, mean=IMAGENET_MEAN_255,
                      std=IMAGENET_STD_1, compute_dtype=jnp.bfloat16,
                      exact: bool = False):
    """Jitted entry: one compiled program per (bucket shape, out_size).
    Inputs may be host numpy or committed (sharded) device arrays; output
    sharding follows the batch axis."""
    fn = _preprocess_jit(int(out_size), tuple(mean), tuple(std),
                         jnp.dtype(compute_dtype).name, bool(exact))
    return fn(frames, src_hw)


_BUCKET = 64   # buffer rounding granularity: bounds preprocess recompiles


def collate_visual(batch: List[Dict]) -> Tuple[np.ndarray,
                                               Optional[np.ndarray]]:
    """Stack per-item visuals for a batch.

    Host-preprocessed items ({"vis": (T,S,S,3)}) stack directly. Native
    items ({"vis": (T,H,W,3), "vis_hw": (4,) int32}) are packed into a
    zero buffer bucket (max size rounded up to 64) for the device resize
    path; returns (buffer, (B,4) src_hw) in that case, else (stack, None).
    """
    if "vis_hw" not in batch[0]:
        return np.stack([d["vis"] for d in batch]), None
    vis = [d["vis"] for d in batch]
    hw = np.stack([d["vis_hw"] for d in batch]).astype(np.int32)
    Hb = -(-max(v.shape[1] for v in vis) // _BUCKET) * _BUCKET
    Wb = -(-max(v.shape[2] for v in vis) // _BUCKET) * _BUCKET
    T = vis[0].shape[0]
    buf = np.zeros((len(vis), T, Hb, Wb, vis[0].shape[3]), vis[0].dtype)
    for i, v in enumerate(vis):
        assert v.shape[0] == T, "clip count must be uniform within a batch"
        buf[i, :, :v.shape[1], :v.shape[2]] = v
    return buf, hw


# ---------------------------------------------------------------------------
# example grouping
# ---------------------------------------------------------------------------

def chunk_list(examples: List, chunk_size: int = 2,
               pad_to_divisible: bool = True,
               rng: Optional[random.Random] = None) -> List[List]:
    """data_utils.py:279-304: split into chunks, optionally padding the tail
    with random repeats so every chunk has exactly chunk_size items."""
    examples = list(examples)
    n = len(examples)
    remainder = n % chunk_size
    if pad_to_divisible and remainder > 0:
        picker = rng if rng is not None else random
        examples = examples + picker.choices(examples, k=chunk_size - remainder)
        n = len(examples)
        remainder = 0
    n_chunks = n // chunk_size + (1 if remainder > 0 else 0)
    return [examples[i * chunk_size:(i + 1) * chunk_size]
            for i in range(n_chunks)]


def mk_input_group(key_grouped_examples: Dict, max_n_example_per_group: int = 2,
                   is_train: bool = True,
                   example_unique_key: Optional[str] = None,
                   rng: Optional[random.Random] = None) -> List[Tuple]:
    """data_utils.py:307-341: (id, [examples]) groups of at most
    max_n_example_per_group texts per visual; train groups padded to exactly
    that size. With example_unique_key, asserts no example was dropped."""
    input_groups = []
    for k, examples in key_grouped_examples.items():
        for c in chunk_list(examples, max_n_example_per_group,
                            pad_to_divisible=is_train, rng=rng):
            input_groups.append((k, c))
    if example_unique_key is not None:
        inp = {e[example_unique_key]
               for exs in key_grouped_examples.values() for e in exs}
        out = {e[example_unique_key] for _, exs in input_groups for e in exs}
        assert inp == out, "example grouping dropped examples"
    return input_groups

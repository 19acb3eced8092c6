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

import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

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

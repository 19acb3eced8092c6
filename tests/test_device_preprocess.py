"""Device-resident resize/pad/normalize vs the reference transform.

The reference pipeline is decode -> .float() -> torch interpolate bilinear
align_corners=False -> bottom/right zero-pad -> (GPU) ImageNorm
(`/root/reference/src/datasets/dataset_base.py:207-275`,
`src/datasets/data_utils.py:112-233`). The device path
(transforms.resize_pad_normalize) must match that float pipeline; the host
path (resize_frames, which re-rounds to uint8 for cheap H2D) is the looser
oracle.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from clipbert_tpu.data import transforms


def torch_reference(frames: np.ndarray, max_size: int,
                    mean=transforms.IMAGENET_MEAN_255,
                    std=transforms.IMAGENET_STD_1) -> np.ndarray:
    """The reference float pipeline, verbatim semantics (torch on host)."""
    import torch
    t = torch.from_numpy(frames.astype(np.float32)).permute(0, 3, 1, 2)
    h, w = frames.shape[1:3]
    nh, nw = transforms.get_resize_size(h, w, max_size)
    t = torch.nn.functional.interpolate(t, size=(nh, nw), mode="bilinear",
                                        align_corners=False)
    out = torch.zeros((t.shape[0], 3, max_size, max_size))
    out[:, :, :nh, :nw] = t
    out = out.permute(0, 2, 3, 1).numpy()
    m = np.asarray(mean, np.float32)
    s = np.asarray(std, np.float32)
    if max(mean) <= 1.0:
        out = out / 255.0
    return (out - m) / s


SIZES = [(480, 640), (640, 480), (224, 224), (113, 157), (76, 112), (50, 50)]


@pytest.mark.parametrize("hw", SIZES)
def test_resize_pad_normalize_matches_torch(hw):
    h, w = hw
    S = 224
    rng = np.random.default_rng(hash(hw) % 2**32)
    frames = rng.integers(0, 256, (2, h, w, 3), dtype=np.uint8)

    ref = torch_reference(frames, S)

    nh, nw = transforms.get_resize_size(h, w, S)
    Hb = -(-h // 64) * 64
    Wb = -(-w // 64) * 64
    buf = np.zeros((1, 2, Hb, Wb, 3), np.uint8)
    buf[0, :, :h, :w] = frames
    src_hw = np.array([[h, w, nh, nw]], np.int32)
    got = np.asarray(transforms.device_preprocess(
        buf, src_hw, S, compute_dtype=jnp.float32, exact=True))[0]
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=0)

    # production fast path (bf16 single-pass): bounded by ~1 pixel unit,
    # the same order as the model's own bf16 input cast
    fast = np.asarray(transforms.device_preprocess(
        buf, src_hw, S, compute_dtype=jnp.float32))[0]
    assert np.max(np.abs(fast - got)) <= 1.5


def test_identity_resize_is_exact():
    """(S, S) input: the weight matrices are a permutation-free identity, so
    the device path must equal direct normalization bit-for-bit in fp32."""
    S = 128
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (1, 3, S, S, 3), dtype=np.uint8)
    src_hw = np.array([[S, S, S, S]], np.int32)
    got = np.asarray(transforms.device_preprocess(
        frames, src_hw, S, compute_dtype=jnp.float32))
    want = np.asarray(transforms.normalize_pixels(
        jnp.asarray(frames), compute_dtype=jnp.float32))
    np.testing.assert_array_equal(got, want)


def test_host_and_device_paths_agree_within_rounding():
    """Host path re-rounds the resized frame to uint8; device path keeps
    float. Agreement bound: 0.5 pixel-unit / std."""
    h, w, S = 300, 400, 224
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (2, h, w, 3), dtype=np.uint8)

    hosted = transforms.pad_frames(
        transforms.resize_frames(frames, S), S, S)
    host_out = np.asarray(transforms.normalize_pixels(
        jnp.asarray(hosted), compute_dtype=jnp.float32))

    nh, nw = transforms.get_resize_size(h, w, S)
    Hb, Wb = 320, 448
    buf = np.zeros((1, 2, Hb, Wb, 3), np.uint8)
    buf[0, :, :h, :w] = frames
    dev_out = np.asarray(transforms.device_preprocess(
        buf, np.array([[h, w, nh, nw]], np.int32), S,
        compute_dtype=jnp.float32, exact=True))[0]

    assert np.max(np.abs(dev_out - host_out)) <= 0.51


def test_collate_visual_native_packing():
    items = [
        {"vis": np.full((3, 100, 200, 3), 7, np.uint8),
         "vis_hw": np.array([100, 200, 112, 224], np.int32)},
        {"vis": np.full((3, 130, 90, 3), 9, np.uint8),
         "vis_hw": np.array([130, 90, 224, 155], np.int32)},
    ]
    buf, hw = transforms.collate_visual(items)
    assert buf.shape == (2, 3, 192, 256, 3)      # max rounded up to 64
    assert hw.shape == (2, 4)
    assert (buf[0, :, :100, :200] == 7).all()
    assert (buf[0, :, 100:, :] == 0).all() and (buf[0, :, :, 200:] == 0).all()
    assert (buf[1, :, :130, :90] == 9).all()
    assert (buf[1, :, :, 90:] == 0).all()


def test_collate_visual_host_path_stacks():
    items = [{"vis": np.zeros((2, 8, 8, 3), np.uint8)} for _ in range(4)]
    buf, hw = transforms.collate_visual(items)
    assert buf.shape == (4, 2, 8, 8, 3) and hw is None


def test_dataset_emits_native_items(tmp_path):
    """BaseDataset(device_preprocess=True) skips host resize and reports the
    reference-exact resize target in vis_hw."""
    from clipbert_tpu.data.datasets import BaseDataset

    class _Store:
        def get(self, key):
            import io
            from PIL import Image
            img = Image.fromarray(
                np.random.default_rng(3).integers(
                    0, 256, (120, 180, 3), np.uint8).astype(np.uint8))
            b = io.BytesIO()
            img.save(b, "PNG")
            return b.getvalue()

    ds = BaseDataset([("x", [])], tokenizer=None, media_store=_Store(),
                     max_img_size=224, device_preprocess=True)
    arr = ds.load_image("x")
    assert arr.shape == (1, 120, 180, 3)
    item = ds.vis_item(arr)
    np.testing.assert_array_equal(
        item["vis_hw"],
        np.array([120, 180] + list(transforms.get_resize_size(120, 180, 224)),
                 np.int32))

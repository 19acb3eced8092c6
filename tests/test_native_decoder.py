"""Native C++ FFmpeg decoder tests.

Builds `native/libclipbert_data.so` if missing (make -C native), generates a
real mp4 with the library's own test encoder (per-frame luma ramp markers),
and validates probe/selective-decode/clip-sampling through the unified
`clipbert_tpu.data.video` interface. Skips cleanly when the FFmpeg dev
toolchain is absent.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
LIB = os.path.join(NATIVE_DIR, "libclipbert_data.so")


@pytest.fixture(scope="module")
def native_lib():
    if not os.path.exists(LIB):
        try:
            subprocess.run(["make", "-C", NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            pytest.skip("native toolchain unavailable")
    lib = ctypes.CDLL(LIB)
    lib.venc_make_test_video.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double]
    return lib


@pytest.fixture(scope="module")
def mp4_bytes(native_lib, tmp_path_factory):
    path = tmp_path_factory.mktemp("vid") / "ramp.mp4"
    rc = native_lib.venc_make_test_video(str(path).encode(), 64, 48, 25, 12.5)
    assert rc == 0
    return path.read_bytes()


def test_native_probe(mp4_bytes):
    from clipbert_tpu.data import video
    assert video.native_available()
    fps, n = video.probe(mp4_bytes)
    assert fps == 12.5
    assert n == 25


def test_native_selective_decode_markers(mp4_bytes):
    """Frame t carries luma 16 + 220*t/24; verify exact frame selection."""
    from clipbert_tpu.data import video
    out = video.decode_indices(mp4_bytes, np.array([0, 12, 24]))
    assert out.shape == (3, 48, 64, 3)
    means = out.mean(axis=(1, 2, 3))
    assert means[0] < 15          # dark start
    assert 110 < means[1] < 145   # midpoint
    assert means[2] > 230         # bright end
    # order preserved for unsorted requests
    rev = video.decode_indices(mp4_bytes, np.array([24, 0]))
    assert rev[0].mean() > 230 and rev[1].mean() < 15


def test_native_out_of_range_clamps(mp4_bytes):
    from clipbert_tpu.data import video
    out = video.decode_indices(mp4_bytes, np.array([999]))
    assert out is not None
    assert out[0].mean() > 230  # clamped to the final frame


def test_native_clip_sampling_strategies(mp4_bytes):
    from clipbert_tpu.data import video
    rng = np.random.default_rng(0)
    start = video.decode_clip(mp4_bytes, 2, target_fps=12.5,
                              sampling_strategy="start", rng=rng)
    end = video.decode_clip(mp4_bytes, 2, target_fps=12.5,
                            sampling_strategy="end", rng=rng)
    assert start.mean() < end.mean()  # later clip is brighter
    multi = video.decode_multi_clips(mp4_bytes, 2, 12.5, num_clips=4)
    assert multi.shape == (8, 48, 64, 3)
    # clips are temporally ordered under the uniform split
    clip_means = multi.reshape(4, 2, -1).mean(-1).mean(-1)
    assert (np.diff(clip_means) > 0).all()


def test_native_through_dataset(native_lib, tmp_path):
    """mp4 -> CBPK store -> VideoRetrievalTrainDataset (full host path)."""
    from clipbert_tpu.data import datasets, store, tokenization
    path = tmp_path / "v.mp4"
    assert native_lib.venc_make_test_video(str(path).encode(), 64, 48, 20,
                                           10.0) == 0
    p = str(tmp_path / "m.cbpk")
    with store.PackWriter(p) as w:
        w.put("vidA", path.read_bytes())
    vocab = tmp_path / "vocab.txt"
    tokenization.write_tiny_vocab(str(vocab), ["cat"])
    tok = tokenization.BertTokenizer(str(vocab))
    ds = datasets.VideoRetrievalTrainDataset(
        [("vidA", [{"txt": "cat", "id": 0}])], tok, store.open_store(p),
        num_frm=2, fps=5, max_img_size=64, itm_neg_size=0,
        ensemble_n_clips=2, seed=0)
    item = ds[0]
    assert item["vis"].shape == (4, 64, 64, 3)


def test_native_corrupt_input_fails_cleanly(native_lib, mp4_bytes):
    from clipbert_tpu.data import video
    # truncated container: probe/decode return None instead of crashing
    assert video.probe(mp4_bytes[:100]) is None or True  # must not raise
    assert video.decode_clip(mp4_bytes[:100], 2, 5) is None
    assert video.decode_clip(b"\x00" * 64, 2, 5) is None


def test_native_seek_exact_on_long_video(native_lib, tmp_path):
    """Keyframe seek recovers exact frame indices on a long video (the
    reference's PTS-seek behavior, decoder.py:83-86)."""
    from clipbert_tpu.data import video
    path = tmp_path / "long.mp4"
    assert native_lib.venc_make_test_video(str(path).encode(), 64, 48, 240,
                                           24.0) == 0
    data = path.read_bytes()
    assert video.probe(data) == (24.0, 240)
    out = video.decode_indices(data, np.array([0, 100, 200, 239]))
    means = out.mean(axis=(1, 2, 3))
    expected = (np.array([16 + 220 * t / 239 for t in [0, 100, 200, 239]])
                - 16) * 255.0 / 219.0
    np.testing.assert_allclose(means, expected, atol=8)

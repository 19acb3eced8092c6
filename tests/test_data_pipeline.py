"""Data-plane unit tests: sampling math vs the reference semantics,
MLM masking statistics, resize/pad parity, grouping, tokenizer, stores,
and the JSEQ video container."""

import os
import random

import numpy as np
import pytest

from clipbert_tpu.data import sampling, store, tokenization, transforms, video


# ---------------------------------------------------------------------------
# sampling math (reference decoder.py:11-60)
# ---------------------------------------------------------------------------

def ref_get_start_end_idx(video_size, clip_size, clip_idx, num_clips):
    delta = max(video_size - clip_size, 0)
    start_idx = delta * clip_idx / num_clips
    return start_idx, start_idx + clip_size - 1


def ref_temporal_sampling(n, start, end, num):
    import torch
    index = torch.linspace(start, end, num)
    return torch.clamp(index, 0, n - 1).long().numpy()


def test_get_start_end_idx_uniform_matches_reference():
    for vs, cs, ci, nc in [(300, 20, 0, 3), (300, 20, 2, 3), (100, 150, 1, 4),
                           (57, 13.4, 3, 7)]:
        got = sampling.get_start_end_idx(vs, cs, ci, nc)
        want = ref_get_start_end_idx(vs, cs, ci, nc)
        np.testing.assert_allclose(got, want)


def test_get_start_end_idx_random_in_range():
    rng = np.random.default_rng(0)
    for _ in range(50):
        s, e = sampling.get_start_end_idx(100, 30, -1, 1, rng)
        assert 0 <= s <= 70
        np.testing.assert_allclose(e - s, 29)


def test_temporal_sampling_matches_torch_linspace():
    for n, s, e, k in [(30, 0, 29, 3), (30, 5.5, 20.4, 4), (10, 0, 40, 6),
                       (5, 0, 4, 1)]:
        got = sampling.temporal_sampling_indices(n, s, e, k)
        want = ref_temporal_sampling(n, s, e, k)
        np.testing.assert_array_equal(got, want)


def test_plan_clip_uniform_strategy_whole_video():
    # uniform = num_frames equally spaced over whole video (docstring
    # dataset_base.py:88-97: 30 frames, 3 samples -> [0, 14, 29])
    plan = sampling.plan_clip(30, fps=30, num_frames=3, target_fps=3,
                              sampling_strategy="uniform")
    np.testing.assert_array_equal(plan.indices, [0, 14, 29])
    plan1 = sampling.plan_clip(30, fps=30, num_frames=1, target_fps=3,
                               sampling_strategy="uniform")
    np.testing.assert_array_equal(plan1.indices, [0])


def test_plan_clip_start_middle_end():
    # docstring dataset_base.py:112-114: num_frames=3, 30-frame video @30fps,
    # target 3fps -> clip_size 30*3/3... reference example assumes
    # target_fps=30: samples [0,1,2]/[9,10,11]/[18,19,20] with clip_size=3
    for strat, want in [("start", [0, 1, 2]), ("middle", [9, 10, 11]),
                        ("end", [18, 19, 20])]:
        plan = sampling.plan_clip(30, fps=30, num_frames=3, target_fps=30,
                                  sampling_strategy=strat)
        np.testing.assert_array_equal(plan.indices, want)


def test_plan_clip_fps_retargeting():
    # 60fps video, target 30: clip covers 2x frames
    plan = sampling.plan_clip(600, fps=60, num_frames=4, target_fps=30,
                              num_clips=2, clip_idx=0)
    assert plan.indices[-1] - plan.indices[0] == 7 - 0  # clip_size 8 frames
    plan_rate = sampling.plan_clip(600, fps=30, num_frames=4, target_fps=30,
                                   num_clips=2, clip_idx=0)
    assert plan_rate.indices[-1] - plan_rate.indices[0] == 3


def test_plan_multi_clips_uniform_split():
    plans = sampling.plan_multi_clips(100, fps=10, num_frames=2,
                                      target_fps=10, num_clips=4)
    starts = [p.indices[0] for p in plans]
    assert starts == sorted(starts)
    assert len(plans) == 4


# ---------------------------------------------------------------------------
# MLM masking (reference data_utils.py:23-70)
# ---------------------------------------------------------------------------

def test_mask_text_tokens_stats_and_labels():
    rng = np.random.default_rng(0)
    B, L, V = 200, 30, 1000
    inputs = rng.integers(5, V, (B, L)).astype(np.int64)
    special = np.zeros((B, L), np.int64)
    special[:, 0] = 1
    masked_inputs, labels = transforms.mask_text_tokens(
        inputs, special, mask_token_id=4, vocab_size=V, rng=rng,
        pad_token_id=0)
    # special positions never masked
    assert (labels[:, 0] == -100).all()
    masked = labels != -100
    rate = masked.mean()
    assert 0.12 < rate < 0.18, rate  # ~15%
    # labels hold ORIGINAL tokens at masked positions
    np.testing.assert_array_equal(labels[masked], inputs[masked])
    # ~80% of masked positions became [MASK]
    frac_mask = (masked_inputs[masked] == 4).mean()
    assert 0.72 < frac_mask < 0.88, frac_mask
    # unmasked positions unchanged
    np.testing.assert_array_equal(masked_inputs[~masked], inputs[~masked])


# ---------------------------------------------------------------------------
# resize / pad (reference data_utils.py:112-233)
# ---------------------------------------------------------------------------

def test_get_resize_size_matches_reference():
    # reference: height >= width -> new_height = max, width scaled, int trunc
    assert transforms.get_resize_size(480, 640, 448) == (336, 448)
    assert transforms.get_resize_size(640, 480, 448) == (448, 336)
    assert transforms.get_resize_size(100, 100, 448) == (448, 448)
    assert transforms.get_resize_size(99, 101, 50) == (49, 50)


def test_resize_matches_torch_interpolate():
    import torch
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (2, 48, 64, 3), np.uint8)
    out = transforms.resize_frames(frames, 32)
    t = torch.from_numpy(frames).permute(0, 3, 1, 2).float()
    want = torch.nn.functional.interpolate(
        t, size=(24, 32), mode="bilinear", align_corners=False)
    got = out.astype(np.float32).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want.numpy(), atol=0.501)  # round-to-u8


def test_pad_bottom_right():
    frames = np.ones((1, 3, 4, 3), np.uint8) * 7
    out = transforms.pad_frames(frames, 6, 6)
    assert out.shape == (1, 6, 6, 3)
    assert (out[:, :3, :4] == 7).all()
    assert (out[:, 3:, :] == 0).all() and (out[:, :, 4:] == 0).all()


def test_normalize_pixels_matches_reference_imagenorm():
    import jax.numpy as jnp
    rng = np.random.default_rng(2)
    x = rng.integers(0, 256, (2, 1, 8, 8, 3), np.uint8)
    out = transforms.normalize_pixels(jnp.asarray(x), compute_dtype=jnp.float32)
    want = x.astype(np.float32) - np.array(transforms.IMAGENET_MEAN_255)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)
    # div-255 guard: mean <= 1 triggers scaling
    out2 = transforms.normalize_pixels(
        jnp.asarray(x), mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
        compute_dtype=jnp.float32)
    want2 = (x.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(np.asarray(out2), want2, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# grouping (reference data_utils.py:279-341)
# ---------------------------------------------------------------------------

def test_chunk_list():
    r = random.Random(0)
    chunks = transforms.chunk_list([3, 4, 5, 6, 7], 2, True, rng=r)
    assert [c[:2] for c in chunks][:2] == [[3, 4], [5, 6]]
    assert len(chunks) == 3 and len(chunks[2]) == 2 and chunks[2][0] == 7
    assert transforms.chunk_list([3, 4, 5], 2, False) == [[3, 4], [5]]


def test_mk_input_group():
    groups = transforms.mk_input_group(
        {"v1": [{"id": 1}, {"id": 2}, {"id": 3}], "v2": [{"id": 4}]},
        max_n_example_per_group=2, is_train=True, example_unique_key="id")
    sizes = {len(exs) for _, exs in groups}
    assert sizes == {2}
    keys = [k for k, _ in groups]
    assert keys.count("v1") == 2 and keys.count("v2") == 1
    # eval: no padding
    groups_ev = transforms.mk_input_group(
        {"v1": [{"id": 1}, {"id": 2}, {"id": 3}]}, 2, is_train=False)
    assert [len(e) for _, e in groups_ev] == [2, 1]


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

def test_tokenizer_roundtrip(tmp_path):
    vocab = tmp_path / "vocab.txt"
    tokenization.write_tiny_vocab(str(vocab), extra_tokens=["hello",
                                                            "wor", "##ld"])
    tok = tokenization.BertTokenizer(str(vocab))
    # greedy longest-match wordpiece: "world" not in vocab -> "wor"+"##ld"
    assert tok.tokenize("Hello, world!") == ["hello", ",", "wor", "##ld", "!"]
    enc = tok.batch_encode(["hello world", "hello"], max_length=6)
    assert enc["input_ids"].shape == (2, 6)
    ids0 = enc["input_ids"][0]
    assert ids0[0] == tok.cls_token_id
    assert tok.sep_token_id in ids0
    # special mask covers CLS, SEP, and padding
    assert enc["special_tokens_mask"][1].sum() == 6 - 1  # only "hello" is 0
    assert (enc["attention_mask"][1] == [1, 1, 1, 0, 0, 0]).all()


def test_tokenizer_truncation(tmp_path):
    vocab = tmp_path / "vocab.txt"
    tokenization.write_tiny_vocab(str(vocab), extra_tokens=["a"])
    tok = tokenization.BertTokenizer(str(vocab))
    ids = tok.encode("a " * 50, max_length=8)
    assert len(ids) == 8
    assert ids[-1] == tok.sep_token_id


# ---------------------------------------------------------------------------
# stores
# ---------------------------------------------------------------------------

def test_pack_store_roundtrip(tmp_path):
    p = str(tmp_path / "media.cbpk")
    with store.PackWriter(p) as w:
        w.put("vid1", b"hello")
        w.put("vid2", b"\x00\x01\x02" * 100)
    s = store.open_store(p)
    assert isinstance(s, store.PackStore)
    assert bytes(s.get("vid1")) == b"hello"
    assert bytes(s.get("vid2")) == b"\x00\x01\x02" * 100
    assert s.get("nope") is None
    assert sorted(s.keys()) == ["vid1", "vid2"]
    s.close()


def test_file_store(tmp_path):
    (tmp_path / "a.jpg").write_bytes(b"imgdata")
    s = store.open_store(str(tmp_path))
    assert isinstance(s, store.FileStore)
    assert s.get("a") == b"imgdata"


# ---------------------------------------------------------------------------
# JSEQ video container
# ---------------------------------------------------------------------------

def synthetic_video(n_frames=30, h=32, w=48, fps=30.0, seed=0):
    rng = np.random.default_rng(seed)
    # smooth gradient frames so JPEG round-trips closely
    frames = np.zeros((n_frames, h, w, 3), np.uint8)
    for t in range(n_frames):
        frames[t, :, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        frames[t, :, :, 1] = int(255 * t / max(n_frames - 1, 1))
        frames[t, :, :, 2] = 128
    return video.encode_jseq_from_array(frames, fps, quality=95), frames


def test_jseq_probe_and_selective_decode():
    blob, frames = synthetic_video()
    fps, n = video.probe(blob)
    assert fps == 30.0 and n == 30
    out = video.decode_indices(blob, np.array([0, 15, 29]))
    assert out.shape == (3, 32, 48, 3)
    # green channel encodes time: verify the right frames were picked
    for i, t in enumerate([0, 15, 29]):
        assert abs(int(out[i, 5, 5, 1]) - int(frames[t, 5, 5, 1])) < 12


def test_decode_clip_strategies():
    blob, _ = synthetic_video()
    rng = np.random.default_rng(0)
    for strat in ["rand", "uniform", "start", "middle", "end"]:
        out = video.decode_clip(blob, num_frames=2, target_fps=30,
                                sampling_strategy=strat, rng=rng)
        assert out is not None and out.shape == (2, 32, 48, 3)
    multi = video.decode_multi_clips(blob, num_frames=2, target_fps=30,
                                     num_clips=4)
    assert multi.shape == (8, 32, 48, 3)


def test_decode_clip_bad_data_returns_none():
    assert video.decode_clip(b"notavideo" * 10, 2, 30) is None


# ---------------------------------------------------------------------------
# edge cases
# ---------------------------------------------------------------------------

def test_plan_clip_video_shorter_than_clip():
    """Video shorter than the requested clip: indices clamp and repeat
    (reference temporal_sampling clamps to len-1, decoder.py:11-28)."""
    plan = sampling.plan_clip(3, fps=30, num_frames=8, target_fps=3,
                              num_clips=1, clip_idx=0)
    assert plan.indices.min() >= 0 and plan.indices.max() <= 2
    assert len(plan.indices) == 8


def test_plan_clip_single_frame_video():
    plan = sampling.plan_clip(1, fps=30, num_frames=4, target_fps=3,
                              sampling_strategy="uniform")
    np.testing.assert_array_equal(plan.indices, [0, 0, 0, 0])


def test_decode_clip_requests_beyond_length():
    blob, _ = synthetic_video(n_frames=5)
    out = video.decode_clip(blob, num_frames=8, target_fps=60,
                            sampling_strategy="uniform")
    assert out.shape[0] == 8  # clamped repeats


def test_mask_text_tokens_all_special_rows():
    rng = np.random.default_rng(0)
    inputs = np.full((4, 6), 7, np.int64)
    special = np.ones((4, 6), np.int64)  # everything special -> nothing masked
    masked, labels = transforms.mask_text_tokens(
        inputs, special, mask_token_id=4, vocab_size=10, rng=rng)
    assert (labels == -100).all()
    np.testing.assert_array_equal(masked, inputs)


def test_retrieval_metrics_with_ties():
    from clipbert_tpu.evaluation import metrics
    # all-equal scores: stable sort puts GT at its column index
    scores = np.ones((3, 4), np.float32)
    ranks = metrics.gt_ranks_from_scores(scores, np.array([0, 2, 3]))
    np.testing.assert_array_equal(ranks, [0, 2, 3])


def test_resize_noop_and_tiny_images():
    frames = np.zeros((1, 8, 8, 3), np.uint8)
    out = transforms.resize_frames(frames, 8)
    assert out.shape == (1, 8, 8, 3)
    up = transforms.resize_frames(frames, 16)
    assert up.shape == (1, 16, 16, 3)


def test_chunk_list_single_and_empty_guard():
    assert transforms.chunk_list([1], 2, True) == [[1, 1]]
    assert transforms.chunk_list([1, 2], 2, True) == [[1, 2]]


def test_tokenizer_overlong_word_is_unk(tmp_path):
    vocab = tmp_path / "v.txt"
    tokenization.write_tiny_vocab(str(vocab))
    tok = tokenization.BertTokenizer(str(vocab))
    assert tok.tokenize("a" * 200) == ["[UNK]"]
    # unknown character sequences also fall back to UNK
    assert tok.convert_tokens_to_ids(["[UNK]"])[0] == tok.unk_token_id

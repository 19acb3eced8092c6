"""Serving-path tests: RetrievalScorer correctness + the HTTP endpoint.

The scorer must produce the SAME probabilities as the eval-protocol math
(mil_forward + pooling + softmax) on identical pixels, independent of the
caption-bucket padding, and survive the JSON-over-HTTP round trip.
"""

import base64
import json
import socket
import threading
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp

from clipbert_tpu.core.config import ModelConfig
from clipbert_tpu.core.rng import RngGen
from clipbert_tpu.data import tokenization, transforms, video
from clipbert_tpu.models import clipbert
from clipbert_tpu.serve import RetrievalScorer, make_http_server
from clipbert_tpu.train import steps

import jax

N_CLIPS = 2
NUM_FRM = 2
IMG = 64


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    vocab = root / "vocab.txt"
    tokenization.write_tiny_vocab(
        str(vocab), extra_tokens=["cat", "dog", "runs", "a", "the"])
    tok = tokenization.BertTokenizer(str(vocab))
    cfg = ModelConfig(
        vocab_size=len(tok), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, max_grid_row_position_embeddings=4,
        max_grid_col_position_embeddings=4, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, num_labels=2, loss_type="ce",
        score_agg_func="lse")
    params = clipbert.init_clipbert(jax.random.key(5), cfg, "retrieval")
    rng = np.random.default_rng(9)
    frames = rng.integers(0, 255, (12, 48, IMG, 3)).astype(np.uint8)
    blob = video.encode_jseq_from_array(frames, fps=8)
    scorer = RetrievalScorer(
        params, cfg, tok, num_frm=NUM_FRM, n_clips=N_CLIPS, fps=4,
        max_img_size=IMG, max_txt_len=8, max_captions=8,
        compute_dtype=jnp.float32)
    return {"scorer": scorer, "blob": blob, "cfg": cfg, "tok": tok}


def test_score_matches_eval_protocol_math(setup):
    """Scorer probs == mil_forward + pool + softmax on the same pixels."""
    sc, blob, cfg = setup["scorer"], setup["blob"], setup["cfg"]
    caps = ["a cat runs", "the dog", "a dog"]
    probs = sc.score(blob, caps)
    assert probs.shape == (3,)
    assert np.isfinite(probs).all() and (0 <= probs).all() and \
        (probs <= 1).all()

    frames = sc._decode_clips(blob)
    h, w = frames.shape[1:3]
    nh, nw = transforms.get_resize_size(h, w, IMG)
    pixels = transforms.device_preprocess(
        frames[None], np.array([[h, w, nh, nw]], np.int32), IMG,
        sc.mean, sc.std, jnp.float32)          # (1, nc*T, S, S, 3)
    enc = setup["tok"].batch_encode(caps, 8)
    ts = steps.TaskSettings(head_type="retrieval", num_labels=2,
                            loss_type="ce", score_agg_func="lse",
                            train_n_clips=N_CLIPS, group_size=3)
    batch = {"visual_inputs": pixels,
             "text_input_ids": jnp.asarray(enc["input_ids"]),
             "text_input_mask": jnp.asarray(enc["attention_mask"])}
    clip_logits = steps.mil_forward(sc.params, cfg, ts, batch, RngGen(None),
                                    False, jnp.float32)
    pooled = np.asarray(steps.pool_clip_logits(clip_logits, "lse"))
    e = np.exp(pooled - pooled.max(-1, keepdims=True))
    want = (e / e.sum(-1, keepdims=True))[:, 1]
    np.testing.assert_allclose(probs, want, rtol=2e-4, atol=2e-5)


def test_bucket_padding_independent(setup):
    """Padding captions to the bucket size must not change real scores,
    and cached features must reproduce the bytes path."""
    sc, blob = setup["scorer"], setup["blob"]
    caps = ["a cat runs", "the dog", "a dog"]
    p3 = sc.score(blob, caps)                       # bucket 4
    p5 = sc.score(blob, caps + ["cat", "the cat"])  # bucket 8
    np.testing.assert_allclose(p3, p5[:3], rtol=1e-5, atol=1e-6)

    feats = sc.encode_video(blob)
    p_feats = sc.score(None, caps, features=feats)
    np.testing.assert_allclose(p3, p_feats, rtol=1e-6)

    with pytest.raises(AssertionError):
        sc.score(blob, ["x"] * 9)                   # > max_captions

    with pytest.raises(ValueError):
        sc.encode_video(b"not a video")


def test_odd_resolution_buckets_like_collate(setup):
    """Native sizes round up to the 64px collate bucket before the device
    preprocess (bounds compiles to one per bucket, serve.py), and the
    zero-pad region must not change the scores: oracle = the same frames
    packed the way collate_visual packs a batch."""
    sc, tok, cfg = setup["scorer"], setup["tok"], setup["cfg"]
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (12, 40, 52, 3)).astype(np.uint8)
    blob = video.encode_jseq_from_array(frames, fps=8)
    caps = ["a cat runs", "the dog"]
    probs = sc.score(blob, caps)
    assert np.isfinite(probs).all()

    dec = sc._decode_clips(blob)
    h, w = dec.shape[1:3]
    buf, hw = transforms.collate_visual(
        [{"vis": dec, "vis_hw": np.array(
            [h, w, *transforms.get_resize_size(h, w, IMG)], np.int32)}])
    assert buf.shape[2:4] == (64, 64)      # bucketed, not native
    pixels = transforms.device_preprocess(buf, hw, IMG, sc.mean, sc.std,
                                          jnp.float32)
    enc = tok.batch_encode(caps, 8)
    ts = steps.TaskSettings(head_type="retrieval", num_labels=2,
                            loss_type="ce", score_agg_func="lse",
                            train_n_clips=N_CLIPS, group_size=len(caps))
    batch = {"visual_inputs": pixels,
             "text_input_ids": jnp.asarray(enc["input_ids"]),
             "text_input_mask": jnp.asarray(enc["attention_mask"])}
    clip_logits = steps.mil_forward(sc.params, cfg, ts, batch, RngGen(None),
                                    False, jnp.float32)
    pooled = np.asarray(steps.pool_clip_logits(clip_logits, "lse"))
    e = np.exp(pooled - pooled.max(-1, keepdims=True))
    want = (e / e.sum(-1, keepdims=True))[:, 1]
    np.testing.assert_allclose(probs, want, rtol=2e-4, atol=2e-5)


@pytest.fixture(scope="module")
def vqa_setup(setup):
    """VQA scorer on a tiny seq_cls head sharing the module tokenizer."""
    from clipbert_tpu.serve import VQAScorer
    tok = setup["tok"]
    cfg = ModelConfig(
        vocab_size=len(tok), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, max_grid_row_position_embeddings=4,
        max_grid_col_position_embeddings=4, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, num_labels=6, loss_type="bce")
    params = clipbert.init_clipbert(jax.random.key(7), cfg, "seq_cls")
    label2ans = {i: f"ans{i}" for i in range(6)}
    sc = VQAScorer(params, cfg, tok, label2ans, max_img_size=IMG,
                   max_txt_len=8, max_questions=8,
                   compute_dtype=jnp.float32)
    import io
    from PIL import Image
    rng = np.random.default_rng(11)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (40, 52, 3)).astype(np.uint8)).save(
        buf, format="PNG")          # odd size: exercises the 64px bucket
    return {"sc": sc, "img": buf.getvalue(), "cfg": cfg}


def test_vqa_answer_matches_forward_math(vqa_setup):
    """Top-k answers == sigmoid(seq_cls logits) computed directly on the
    same cached features, and question-bucket padding must not leak."""
    sc, img = vqa_setup["sc"], vqa_setup["img"]
    qs = ["a cat runs", "the dog"]
    out = sc.answer(img, qs, top_k=3)
    assert len(out) == 2 and all(len(r) == 3 for r in out)
    for r in out:
        scores = [e["score"] for e in r]
        assert scores == sorted(scores, reverse=True)
        assert all(0 <= s <= 1 for s in scores)

    feats = sc.encode_image(img)
    enc = sc.tokenizer.batch_encode(qs, 8)
    fwd = clipbert.clipbert_forward(
        sc.params, vqa_setup["cfg"],
        {"text_input_ids": jnp.asarray(enc["input_ids"]),
         "text_input_mask": jnp.asarray(enc["attention_mask"])},
        "seq_cls", train=False, compute_dtype=jnp.float32,
        visual_features=feats, group_size=2)
    want = 1.0 / (1.0 + np.exp(-np.asarray(fwd["logits"], np.float64)))
    got = {e["answer"]: e["score"] for e in out[0]}
    for i, p in enumerate(want[0]):
        if f"ans{i}" in got:
            np.testing.assert_allclose(got[f"ans{i}"], p, rtol=2e-4,
                                       atol=2e-5)
    # bucket independence: padding to 4 then 8 questions
    out8 = sc.answer(img, qs + ["cat"] * 3, top_k=3)
    for a, b in zip(out[0], out8[0]):
        assert a["answer"] == b["answer"]
        np.testing.assert_allclose(a["score"], b["score"], rtol=1e-5)

    with pytest.raises(ValueError):
        sc.encode_image(b"not an image")


def test_vqa_http_endpoint(vqa_setup):
    from clipbert_tpu.serve import make_http_server
    sc, img = vqa_setup["sc"], vqa_setup["img"]
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server = make_http_server(None, "127.0.0.1", port, vqa=sc)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/vqa",
            data=json.dumps({
                "image_b64": base64.b64encode(img).decode(),
                "questions": ["a cat"], "top_k": 2}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            answers = json.loads(r.read())["answers"]
        assert len(answers) == 1 and len(answers[0]) == 2
        direct = sc.answer(img, ["a cat"], top_k=2)
        assert answers[0][0]["answer"] == direct[0][0]["answer"]
        # /score is 404 on a vqa-only server
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/score",
            data=json.dumps({"video_b64": "", "captions": ["x"]}).encode())
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "retrieval route must 404 on a vqa-only server"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()


@pytest.fixture(scope="module")
def videoqa_setup(setup):
    """Open-ended + MC video-QA scorers sharing the module tokenizer/blob."""
    from clipbert_tpu.serve import VideoQAScorer
    tok = setup["tok"]
    base = dict(
        vocab_size=len(tok), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, max_grid_row_position_embeddings=4,
        max_grid_col_position_embeddings=4, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, loss_type="ce")
    oe_cfg = ModelConfig(num_labels=6, **base)
    oe_params = clipbert.init_clipbert(jax.random.key(13), oe_cfg, "seq_cls")
    oe = VideoQAScorer(
        oe_params, oe_cfg, tok, "frameqa",
        label2ans={i: f"ans{i}" for i in range(6)}, num_frm=NUM_FRM,
        n_clips=N_CLIPS, fps=4, max_img_size=IMG, max_txt_len=8,
        max_questions=8, score_agg_func="mean", compute_dtype=jnp.float32)
    mc_cfg = ModelConfig(num_labels=5, **base)
    mc_params = clipbert.init_clipbert(jax.random.key(17), mc_cfg,
                                       "multi_choice")
    mc = VideoQAScorer(
        mc_params, mc_cfg, tok, "transition", num_frm=NUM_FRM,
        n_clips=N_CLIPS, fps=4, max_img_size=IMG, max_txt_len=8,
        score_agg_func="mean", compute_dtype=jnp.float32)
    return {"oe": oe, "mc": mc, "oe_cfg": oe_cfg, "mc_cfg": mc_cfg,
            "blob": setup["blob"], "tok": tok}


def _videoqa_oracle(sc, cfg, blob, texts, head, group_size, tok):
    """Direct mil_forward + clip pooling + softmax on the same pixels —
    the run_video_qa validation math."""
    frames = sc._decode_clips(blob)
    h, w = frames.shape[1:3]
    nh, nw = transforms.get_resize_size(h, w, IMG)
    pixels = transforms.device_preprocess(
        frames[None], np.array([[h, w, nh, nw]], np.int32), IMG,
        sc.mean, sc.std, jnp.float32)
    enc = tok.batch_encode(texts, 8)
    ts = steps.TaskSettings(head_type=head, num_labels=cfg.num_labels,
                            loss_type="ce", score_agg_func="mean",
                            train_n_clips=N_CLIPS, group_size=group_size)
    batch = {"visual_inputs": pixels,
             "text_input_ids": jnp.asarray(enc["input_ids"]),
             "text_input_mask": jnp.asarray(enc["attention_mask"])}
    clip_logits = steps.mil_forward(sc.params, cfg, ts, batch, RngGen(None),
                                    False, jnp.float32)
    pooled = np.asarray(steps.pool_clip_logits(clip_logits, "mean"),
                        np.float64)
    e = np.exp(pooled - pooled.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_videoqa_open_ended_matches_eval_math(videoqa_setup):
    """Open-ended answers == mean-pooled per-clip logits softmaxed, and
    question-bucket padding must not leak into real rows."""
    sc, blob = videoqa_setup["oe"], videoqa_setup["blob"]
    qs = ["a cat runs", "the dog"]
    out = sc.answer(blob, qs, top_k=3)
    assert len(out) == 2 and all(len(r) == 3 for r in out)
    want = _videoqa_oracle(sc, videoqa_setup["oe_cfg"], blob, qs, "seq_cls",
                           group_size=2, tok=videoqa_setup["tok"])
    got0 = {e["answer"]: e["score"] for e in out[0]}
    for i, p in enumerate(want[0]):
        if f"ans{i}" in got0:
            np.testing.assert_allclose(got0[f"ans{i}"], p, rtol=2e-4,
                                       atol=2e-5)
    # bucket independence (pads 2 -> 4 -> 8 questions)
    out8 = sc.answer(blob, qs + ["cat"] * 3, top_k=3)
    for a, b in zip(out[0], out8[0]):
        assert a["answer"] == b["answer"]
        np.testing.assert_allclose(a["score"], b["score"], rtol=1e-5)
    with pytest.raises(AssertionError):
        sc.answer_mc(blob, "q", ["a"] * 5)     # MC entry on open-ended task


def test_videoqa_mc_matches_eval_math(videoqa_setup):
    """MC option probabilities == the multi-choice head's clip-pooled
    logits softmaxed over the 5 question+option texts."""
    sc, blob = videoqa_setup["mc"], videoqa_setup["blob"]
    q, opts = "the cat", ["runs", "dog", "a", "cat", "the"]
    probs = sc.answer_mc(blob, q, opts)
    assert probs.shape == (5,)
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-5)
    texts = [q + " " + o for o in opts]        # dataset concat convention
    want = _videoqa_oracle(sc, videoqa_setup["mc_cfg"], blob, texts,
                           "multi_choice", group_size=5,
                           tok=videoqa_setup["tok"])
    np.testing.assert_allclose(probs, want[0], rtol=2e-4, atol=2e-5)
    # cached-features path reproduces the bytes path
    feats = sc.encode_video(blob)
    np.testing.assert_allclose(sc.answer_mc(None, q, opts, features=feats),
                               probs, rtol=1e-6)
    with pytest.raises(AssertionError):
        sc.answer_mc(blob, q, opts[:3])        # wrong option count
    with pytest.raises(AssertionError):
        sc.answer(blob, ["q"])                 # open-ended entry on MC task


def test_videoqa_http_endpoints(videoqa_setup):
    from clipbert_tpu.serve import make_http_server
    oe, mc, blob = videoqa_setup["oe"], videoqa_setup["mc"], \
        videoqa_setup["blob"]
    b64 = base64.b64encode(blob).decode()
    for scorer, path, payload in [
            (oe, "/videoqa", {"video_b64": b64, "questions": ["a cat"],
                              "top_k": 2}),
            (mc, "/videoqa_mc", {"video_b64": b64, "question": "the cat",
                                 "options": ["runs", "dog", "a", "cat",
                                             "the"]})]:
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        server = make_http_server(None, "127.0.0.1", port, videoqa=scorer)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                body = json.loads(r.read())
            if path == "/videoqa":
                direct = oe.answer(blob, ["a cat"], top_k=2)
                assert body["answers"][0][0]["answer"] == \
                    direct[0][0]["answer"]
            else:
                direct = mc.answer_mc(blob, "the cat",
                                      ["runs", "dog", "a", "cat", "the"])
                assert body["answer_index"] == int(np.argmax(direct))
                np.testing.assert_allclose(body["probs"], direct, rtol=1e-5)
            # the other family's route must 404 on this server
            other = "/videoqa_mc" if path == "/videoqa" else "/videoqa"
            bad = urllib.request.Request(
                f"http://127.0.0.1:{port}{other}",
                data=json.dumps(payload).encode())
            try:
                urllib.request.urlopen(bad, timeout=30)
                assert False, f"{other} must 404 on this server"
            except urllib.error.HTTPError as e:
                assert e.code == 404
        finally:
            server.shutdown()


def test_http_endpoint_round_trip(setup):
    sc, blob = setup["scorer"], setup["blob"]
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server = make_http_server(sc, "127.0.0.1", port)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"

        caps = ["a cat runs", "the dog"]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/score",
            data=json.dumps({
                "video_b64": base64.b64encode(blob).decode(),
                "captions": caps}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            probs = json.loads(r.read())["probs"]
        np.testing.assert_allclose(probs, sc.score(blob, caps),
                                   rtol=1e-5, atol=1e-6)

        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/score",
            data=json.dumps({"video_b64": "!!", "captions": ["x"]}).encode())
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "bad payload must not return 200"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_concurrent_requests_across_endpoints(setup, vqa_setup,
                                              videoqa_setup):
    """ThreadingHTTPServer handles each POST on its own thread, so the
    scorers' compiled-program caches see real concurrency (serve.py module
    docstring documents why that is safe: read-only scorer state, locked
    steps._STEP_CACHE, thread-safe jit caches). Fire 12 parallel POSTs
    across /score, /vqa and /videoqa and assert every response is correct
    (== the sequential baseline), not merely crash-free."""
    import urllib.error
    from concurrent.futures import ThreadPoolExecutor

    sc, blob = setup["scorer"], setup["blob"]
    vqa, img = vqa_setup["sc"], vqa_setup["img"]
    oe = videoqa_setup["oe"]
    caps = ["a cat runs", "the dog"]
    qs = ["a cat"]
    want_score = sc.score(blob, caps)
    want_vqa = vqa.answer(img, qs, top_k=2)
    want_videoqa = oe.answer(blob, qs, top_k=2)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server = make_http_server(sc, "127.0.0.1", port, vqa=vqa, videoqa=oe)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    reqs = [("/score", {"video_b64": base64.b64encode(blob).decode(),
                        "captions": caps}),
            ("/vqa", {"image_b64": base64.b64encode(img).decode(),
                      "questions": qs, "top_k": 2}),
            ("/videoqa", {"video_b64": base64.b64encode(blob).decode(),
                          "questions": qs, "top_k": 2}),
            ("/score", {"video_b64": "!!", "captions": caps})] * 3

    def post(args):
        path, payload = args
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=300) as r:
                return path, payload, r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return path, payload, e.code, json.loads(e.read())

    try:
        with ThreadPoolExecutor(12) as pool:
            results = list(pool.map(post, reqs))
    finally:
        server.shutdown()

    assert len(results) == 12
    for path, payload, code, body in results:
        if payload.get("video_b64") == "!!":      # malformed mixed in
            assert code == 400, (path, body)
        elif path == "/score":
            assert code == 200, body
            np.testing.assert_allclose(body["probs"], want_score,
                                       rtol=1e-5, atol=1e-6)
        elif path == "/vqa":
            assert code == 200, body
            assert body["answers"][0][0]["answer"] == \
                want_vqa[0][0]["answer"]
        else:
            assert code == 200, body
            assert body["answers"][0][0]["answer"] == \
                want_videoqa[0][0]["answer"]


def test_http_error_codes_split_client_vs_server():
    """Payload/validation errors are 400; internal scorer failures are 5xx
    (load balancers must retry/eject, not blame the client) and must not
    leak exception details to the caller."""

    class _BoomScorer:
        def score(self, video_bytes, captions):
            raise RuntimeError("secret internal state: /some/path")

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server = make_http_server(_BoomScorer(), "127.0.0.1", port)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # missing required field -> 400
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/score",
            data=json.dumps({"captions": ["x"]}).encode())
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # scorer raising internally -> 500, details not echoed
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/score",
            data=json.dumps({"video_b64": base64.b64encode(b"x").decode(),
                             "captions": ["x"]}).encode())
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 500
            body = json.loads(e.read())
            assert "secret internal state" not in json.dumps(body)
    finally:
        server.shutdown()

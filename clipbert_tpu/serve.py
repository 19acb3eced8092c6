"""Serving path: single-query video-text scoring with bounded latency.

The reference has no serving story (its inference entry rebuilds loaders
and writes files, `/root/reference/src/tasks/run_video_retrieval.py:737+`);
production deployment needs a resident scorer. This module provides one,
TPU-first:

 - :class:`RetrievalScorer` — params resident on device with frozen-BN
   scales folded, ONE pre-compiled program per (clip-config, caption
   bucket): decode -> jitted device resize/pad/normalize -> cached visual
   encode -> joint scoring. Static shapes via caption-count buckets
   (powers of two up to ``max_captions``) and 64px resolution buckets
   (native frames zero-pad up to the collate granularity, so compiles are
   bounded per bucket, not per distinct resolution); the persistent
   compile cache makes restarts warm.
 - a stdlib-only JSON-over-HTTP endpoint (``python -m clipbert_tpu.serve``)
   for smoke deployments: POST /score {"video_b64", "captions"} ->
   {"probs"}. Production fleets should wrap RetrievalScorer in their own
   server; the class is thread-safe for readers (params are never
   mutated).

Thread-safety under ``ThreadingHTTPServer`` concurrency (exercised by
tests/test_serve.py::test_concurrent_requests_across_endpoints): scorer
state after __init__ is read-only (params are device arrays, never
mutated; the tokenizer holds only read-only dicts). The compiled-program
caches are (a) the steps._STEP_CACHE factory memo, guarded by a lock, and
(b) ``transforms._preprocess_jit``'s lru_cache plus each ``jax.jit``
object's internal trace cache — both thread-safe in CPython/JAX, with the
worst race being a redundant duplicate compile, never a wrong result.
Concurrent execution of one compiled program is supported by JAX; the
runtime serializes device execution per chip.

Latency knobs that matter on real hosts: ``n_clips=1`` is the low-latency
configuration (the reference's own recommendation for speed,
README.md:109-124); decode runs on the host thread; the H2D transfer
ships native-size uint8 (device resize) rather than 448^2 floats.
"""

from __future__ import annotations

import base64
import binascii
import json
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from clipbert_tpu.core.config import ModelConfig
from clipbert_tpu.data import transforms, video
from clipbert_tpu.data.tokenization import BertTokenizer
from clipbert_tpu.models import clipbert
from clipbert_tpu.train import steps
from clipbert_tpu.utils.logger import LOGGER


def _pow2_bucket(n: int, cap: int) -> int:
    """Smallest power-of-two >= n (floor 4, capped) — static text-count
    buckets keep the steady state recompile-free."""
    b = 4
    while b < n:
        b *= 2
    return min(b, cap)


def _prepare_params(params, fold_bn: bool, quantize: bool = False):
    """Shared scorer-constructor preamble: latch the persistent compile
    cache (restarts must not pay the minutes-long server-side recompile;
    serve never builds a mesh, where the runners latch it), fold the
    frozen-BN scales into the conv kernels, optionally int8-quantize the
    transformer matmul kernels (clipbert.quantize_scoring_params — an
    HBM-FOOTPRINT option only: it halves transformer weight bytes but
    measured 31% SLOWER end-to-end scoring at the eval shape, where bf16
    already runs the MXU at full rate and the quantize/dequantize epilogues
    are pure overhead — PARITY.md; small score perturbation pinned by
    tests/test_int8.py), move params to device."""
    from clipbert_tpu.core import compile_cache
    compile_cache.enable()
    if fold_bn:
        params = clipbert.fold_cnn_bn_scales(params)
    if quantize:
        params = clipbert.quantize_scoring_params(params)
    return jax.device_put(params)


def _device_pixels(frames: np.ndarray, max_img_size: int, mean, std, dtype):
    """(T, H, W, 3) uint8 native frames -> (1, T, S, S, 3) device pixels:
    bucket-pad (compile reuse) + jitted resize/pad/normalize."""
    h, w = frames.shape[1:3]
    frames = _round_to_collate_bucket(frames)
    nh, nw = transforms.get_resize_size(h, w, max_img_size)
    src_hw = np.array([[h, w, nh, nw]], np.int32)
    return transforms.device_preprocess(frames[None], src_hw, max_img_size,
                                        mean, std, dtype)


def _topk_answers(probs: np.ndarray, label2ans: Dict[int, str],
                  top_k: int) -> List[List[Dict]]:
    """(n, num_labels) probabilities -> per-row top-k
    [{"answer", "score"}], best first."""
    k = min(top_k, probs.shape[1])
    out = []
    for row in probs:
        top = np.argsort(-row)[:k]
        out.append([{"answer": label2ans.get(int(i), str(int(i))),
                     "score": float(row[i])} for i in top])
    return out


def _text_buckets(cap: int):
    """Every power-of-two text-count bucket a scorer can compile (4..cap)."""
    b = 4
    while True:
        yield min(b, cap)
        if b >= cap:
            return
        b *= 2


def _round_to_collate_bucket(frames: np.ndarray) -> np.ndarray:
    """Zero-pad native frames up to the collate granularity (transforms
    _BUCKET=64) so a previously-unseen resolution reuses an existing
    compiled program instead of blocking the query on a server-side
    recompile; the real (h, w) rides separately in src_hw."""
    h, w = frames.shape[1:3]
    B = transforms._BUCKET
    hb, wb = -(-h // B) * B, -(-w // B) * B
    if (hb, wb) == (h, w):
        return frames
    buf = np.zeros(frames.shape[:1] + (hb, wb) + frames.shape[3:],
                   frames.dtype)
    buf[:, :h, :w] = frames
    return buf


class _ResidentVideoScorer:
    """Shared decode -> device resize -> cached CNN encode for the resident
    video scorers (retrieval + video-QA). Subclasses set: params, n_clips,
    num_frm, fps, max_img_size, mean, std, compute_dtype, _encode."""

    def _decode_clips(self, video_bytes: bytes) -> Optional[np.ndarray]:
        """(n_clips*num_frm, H, W, 3) uint8, uniform clip ensemble (the
        eval protocol) — ONE probe + one concatenated decode pass over the
        blob (video.decode_multi_clips), not n_clips separate seeks."""
        return video.decode_multi_clips(
            video_bytes, num_frames=self.num_frm, target_fps=self.fps,
            num_clips=self.n_clips, random_clips=False)

    def encode_video(self, video_bytes: bytes):
        """Decode + device resize + CNN encode: cached grid features
        (1, n_clips, T', Hg, Wg, D). Reuse across many score()/answer()
        calls via the ``features=`` argument."""
        frames = self._decode_clips(video_bytes)
        if frames is None:
            raise ValueError("undecodable video payload")
        pixels = _device_pixels(frames, self.max_img_size, self.mean,
                                self.std, self.compute_dtype)
        # (1, n_clips*T, S, S, 3) -> (n_clips, T, S, S, 3)
        pixels = pixels.reshape((self.n_clips, self.num_frm)
                                + pixels.shape[2:])
        feats = self._encode(self.params, pixels)
        return feats.reshape((1,) + feats.shape)

    def _pad_texts(self, texts: Sequence[str], bucket: int):
        return _pad_texts(self.tokenizer, texts, self.max_txt_len, bucket)


def _pad_texts(tokenizer, texts: Sequence[str], max_txt_len: int,
               bucket: int):
    """Tokenize + zero-pad the text count up to the bucket (padded rows are
    all-zero ids/mask and are sliced off by the caller)."""
    enc = tokenizer.batch_encode(list(texts), max_txt_len)
    ids = np.zeros((bucket, max_txt_len), np.int32)
    mask = np.zeros((bucket, max_txt_len), np.int32)
    ids[:len(texts)] = enc["input_ids"]
    mask[:len(texts)] = enc["attention_mask"]
    return jnp.asarray(ids), jnp.asarray(mask)


class RetrievalScorer(_ResidentVideoScorer):
    """Resident single-video scorer (retrieval/ce head).

    score(video_bytes, captions) -> per-caption positive-class
    probabilities, pooled over ``n_clips`` uniform clips by
    ``score_agg_func`` — the exact eval-protocol math
    (tests/test_retrieval_protocol_parity.py pins it).
    """

    def __init__(self, params, model_cfg: ModelConfig,
                 tokenizer: BertTokenizer, *, num_frm: int = 2,
                 n_clips: int = 1, fps: float = 1.0,
                 max_img_size: int = 448, max_txt_len: int = 20,
                 max_captions: int = 32, score_agg_func: str = "lse",
                 mean=transforms.IMAGENET_MEAN_255,
                 std=transforms.IMAGENET_STD_1,
                 compute_dtype=jnp.bfloat16, fold_bn: bool = True,
                 quantize: bool = False):
        self.params = _prepare_params(params, fold_bn, quantize)
        self.model_cfg = model_cfg
        self.tokenizer = tokenizer
        self.num_frm = num_frm
        self.n_clips = n_clips
        self.fps = fps
        self.max_img_size = max_img_size
        self.max_txt_len = max_txt_len
        self.max_captions = max_captions
        self.score_agg_func = score_agg_func
        self.mean, self.std = mean, std
        self.compute_dtype = compute_dtype
        ts = steps.TaskSettings(
            head_type="retrieval", num_labels=model_cfg.num_labels,
            loss_type=model_cfg.loss_type, score_agg_func=score_agg_func,
            train_n_clips=n_clips, group_size=1)
        self._encode = steps.make_visual_encode_step(
            compute_dtype=compute_dtype)
        # pooling + softmax fused into the scoring program: one fetch per
        # query (the same step inference_retrieval batches over)
        self._prob = steps.make_text_prob_step(
            model_cfg, ts, compute_dtype=compute_dtype)

    # -- factories ----------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, model_config_path: str, tokenizer_dir: str,
                        e2e_weights_path: str, **kw) -> "RetrievalScorer":
        """Load a deployment checkpoint (.npz) or a reference .pt through
        the standard import path (trainer.setup_model)."""
        from clipbert_tpu.core.config import RunConfig
        from clipbert_tpu.train import trainer
        model_cfg = ModelConfig.from_json(
            model_config_path, num_labels=2, loss_type="ce")
        run_cfg = RunConfig(model_config=model_config_path,
                            e2e_weights_path=e2e_weights_path)
        params = trainer.setup_model(run_cfg, model_cfg, "retrieval")
        tok = BertTokenizer.from_dir(tokenizer_dir)
        return cls(params, model_cfg, tok, **kw)

    # -- internals ----------------------------------------------------------

    def score(self, video_bytes: Optional[bytes],
              captions: Sequence[str], features=None) -> np.ndarray:
        """Per-caption positive probabilities (len(captions),)."""
        assert captions, "need at least one caption"
        assert len(captions) <= self.max_captions, (
            f"{len(captions)} captions > max_captions={self.max_captions}; "
            "raise max_captions at construction or chunk the query")
        if features is None:
            features = self.encode_video(video_bytes)
        n = len(captions)
        ids, mask = self._pad_texts(captions, _pow2_bucket(n, self.max_captions))
        probs = np.asarray(self._prob(self.params, features, ids, mask))
        return probs[0, :n]

    def warmup(self, sample_hws=((240, 320),)) -> None:
        """Compile the steady-state programs before taking traffic: the
        encode program for EACH listed (h, w) — resolution buckets are 64px,
        so a query in an unlisted bucket pays a fresh server-side compile on
        first arrival — plus every caption bucket."""
        feats = None
        for h, w in sample_hws:
            frames = np.zeros((self.n_clips * self.num_frm, h, w, 3),
                              np.uint8)
            blob = video.encode_jseq_from_array(frames,
                                                fps=max(self.fps, 1.0))
            feats = self.encode_video(blob)
        for b in _text_buckets(self.max_captions):
            self.score(None, ["warmup"] * b, features=feats)
        LOGGER.info("RetrievalScorer warm: encode + caption buckets ready")


class VQAScorer:
    """Resident single-image question answering (the VQA task family).

    answer(image_bytes, questions) -> per-question top-k (answer, score)
    over the ans2label vocabulary with the exact task protocol math:
    sigmoid over the bce multi-label head (run_vqa.py:347-356), softmax
    for ce heads. Same deployment properties as RetrievalScorer: folded
    frozen-BN params resident on device, question-count buckets, 64px
    resolution buckets, persistent compile cache."""

    def __init__(self, params, model_cfg: ModelConfig,
                 tokenizer: BertTokenizer, label2ans: Dict[int, str], *,
                 max_img_size: int = 448, max_txt_len: int = 20,
                 max_questions: int = 32,
                 mean=transforms.IMAGENET_MEAN_255,
                 std=transforms.IMAGENET_STD_1,
                 compute_dtype=jnp.bfloat16, fold_bn: bool = True,
                 quantize: bool = False):
        self.params = _prepare_params(params, fold_bn, quantize)
        self.model_cfg = model_cfg
        self.tokenizer = tokenizer
        self.label2ans = {int(k): v for k, v in label2ans.items()}
        self.max_img_size = max_img_size
        self.max_txt_len = max_txt_len
        self.max_questions = max_questions
        self.mean, self.std = mean, std
        self.compute_dtype = compute_dtype
        ts = steps.TaskSettings(
            head_type="seq_cls", num_labels=model_cfg.num_labels,
            loss_type=model_cfg.loss_type, train_n_clips=1, group_size=1)
        self._encode = steps.make_visual_encode_step(
            compute_dtype=compute_dtype)
        self._answer = steps.make_qa_answer_step(
            model_cfg, ts, compute_dtype=compute_dtype)

    @classmethod
    def from_checkpoint(cls, model_config_path: str, tokenizer_dir: str,
                        e2e_weights_path: str, ans2label_path: str,
                        **kw) -> "VQAScorer":
        from clipbert_tpu.core.config import RunConfig
        from clipbert_tpu.train import trainer
        from clipbert_tpu.utils.basic import load_json
        ans2label = load_json(ans2label_path)
        model_cfg = ModelConfig.from_json(
            model_config_path, num_labels=len(ans2label), loss_type="bce")
        run_cfg = RunConfig(model_config=model_config_path,
                            e2e_weights_path=e2e_weights_path)
        params = trainer.setup_model(run_cfg, model_cfg, "seq_cls")
        tok = BertTokenizer.from_dir(tokenizer_dir)
        return cls(params, model_cfg, tok,
                   {v: k for k, v in ans2label.items()}, **kw)

    def encode_image(self, image_bytes: bytes):
        """JPEG/PNG bytes -> cached grid features (1, 1, Hg, Wg, D)."""
        import io
        from PIL import Image
        try:
            img = Image.open(io.BytesIO(image_bytes))
            frames = np.asarray(img.convert("RGB"), np.uint8)[None]
        except Exception as e:
            raise ValueError(f"undecodable image payload: {e}") from None
        pixels = _device_pixels(frames, self.max_img_size, self.mean,
                                self.std, self.compute_dtype)
        return self._encode(self.params, pixels)    # (1, 1, Hg, Wg, D)

    def answer(self, image_bytes: Optional[bytes],
               questions: Sequence[str], top_k: int = 5,
               features=None) -> List[List[Dict]]:
        """Per-question top-k [{"answer", "score"}], best first."""
        assert questions, "need at least one question"
        assert len(questions) <= self.max_questions, (
            f"{len(questions)} questions > max_questions="
            f"{self.max_questions}")
        if features is None:
            features = self.encode_image(image_bytes)
        n = len(questions)
        ids, mask = _pad_texts(self.tokenizer, questions, self.max_txt_len,
                               _pow2_bucket(n, self.max_questions))
        probs = np.asarray(self._answer(self.params, features,
                                        ids, mask))[:n]
        return _topk_answers(probs, self.label2ans, top_k)

    def warmup(self, sample_hws=((480, 640),)) -> None:
        """See RetrievalScorer.warmup: one encode compile per listed
        resolution bucket + every question bucket."""
        import io
        from PIL import Image
        feats = None
        for hw in sample_hws:
            buf = io.BytesIO()
            Image.fromarray(np.zeros(tuple(hw) + (3,), np.uint8)).save(
                buf, format="JPEG")
            feats = self.encode_image(buf.getvalue())
        for b in _text_buckets(self.max_questions):
            self.answer(None, ["warmup"] * b, features=feats)
        LOGGER.info("VQAScorer warm: encode + question buckets ready")


MC_QA_TASKS = ("action", "transition")


class VideoQAScorer(_ResidentVideoScorer):
    """Resident single-video question answering (the video-QA task family,
    run_video_qa.py protocol: per-clip logits pooled by score_agg_func).

    Open-ended tasks (frameqa / msrvtt_qa): ``answer(video_bytes,
    questions)`` -> per-question top-k (answer, score) over the ans2label
    vocabulary, softmax over the ce classifier. Multiple-choice tasks
    (action / transition): ``answer_mc(video_bytes, question, options)``
    -> per-option probabilities, using the dataset's question+option
    concatenation (datasets.py VideoQADataset.__getitem__) and the
    multi-choice single-logit head. Same deployment properties as
    RetrievalScorer: folded frozen-BN params resident on device,
    question-count buckets, 64px resolution buckets, single-pass
    clip-ensemble decode, persistent compile cache."""

    def __init__(self, params, model_cfg: ModelConfig,
                 tokenizer: BertTokenizer, task: str, *,
                 label2ans: Optional[Dict[int, str]] = None,
                 num_frm: int = 2, n_clips: int = 1, fps: float = 1.0,
                 max_img_size: int = 448, max_txt_len: int = 25,
                 max_questions: int = 32, n_options: int = 5,
                 score_agg_func: str = "mean",
                 mean=transforms.IMAGENET_MEAN_255,
                 std=transforms.IMAGENET_STD_1,
                 compute_dtype=jnp.bfloat16, fold_bn: bool = True,
                 quantize: bool = False):
        self.params = _prepare_params(params, fold_bn, quantize)
        self.model_cfg = model_cfg
        self.tokenizer = tokenizer
        self.task = task
        self.is_mc = task in MC_QA_TASKS
        self.n_options = n_options
        self.num_frm = num_frm
        self.n_clips = n_clips
        self.fps = fps
        self.max_img_size = max_img_size
        self.max_txt_len = max_txt_len
        self.max_questions = max_questions
        self.mean, self.std = mean, std
        self.compute_dtype = compute_dtype
        if self.is_mc:
            head, labels = "multi_choice", n_options
            self.label2ans = None
        else:
            assert label2ans, "open-ended video-QA needs label2ans"
            self.label2ans = {int(k): v for k, v in label2ans.items()}
            head, labels = "seq_cls", model_cfg.num_labels
        ts = steps.TaskSettings(
            head_type=head, num_labels=labels, loss_type="ce",
            score_agg_func=score_agg_func, train_n_clips=n_clips,
            group_size=1)
        self._encode = steps.make_visual_encode_step(
            compute_dtype=compute_dtype)
        self._prob = steps.make_videoqa_prob_step(
            model_cfg, ts, compute_dtype=compute_dtype)

    @classmethod
    def from_checkpoint(cls, model_config_path: str, tokenizer_dir: str,
                        e2e_weights_path: str, task: str,
                        ans2label_path: Optional[str] = None,
                        n_options: int = 5, **kw) -> "VideoQAScorer":
        from clipbert_tpu.core.config import RunConfig
        from clipbert_tpu.train import trainer
        from clipbert_tpu.utils.basic import load_json
        if task in MC_QA_TASKS:
            head, label2ans = "multi_choice", None
            num_labels = n_options
        else:
            assert ans2label_path, f"open-ended task {task} needs ans2label"
            ans2label = load_json(ans2label_path)
            label2ans = {v: k for k, v in ans2label.items()}
            head, num_labels = "seq_cls", len(ans2label)
        model_cfg = ModelConfig.from_json(
            model_config_path, num_labels=num_labels, loss_type="ce")
        run_cfg = RunConfig(model_config=model_config_path,
                            e2e_weights_path=e2e_weights_path)
        params = trainer.setup_model(run_cfg, model_cfg, head)
        tok = BertTokenizer.from_dir(tokenizer_dir)
        return cls(params, model_cfg, tok, task, label2ans=label2ans,
                   n_options=n_options, **kw)

    def answer(self, video_bytes: Optional[bytes],
               questions: Sequence[str], top_k: int = 5,
               features=None) -> List[List[Dict]]:
        """Open-ended tasks: per-question top-k [{"answer", "score"}]."""
        assert not self.is_mc, "MC tasks answer via answer_mc()"
        assert questions, "need at least one question"
        assert len(questions) <= self.max_questions, (
            f"{len(questions)} questions > max_questions="
            f"{self.max_questions}")
        if features is None:
            features = self.encode_video(video_bytes)
        n = len(questions)
        ids, mask = self._pad_texts(
            questions, _pow2_bucket(n, self.max_questions))
        probs = np.asarray(self._prob(self.params, features, ids, mask))[:n]
        return _topk_answers(probs, self.label2ans, top_k)

    def answer_mc(self, video_bytes: Optional[bytes], question: str,
                  options: Sequence[str], features=None) -> np.ndarray:
        """MC tasks: probabilities over the options (softmax of the
        clip-pooled per-option logits), best = argmax."""
        assert self.is_mc, "open-ended tasks answer via answer()"
        assert len(options) == self.n_options, (
            f"need exactly {self.n_options} options, got {len(options)}")
        if features is None:
            features = self.encode_video(video_bytes)
        texts = [question + " " + o for o in options]   # dataset concat
        ids, mask = self._pad_texts(texts, self.n_options)
        probs = np.asarray(self._prob(self.params, features, ids, mask))
        return probs[0]

    def warmup(self, sample_hws=((240, 320),)) -> None:
        """See RetrievalScorer.warmup: one encode compile per listed
        resolution bucket + the question/option programs."""
        feats = None
        for h, w in sample_hws:
            frames = np.zeros((self.n_clips * self.num_frm, h, w, 3),
                              np.uint8)
            blob = video.encode_jseq_from_array(frames,
                                                fps=max(self.fps, 1.0))
            feats = self.encode_video(blob)
        if self.is_mc:
            self.answer_mc(None, "warmup", ["w"] * self.n_options,
                           features=feats)
        else:
            for b in _text_buckets(self.max_questions):
                self.answer(None, ["warmup"] * b, features=feats)
        LOGGER.info("VideoQAScorer warm: encode + question programs ready")


# ---------------------------------------------------------------------------
# stdlib HTTP endpoint (smoke deployments / tests)
# ---------------------------------------------------------------------------

def make_http_server(scorer=None, host: str = "127.0.0.1",
                     port: int = 8477, vqa: Optional[VQAScorer] = None,
                     videoqa: Optional[VideoQAScorer] = None):
    """Routes (each present iff the matching scorer was given):
    POST /score      {"video_b64", "captions"}  -> {"probs": [...]}
    POST /vqa        {"image_b64", "questions", "top_k"?}
                     -> {"answers": [[{"answer","score"}...] ...]}
    POST /videoqa    {"video_b64", "questions", "top_k"?}    (open-ended)
                     -> {"answers": [[{"answer","score"}...] ...]}
    POST /videoqa_mc {"video_b64", "question", "options"}    (MC)
                     -> {"probs": [...], "answer_index": int}
    GET  /healthz -> {"status": "ok"}."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):       # quiet; LOGGER handles app logs
            pass

        def _reply(self, code: int, payload: Dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                if self.path == "/score" and scorer is not None:
                    probs = scorer.score(
                        base64.b64decode(req["video_b64"]),
                        [str(c) for c in req["captions"]])
                    self._reply(200, {"probs": [float(p) for p in probs]})
                elif self.path == "/vqa" and vqa is not None:
                    answers = vqa.answer(
                        base64.b64decode(req["image_b64"]),
                        [str(q) for q in req["questions"]],
                        top_k=int(req.get("top_k", 5)))
                    self._reply(200, {"answers": answers})
                elif (self.path == "/videoqa" and videoqa is not None
                        and not videoqa.is_mc):
                    answers = videoqa.answer(
                        base64.b64decode(req["video_b64"]),
                        [str(q) for q in req["questions"]],
                        top_k=int(req.get("top_k", 5)))
                    self._reply(200, {"answers": answers})
                elif (self.path == "/videoqa_mc" and videoqa is not None
                        and videoqa.is_mc):
                    probs = videoqa.answer_mc(
                        base64.b64decode(req["video_b64"]),
                        str(req["question"]),
                        [str(o) for o in req["options"]])
                    self._reply(200, {
                        "probs": [float(p) for p in probs],
                        "answer_index": int(np.argmax(probs))})
                else:
                    self._reply(404, {"error": "not found"})
            except (KeyError, TypeError, ValueError, AssertionError,
                    binascii.Error, json.JSONDecodeError) as e:
                # malformed payload: missing field, bad base64/JSON, bad
                # type, or a scorer input-validation assert (caption/question
                # count caps)
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:      # noqa: BLE001 — serving boundary
                # server-side failure (device fault, scorer bug): 5xx so
                # load balancers retry/eject instead of blaming the client;
                # details go to the log, not the caller
                LOGGER.exception("serving request failed")
                self._reply(500, {"error": f"internal: {type(e).__name__}"})

    return ThreadingHTTPServer((host, port), Handler)


def main(argv: Optional[List[str]] = None):
    import argparse
    ap = argparse.ArgumentParser(description="clipbert_tpu scoring server")
    ap.add_argument("--task",
                    choices=["retrieval", "vqa", "action", "transition",
                             "frameqa", "msrvtt_qa"],
                    default="retrieval")
    ap.add_argument("--model_config", required=True)
    ap.add_argument("--tokenizer_dir", required=True)
    ap.add_argument("--e2e_weights_path", required=True)
    ap.add_argument("--ans2label_path",
                    help="required for vqa and open-ended video-QA tasks")
    ap.add_argument("--port", type=int, default=8477)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--n_clips", type=int, default=1)
    ap.add_argument("--num_frm", type=int, default=2)
    ap.add_argument("--fps", type=float, default=1.0)
    ap.add_argument("--max_img_size", type=int, default=448)
    ap.add_argument("--max_captions", type=int, default=32)
    ap.add_argument("--score_agg_func", default="mean",
                    help="clip pooling for video-QA tasks")
    ap.add_argument("--warmup_resolutions", default="",
                    help="comma-separated HxW list to pre-compile encode "
                         "programs for (e.g. '240x320,480x640'); the first "
                         "query in an unlisted 64px bucket pays a compile")
    ap.add_argument("--quantize", type=int, default=0,
                    help="int8-quantize the transformer matmul kernels at "
                         "load (per-channel scales, CNN untouched; parity "
                         "pinned by tests/test_int8.py)")
    args = ap.parse_args(argv)
    quantize = bool(args.quantize)
    hws = [tuple(int(d) for d in r.split("x"))
           for r in args.warmup_resolutions.split(",") if r.strip()]

    def warm(s, default):
        s.warmup(hws or default)

    if args.task == "vqa":
        assert args.ans2label_path, "--task vqa needs --ans2label_path"
        vqa = VQAScorer.from_checkpoint(
            args.model_config, args.tokenizer_dir, args.e2e_weights_path,
            args.ans2label_path, max_img_size=args.max_img_size,
            max_questions=args.max_captions, quantize=quantize)
        warm(vqa, ((480, 640),))
        server = make_http_server(None, args.host, args.port, vqa=vqa)
    elif args.task in MC_QA_TASKS + ("frameqa", "msrvtt_qa"):
        vqa_scorer = VideoQAScorer.from_checkpoint(
            args.model_config, args.tokenizer_dir, args.e2e_weights_path,
            args.task, ans2label_path=args.ans2label_path,
            n_clips=args.n_clips, num_frm=args.num_frm, fps=args.fps,
            max_img_size=args.max_img_size,
            max_questions=args.max_captions,
            score_agg_func=args.score_agg_func, quantize=quantize)
        warm(vqa_scorer, ((240, 320),))
        server = make_http_server(None, args.host, args.port,
                                  videoqa=vqa_scorer)
    else:
        scorer = RetrievalScorer.from_checkpoint(
            args.model_config, args.tokenizer_dir, args.e2e_weights_path,
            n_clips=args.n_clips, num_frm=args.num_frm, fps=args.fps,
            max_img_size=args.max_img_size, max_captions=args.max_captions,
            quantize=quantize)
        warm(scorer, ((240, 320),))
        server = make_http_server(scorer, args.host, args.port)
    LOGGER.info(f"serving on {args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()

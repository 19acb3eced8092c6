"""Jitted train / eval steps — the single trainer engine.

The reference re-implements its training loop in five task runners
(`/root/reference/src/tasks/run_*.py`, `/root/reference/src/pretrain/
run_pretrain.py`); the per-step semantics being reproduced here are:

 - pretrain: loss = mlm_loss.mean() + itm_loss.mean() (run_pretrain.py:387-395)
 - VQA: loss = bce(per-elem).mean() * num_labels (run_vqa.py:355-356,
   modeling.py:310-316)
 - MIL video tasks: per-clip forward x train_n_clips, clip-axis aggregation
   mean | max | lse, where lse is CE over LSE-pooled logits
   (run_video_retrieval.py:396-421, run_video_qa.py:473-501)
 - retrieval: ce over (B,2) logits or margin-rank with rows viewed
   (sample_size, -1), column 0 positive (modeling.py:560-580)
 - optimizer: 8-group AdamW, per-group schedule-derived lr every step,
   grad clipping by global norm (run_video_qa.py:521-546)
 - gradient accumulation (config gradient_accumulation_steps,
   run_pretrain.py:398-404)

TPU-first design (deliberately NOT a translation):

 - The per-clip Python loop becomes a *clip-axis fold into batch*: all
   `train_n_clips` clips run through the CNN and BERT as one big batched
   XLA program (the MXU wants large batched matmuls; the reference pays
   num_clips kernel-launch rounds per step).
 - Gradient accumulation is a `lax.scan` over a leading micro-batch axis
   inside the jitted step — no host round-trips between micro-steps.
 - The LR schedules evaluate inside the jitted update from the step counter.
 - Data parallelism is GSPMD: the step is jitted with batch inputs sharded
   on the mesh `data` axis and params replicated; XLA inserts the gradient
   all-reduce over ICI (replacing Horovod's NCCL hooks,
   run_pretrain.py:295-301).
"""

from __future__ import annotations

import dataclasses
import threading
from dataclasses import dataclass
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clipbert_tpu.core.config import ModelConfig
from clipbert_tpu.core.mesh import DATA_AXIS, MODEL_AXIS
from clipbert_tpu.core.rng import RngGen
from clipbert_tpu.models import clipbert
from clipbert_tpu.train import optim, sched
from clipbert_tpu.train.optim import AdamWState, OptimConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# settings
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TaskSettings:
    """Static per-task step configuration (hashable; safe as a jit static)."""

    head_type: str                  # pretrain|seq_cls|multi_choice|regression|retrieval
    num_labels: int = 2
    loss_type: str = "ce"           # ce|bce|mse|rank
    score_agg_func: str = "mean"    # mean|max|lse
    train_n_clips: int = 1          # clips folded per step (1 for image tasks)
    group_size: int = 1             # texts per visual (static n_examples fan-out)
    margin: float = 0.2             # rank loss margin
    use_mlm: bool = True
    use_itm: bool = True
    scale_loss_by_num_labels: bool = False  # VQA bce convention
    remat: Any = False   # False|True|'stage'|'block'|'early' (resnet50_forward)


@dataclass(frozen=True)
class ScheduleSettings:
    """Static LR schedule configuration for the two param families."""

    learning_rate: float = 5e-5
    cnn_learning_rate: float = 5e-5
    decay: str = "linear"
    cnn_decay: str = "linear"
    num_train_steps: int = 1000
    warmup_ratio: float = 0.1
    step_decay_epochs: Optional[Tuple[int, ...]] = None
    cnn_step_decay_epochs: Optional[Tuple[int, ...]] = None
    steps_per_epoch: int = 0  # needed only for multi_step decay

    def lrs(self, global_step):
        epoch = (jnp.asarray(global_step, jnp.float32) / self.steps_per_epoch
                 if self.steps_per_epoch else jnp.float32(0.0))
        lr_t = sched.get_lr(global_step, self.decay, self.learning_rate,
                            self.num_train_steps, self.warmup_ratio,
                            self.step_decay_epochs, epoch)
        lr_c = sched.get_lr(global_step, self.cnn_decay, self.cnn_learning_rate,
                            self.num_train_steps, self.warmup_ratio,
                            self.cnn_step_decay_epochs, epoch)
        return lr_t, lr_c


class TrainState(NamedTuple):
    params: Params
    opt: AdamWState


def init_train_state(params: Params) -> TrainState:
    return TrainState(params, optim.init_adamw_state(params))


# ---------------------------------------------------------------------------
# forward: clip-axis folding
# ---------------------------------------------------------------------------

def mil_forward(params: Params, cfg: ModelConfig, ts: TaskSettings,
                batch: Dict[str, jnp.ndarray], rngs: RngGen, train: bool,
                compute_dtype=jnp.bfloat16,
                fused_attn: bool = False) -> jnp.ndarray:
    """All `train_n_clips` clips through CNN+BERT as ONE batched program.

    batch["visual_inputs"]: (B_v, num_clips * num_frm, H, W, 3)
    batch["text_input_ids"]/["text_input_mask"]: (B_t, Lt), B_t = B_v * G

    Returns per-clip logits (B_t', num_clips, num_labels) where B_t' = B_t
    except for multi_choice where B_t' = B_t // num_labels (options folded
    into the label axis, as the reference's MultipleChoice head reshape).
    """
    vis = batch["visual_inputs"]
    B_v = vis.shape[0]
    nc = ts.train_n_clips
    nf = vis.shape[1] // nc
    H, W, C = vis.shape[2:]
    G = ts.group_size

    # (B_v, nc*nf, H, W, 3) -> clip-major (nc*B_v, nf, H, W, 3)
    vis = vis.reshape(B_v, nc, nf, H, W, C).transpose(1, 0, 2, 3, 4, 5)
    vis = vis.reshape(nc * B_v, nf, H, W, C)
    feats = clipbert.cnn_forward(params["cnn"], vis, compute_dtype,
                                 remat=(ts.remat if train else False))
    # fan out to texts: consecutive repeat inside each clip block
    if G > 1:
        feats = feats.reshape((nc, B_v) + feats.shape[1:])
        feats = jnp.repeat(feats, G, axis=1)
        feats = feats.reshape((nc * B_v * G,) + feats.shape[2:])

    B_t = batch["text_input_ids"].shape[0]
    assert B_t == B_v * G, (B_t, B_v, G)
    ids = jnp.tile(batch["text_input_ids"], (nc, 1))
    mask = jnp.tile(batch["text_input_mask"], (nc, 1))

    out = clipbert.clipbert_forward(
        params, cfg, {"text_input_ids": ids, "text_input_mask": mask},
        ts.head_type, train=train, rngs=rngs, compute_dtype=compute_dtype,
        visual_features=feats, group_size=1, remat=(ts.remat if train else False),
        fused_attn=fused_attn)
    logits = out["logits"]  # (nc*B_t, L_head)

    if ts.head_type == "multi_choice":
        # options are consecutive texts; head emits 1 logit per option
        nq = B_t // ts.num_labels
        logits = logits.reshape(nc, nq, ts.num_labels)
    else:
        logits = logits.reshape(nc, B_t, -1)
    return logits.transpose(1, 0, 2)  # (B', nc, L)


def aggregate_clips(logits: jnp.ndarray, agg: str) -> jnp.ndarray:
    """(B, nc, L) -> (B, L) for mean/max; lse callers keep the clip axis
    (pooling folds into the CE, run_video_retrieval.py:404-418)."""
    if agg == "mean":
        return logits.mean(axis=1)
    if agg == "max":
        return logits.max(axis=1)
    raise ValueError(f"aggregate_clips called with {agg}")


def lse_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """CE over LSE-pooled clip logits (run_video_retrieval.py:415-418):
    loss[b] = LSE_{t,l}(logits[b]) - LSE_t(logits[b,:,label_b])."""
    logits = logits.astype(jnp.float32)
    B = logits.shape[0]
    all_lse = jax.scipy.special.logsumexp(
        logits.reshape(B, -1), axis=-1, keepdims=True)      # (B, 1)
    per_label = jax.scipy.special.logsumexp(logits, axis=1)  # (B, L)
    out = all_lse - per_label
    return jnp.take_along_axis(out, labels.reshape(-1, 1), axis=-1)[:, 0]


def lse_pooled_logits(logits: jnp.ndarray) -> jnp.ndarray:
    """Eval-time LSE pooling over the clip axis (run_video_retrieval.py:668-677)."""
    return jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=1)


def pool_clip_logits(logits: jnp.ndarray, agg: str) -> jnp.ndarray:
    """Eval pooling for all three agg functions; (B, nc, L) -> (B, L)."""
    if agg == "lse":
        return lse_pooled_logits(logits)
    return aggregate_clips(logits, agg)


# ---------------------------------------------------------------------------
# losses per task
# ---------------------------------------------------------------------------

def task_loss(cfg: ModelConfig, ts: TaskSettings,
              batch: Dict[str, jnp.ndarray],
              clip_logits: jnp.ndarray) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """(B, nc, L) per-clip logits + labels -> (scalar loss, metrics)."""
    labels = batch["labels"]
    metrics: Dict[str, jnp.ndarray] = {}

    if ts.score_agg_func == "lse":
        loss = lse_loss(clip_logits, labels).mean()
        pooled = lse_pooled_logits(clip_logits)
    else:
        pooled = aggregate_clips(clip_logits, ts.score_agg_func)
        if ts.head_type == "retrieval" and ts.loss_type == "rank":
            sample_size = batch["visual_inputs"].shape[0]
            loss = clipbert.retrieval_rank_loss(
                pooled, sample_size, ts.margin).mean()
        elif ts.head_type in ("multi_choice",):
            loss = clipbert.cross_entropy(pooled, labels).mean()
        elif ts.num_labels == 1:
            # single-logit heads regress regardless of loss_type
            # (reference modeling.py calc_loss: num_labels == 1 -> MSELoss)
            loss = clipbert.mse(pooled, labels).mean()
        elif ts.loss_type == "bce":
            loss = clipbert.bce_with_logits(pooled, labels).mean()
            if ts.scale_loss_by_num_labels:
                loss = loss * ts.num_labels   # run_vqa.py:355-356
        else:
            loss = clipbert.cross_entropy(
                pooled.reshape(-1, pooled.shape[-1]), labels.reshape(-1)).mean()

    if ts.head_type != "retrieval" and ts.loss_type != "bce" and pooled.ndim == 2 \
            and pooled.shape[-1] > 1 and labels.ndim == 1:
        metrics["acc"] = (pooled.argmax(-1) == labels).mean()
    return loss, metrics


def pretrain_loss(cfg: ModelConfig, ts: TaskSettings,
                  params: Params, batch: Dict[str, jnp.ndarray],
                  rngs: RngGen, train: bool, compute_dtype
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    out = clipbert.clipbert_forward(
        params, cfg, batch, "pretrain", train=train, rngs=rngs,
        compute_dtype=compute_dtype, group_size=ts.group_size,
        remat=(ts.remat if train else False))
    losses = clipbert.pretrain_losses(
        cfg, out,
        batch.get("mlm_labels") if ts.use_mlm else None,
        batch.get("itm_labels") if ts.use_itm else None)
    total = jnp.float32(0.0)
    metrics: Dict[str, jnp.ndarray] = {}
    if "mlm_loss" in losses:
        mlm = losses["mlm_loss"].mean()
        metrics["mlm_loss"] = mlm
        # MLM token accuracy over masked positions (run_pretrain.py:231-241)
        mlm_labels = batch["mlm_labels"].reshape(-1)
        valid = mlm_labels != -100
        pred = out["mlm_scores"].reshape(-1, cfg.vocab_size).argmax(-1)
        metrics["mlm_acc"] = (jnp.where(valid, pred == mlm_labels, False).sum()
                              / jnp.maximum(valid.sum(), 1))
        total = total + mlm
    if "itm_loss" in losses:
        itm = losses["itm_loss"].mean()
        metrics["itm_loss"] = itm
        itm_labels = batch["itm_labels"].reshape(-1)
        pred = out["itm_scores"].argmax(-1)
        metrics["itm_acc"] = (pred == itm_labels).mean()
        total = total + itm
    return total, metrics


def compute_loss(params: Params, cfg: ModelConfig, ts: TaskSettings,
                 batch: Dict[str, jnp.ndarray], step_key: Optional[jax.Array],
                 train: bool, compute_dtype=jnp.bfloat16
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    rngs = RngGen(step_key if train else None)
    if ts.head_type == "pretrain":
        return pretrain_loss(cfg, ts, params, batch, rngs, train, compute_dtype)
    clip_logits = mil_forward(params, cfg, ts, batch, rngs, train, compute_dtype)
    loss, metrics = task_loss(cfg, ts, batch, clip_logits)
    return loss, metrics


# ---------------------------------------------------------------------------
# train step factory
# ---------------------------------------------------------------------------

def make_train_step(cfg: ModelConfig, ts: TaskSettings, oc: OptimConfig,
                    ss: ScheduleSettings, meta,
                    mesh: Optional[Mesh] = None,
                    accum_steps: int = 1,
                    compute_dtype=jnp.bfloat16,
                    state_shardings=None,
                    jit_compile: bool = True) -> Callable:
    """Build the jitted train step.

    step(state, batch, key) -> (state, metrics). With accum_steps > 1 every
    batch leaf must carry a leading (accum_steps, ...) micro-batch axis; the
    grads are averaged over micro-steps inside one compiled program
    (replacing the reference's delay_unscale amp dance,
    run_pretrain.py:398-404).
    """

    def loss_fn(params, batch, key):
        loss, metrics = compute_loss(params, cfg, ts, batch, key, True,
                                     compute_dtype)
        return loss, metrics

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state: TrainState, batch, key):
        if accum_steps == 1:
            (loss, metrics), grads = grad_fn(state.params, batch, key)
        else:
            keys = jax.random.split(key, accum_steps)

            def micro(carry, xs):
                mb, k = xs
                (l, m), g = grad_fn(state.params, mb, k)
                g_acc = jax.tree.map(jnp.add, carry[0], g)
                return (g_acc, carry[1] + l, carry[2] + 1), m

            zero = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            (gsum, lsum, _), ms = jax.lax.scan(
                micro, (zero, jnp.float32(0.0), 0), (batch, keys))
            grads = jax.tree.map(lambda g: g / accum_steps, gsum)
            loss = lsum / accum_steps
            metrics = jax.tree.map(lambda x: x.mean(), ms)

        # the reference evaluates the schedule at the POST-increment step
        # (run_video_qa.py:515-525: global_step += 1 then get_lr_sched);
        # opt.step is the count of completed updates, so this one is step+1
        lr_t, lr_c = ss.lrs(state.opt.step + 1)
        # group-fused update except under tensor-parallel state shardings
        # (concatenating model-axis-sharded leaves would force gathers)
        new_params, new_opt, grad_norm = optim.adamw_update(
            state.params, grads, state.opt, meta, oc, lr_t, lr_c,
            fused=state_shardings is None)
        metrics = dict(metrics, loss=loss, grad_norm=grad_norm,
                       lr=lr_t, cnn_lr=lr_c)
        return TrainState(new_params, new_opt), metrics

    if not jit_compile:
        # raw traceable step — callers embed it in their own jitted program
        # (e.g. scripts/bench_train_step.py scans it on-device: the remote
        # platform defers unfetched per-call executions, so a scanned chain
        # with one scalar fetch is the only honest multi-step clock)
        return step

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(None, "data") if accum_steps > 1
                         else P("data"))
    state_sh = state_shardings if state_shardings is not None else repl
    return jax.jit(
        step,
        in_shardings=(state_sh, data, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,))


def make_eval_step(cfg: ModelConfig, ts: TaskSettings,
                   compute_dtype=jnp.bfloat16,
                   fused_attn: bool = False) -> Callable:
    """Forward-only step: (params, batch) -> {pooled logits, per-clip logits}.

    fused_attn defaults OFF here (unlike the cached-feature scoring
    programs): eval batches put at most a few hundred joint sequences
    through BERT per step, and at that size the Pallas kernel measured a
    net LOSS on the bench unit (1271 vs 1318 clips/s at 128 sequences) —
    the HBM score-tensor saving it exists for scales with batch."""

    def step(params, batch):
        clip_logits = mil_forward(params, cfg, ts, batch, RngGen(None),
                                  False, compute_dtype, fused_attn=fused_attn)
        return {"clip_logits": clip_logits,
                "logits": pool_clip_logits(clip_logits, ts.score_agg_func)}

    # no pinned in_shardings: eval batches keep whatever sharding the host
    # gave them (sharded when divisible, replicated tail batches otherwise)
    return jax.jit(step)


def make_pretrain_eval_step(cfg: ModelConfig, ts: TaskSettings,
                            compute_dtype=jnp.bfloat16) -> Callable:
    """Validation forward for pretraining: returns mlm/itm scores + losses."""

    def step(params, batch):
        out = clipbert.clipbert_forward(
            params, cfg, batch, "pretrain", train=False,
            compute_dtype=compute_dtype, group_size=ts.group_size)
        losses = clipbert.pretrain_losses(
            cfg, out,
            batch.get("mlm_labels") if ts.use_mlm else None,
            batch.get("itm_labels") if ts.use_itm else None)
        return {**out, **losses}

    return jax.jit(step)


# ---------------------------------------------------------------------------
# retrieval eval: visual features cached once per clip, reused across texts
# ---------------------------------------------------------------------------

# The inference step factories below are MEMOIZED on their static
# configuration: every `jax.jit` object has its own trace/executable cache,
# so a fresh object per call re-traces the program — and the eval scoring
# programs unroll all 12 BERT layers (a multi-second host-side trace on
# small hosts) and recompile server-side on remote platforms. Before this,
# each `inference_retrieval`/validate call paid the full trace again and the
# measured decode-inclusive e2e sat ~12x below its slowest pipeline stage
# (BENCH_r03: 14.3 clips/s vs decode 224). Keyed by every static the closure
# captures; the values are plain jitted callables (thread-safe to execute —
# the lock only guards double-builds under serving concurrency).
_STEP_CACHE: Dict[Any, Callable] = {}
# RLock: builds nest (make_text_prob_step's build calls
# make_text_score_step, which re-enters _memo_step on the same thread)
_STEP_CACHE_LOCK = threading.RLock()


def _memo_step(key, build: Callable[[], Callable]) -> Callable:
    fn = _STEP_CACHE.get(key)
    if fn is None:
        with _STEP_CACHE_LOCK:
            fn = _STEP_CACHE.get(key)
            if fn is None:
                _STEP_CACHE[key] = fn = build()
    return fn


def _cfg_key(cfg: Optional[ModelConfig]):
    return None if cfg is None else dataclasses.astuple(cfg)


def make_visual_encode_step(compute_dtype=jnp.bfloat16) -> Callable:
    """(params, pixels (B, T, H, W, 3)) -> grid features.

    The reference recomputes the CNN for every text minibatch of the same
    video (run_video_retrieval.py:640-666); caching per-clip features and
    reusing them across all captions removes that entire recompute.
    """

    def build():
        def step(params, pixels):
            return clipbert.cnn_forward(params["cnn"], pixels, compute_dtype)

        return jax.jit(step)

    return _memo_step(("visual_encode", jnp.dtype(compute_dtype).name), build)


def fused_attn_default(mesh: Optional[Mesh] = None, num_heads: int = 12):
    """How inference scoring programs run the attention core: False (XLA
    einsum), True (Pallas fused kernel, ops/pallas_attention.py), or a
    tensor-parallel Mesh (fused kernel shard_mapped over the head axis).
    Measured on the real chip at the retrieval scoring shape
    (scripts/perf_attn_ab.py, B=8192 seq=69): the 12-layer encoder goes
    58.3 -> 71.8 TF/s (+23%) because the fp32 (B, H, S, S) score tensor
    stays in VMEM instead of round-tripping HBM.

    Mosaic kernels are not partitioned by GSPMD, so: auto-on when this
    process drives ONE device (the bench/serving topology); on
    multi-device hosts with a data-parallel `mesh` the whole scoring step
    runs under shard_map (make_text_score_step), which executes the kernel
    per-device; on a tensor-parallel mesh (model axis > 1, Megatron head
    split) the return value is the MESH itself and only the attention core
    is shard_mapped over (batch, heads) inside the GSPMD program
    (ops/attention.py, fused_attention_shard_heads) — params stay
    TP-sharded, zero extra collectives. The backend test is != "cpu"
    (the dev tunnel reports platform "axon"), matching
    compile_cache/pallas interpret gating."""
    if jax.default_backend() == "cpu":
        return False
    # the mesh decides BEFORE the local-device-count shortcut: a multi-host
    # TP mesh can be driven by 1-local-device processes, and returning True
    # there would select the whole-step DP shard_map path whose replicated
    # in_specs contradict the Megatron-sharded params
    if mesh is not None:
        if mesh.shape[MODEL_AXIS] == 1:
            return True
        # TP: heads must divide across the model axis for the shard_map
        return mesh if num_heads % mesh.shape[MODEL_AXIS] == 0 else False
    return jax.local_device_count() == 1


def make_text_score_step(cfg: ModelConfig, ts: TaskSettings,
                         compute_dtype=jnp.bfloat16,
                         fused_attn: Optional[bool] = None,
                         mesh: Optional[Mesh] = None) -> Callable:
    """(params, feats (B_v, nc, T, Hg, Wg, D), ids (B_t, Lt), mask) ->
    (B_v, B_t, nc, L) logits: a batch of cached videos' clips scored against
    a text minibatch. Videos AND clips fold into one big BERT batch
    (B_v*nc*B_t sequences) so the MXU stays saturated.

    With a multi-device data-parallel `mesh` AND the fused attention core,
    the step runs under `jax.shard_map` over the caption axis (params and
    cached features replicated, ids/mask and the output's B_t dim sharded
    on `data`) — each device executes the whole scoring chain including
    the Mosaic kernel on its caption shard, since GSPMD cannot partition
    a pallas_call. The caption minibatch must divide by the mesh `data`
    size (inference_retrieval already rounds it up). The einsum path needs
    no wrapper: its batch inputs shard under plain GSPMD."""
    fused = (fused_attn_default(mesh, cfg.num_attention_heads)
             if fused_attn is None else fused_attn)

    def build():
        return _build_text_score_step(cfg, ts, compute_dtype, fused, mesh)

    return _memo_step(("text_score", _cfg_key(cfg), ts,
                       jnp.dtype(compute_dtype).name, fused, mesh), build)


def _build_text_score_step(cfg: ModelConfig, ts: TaskSettings,
                           compute_dtype, fused: bool,
                           mesh: Optional[Mesh]) -> Callable:
    def step(params, feats, ids, mask):
        B_v, nc = feats.shape[:2]
        B_t = ids.shape[0]
        # (B_v, nc, ...) -> (B_v*nc*B_t, ...): every (video, clip) paired
        # with every text in the minibatch
        f = feats.reshape((B_v * nc,) + feats.shape[2:])
        f = jnp.repeat(f, B_t, axis=0)
        out = clipbert.clipbert_forward(
            params, cfg,
            {"text_input_ids": jnp.tile(ids, (B_v * nc, 1)),
             "text_input_mask": jnp.tile(mask, (B_v * nc, 1))},
            ts.head_type, train=False, compute_dtype=compute_dtype,
            visual_features=f, group_size=1,
            # full layer unroll: +4% at the batch-8192 seq-70 scoring shape
            # (bert.encoder docstring); eval programs compile once + cache
            unroll=True, fused_attn=fused)
        return out["logits"].reshape(B_v, nc, B_t, -1).transpose(0, 2, 1, 3)

    if fused is True and mesh is not None and mesh.shape[DATA_AXIS] > 1:
        # check_vma needs varying-mesh-axes annotations pallas_call's
        # out_shape doesn't carry; the specs here are total (every input
        # and the output fully described), so the check adds nothing
        step = jax.shard_map(
            step, mesh=mesh,
            in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(None, DATA_AXIS), check_vma=False)
    return jax.jit(step)


def make_text_prob_step(cfg: ModelConfig, ts: TaskSettings,
                        compute_dtype=jnp.bfloat16,
                        fused_attn: Optional[bool] = None,
                        mesh: Optional[Mesh] = None) -> Callable:
    """Like make_text_score_step but with clip pooling + softmax/sigmoid
    fused into the SAME program, returning (B_v, B_t) fp32 positive-class
    probabilities (run_video_retrieval.py:679-682 semantics). Callers fetch
    ONE array per video batch instead of one per caption minibatch — on
    remote/tunneled hosts the per-fetch RTT otherwise serializes the
    scoring loop. `mesh` enables the fused-attention core on multi-device
    hosts (see make_text_score_step)."""

    def build():
        score = make_text_score_step(cfg, ts, compute_dtype, fused_attn,
                                     mesh)

        def step(params, feats, ids, mask):
            clip_logits = score(params, feats, ids, mask)  # (B_v, B_t, nc, L)
            B_v, B_t = clip_logits.shape[:2]
            pooled = pool_clip_logits(
                clip_logits.reshape((-1,) + clip_logits.shape[2:]),
                ts.score_agg_func).astype(jnp.float32).reshape(B_v, B_t, -1)
            if ts.loss_type == "ce":
                return jax.nn.softmax(pooled, axis=-1)[..., 1]
            return jax.nn.sigmoid(pooled[..., 0])

        return jax.jit(step)

    return _memo_step(("text_prob", _cfg_key(cfg), ts,
                       jnp.dtype(compute_dtype).name, fused_attn, mesh),
                      build)


def make_videoqa_prob_step(cfg: ModelConfig, ts: TaskSettings,
                           compute_dtype=jnp.bfloat16,
                           fused_attn: Optional[bool] = None) -> Callable:
    """(params, feats (1, nc, T, Hg, Wg, D), ids (B_t, Lt), mask) ->
    answer probabilities for ONE cached video with the video-QA protocol's
    clip handling (run_video_qa.py:216-362: per-clip logits pooled by
    score_agg_func, then argmax). Two head shapes:

     - seq_cls (open-ended frameqa/msrvtt_qa): B_t questions, softmax over
       the ans2label vocabulary -> (B_t, num_labels);
     - multi_choice (action/transition): B_t = n_q * num_labels
       question+option concat texts, each scoring ONE logit; softmax over
       each question's option block -> (n_q, num_labels).
    """

    def build():
        score = make_text_score_step(cfg, ts, compute_dtype, fused_attn)

        def step(params, feats, ids, mask):
            clip_logits = score(params, feats, ids, mask)[0]  # (B_t, nc, L)
            pooled = pool_clip_logits(
                clip_logits, ts.score_agg_func).astype(jnp.float32)
            if ts.head_type == "multi_choice":
                pooled = pooled.reshape(-1, ts.num_labels)    # (n_q, options)
            return jax.nn.softmax(pooled, axis=-1)

        return jax.jit(step)

    return _memo_step(("videoqa_prob", _cfg_key(cfg), ts,
                       jnp.dtype(compute_dtype).name, fused_attn), build)


def make_qa_answer_step(cfg: ModelConfig, ts: TaskSettings,
                        compute_dtype=jnp.bfloat16,
                        fused_attn: Optional[bool] = None) -> Callable:
    """(params, feats (1, T, Hg, Wg, D), ids (B_q, Lt), mask) ->
    (B_q, num_labels) fp32 answer probabilities for one cached visual —
    the serving-side unit of VQA/open-ended-QA inference (sigmoid over the
    bce head like the reference's VQA protocol, run_vqa.py:347-356;
    softmax for ce heads). The single visual fans out to every question in
    the minibatch via the group mechanism; the layer scan unrolls and the
    attention core fuses like the retrieval scoring programs
    (bert.encoder docstring, fused_attn_default)."""
    fused = fused_attn_default() if fused_attn is None else fused_attn

    def build():
        def step(params, feats, ids, mask):
            out = clipbert.clipbert_forward(
                params, cfg, {"text_input_ids": ids,
                              "text_input_mask": mask},
                "seq_cls", train=False, compute_dtype=compute_dtype,
                visual_features=feats, group_size=ids.shape[0], unroll=True,
                fused_attn=fused)
            logits = out["logits"].astype(jnp.float32)
            if ts.loss_type == "bce":
                return jax.nn.sigmoid(logits)
            return jax.nn.softmax(logits, axis=-1)

        return jax.jit(step)

    return _memo_step(("qa_answer", _cfg_key(cfg), ts,
                       jnp.dtype(compute_dtype).name, fused), build)

"""The single trainer engine.

The reference re-implements this loop five times (`src/tasks/run_*.py`,
`src/pretrain/run_pretrain.py`, ~60% shared boilerplate — SURVEY.md §1).
Here it exists once; task runners supply a :class:`TaskSpec` with their
loaders, step settings, and a validation callable.

Per-step semantics preserved from the reference loop (e.g.
run_video_qa.py:455-560): running-loss EMA, schedule-derived per-group LRs,
grad-norm logging, periodic restorer save, validation + deployment
checkpoint every `valid_steps`, debug truncation (config.py:45-48).

TPU-first: the whole step (forward all clips + losses + AdamW + schedules)
is ONE jitted program; batches stream through the PrefetchLoader which
overlaps host->device transfer with compute; normalization runs on device.
"""

from __future__ import annotations

import math
import os
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from clipbert_tpu.ckpt import checkpoint, torch_import
from clipbert_tpu.core.config import ModelConfig, RunConfig
from clipbert_tpu.core.mesh import localize_tree, make_mesh, replicate_tree
from clipbert_tpu.data import transforms
from clipbert_tpu.models import clipbert
from clipbert_tpu.train import optim, steps
from clipbert_tpu.utils import distributed as dist
from clipbert_tpu.utils.logger import LOGGER, TB_LOGGER, NoOp, RunningMeter


@dataclass
class TaskSpec:
    """Everything task-specific the engine needs."""

    name: str
    head_type: str
    settings: steps.TaskSettings
    train_loader: Any                       # iterable of host batches
    steps_per_epoch: int
    # validate(params, eval_step_fn) -> metrics dict
    validate_fn: Optional[Callable] = None
    # keys of the batch that are labels/inputs to move to device
    mean: tuple = transforms.IMAGENET_MEAN_255
    std: tuple = transforms.IMAGENET_STD_1
    max_img_size: int = 448       # device-preprocess resize target


def optim_config_from_run(cfg: RunConfig) -> optim.OptimConfig:
    return optim.OptimConfig(
        optim=cfg.optim,
        learning_rate=cfg.learning_rate,
        cnn_learning_rate=cfg.cnn_learning_rate,
        weight_decay=cfg.weight_decay,
        cnn_weight_decay=cfg.cnn_weight_decay,
        betas=tuple(cfg.betas),
        grad_norm=cfg.grad_norm,
        transformer_lr_mul=cfg.transformer_lr_mul,
        transformer_lr_mul_prefix=cfg.transformer_lr_mul_prefix,
        cnn_lr_mul=cfg.cnn_lr_mul,
        cnn_lr_mul_prefix=cfg.cnn_lr_mul_prefix,
        freeze_cnn=cfg.freeze_cnn)


def schedule_from_run(cfg: RunConfig, num_train_steps: int,
                      steps_per_epoch: int) -> steps.ScheduleSettings:
    return steps.ScheduleSettings(
        learning_rate=cfg.learning_rate,
        cnn_learning_rate=cfg.cnn_learning_rate,
        decay=cfg.decay, cnn_decay=cfg.cnn_lr_decay,
        num_train_steps=num_train_steps,
        warmup_ratio=cfg.warmup_ratio,
        step_decay_epochs=(tuple(cfg.step_decay_epochs)
                           if cfg.step_decay_epochs else None),
        cnn_step_decay_epochs=(tuple(cfg.cnn_step_decay_epochs)
                               if cfg.cnn_step_decay_epochs else None),
        steps_per_epoch=steps_per_epoch)


# ---------------------------------------------------------------------------
# model setup (reference setup_model, e.g. run_video_qa.py:152-205)
# ---------------------------------------------------------------------------

def _load_flat_ckpt(path: str) -> Dict[str, np.ndarray]:
    """Load a flat {name: np.array} dict from .npz (ours) or .pt (torch)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def _is_tf_checkpoint(path: str) -> bool:
    """TF-1 checkpoint prefix: its `<prefix>.index` file must exist (given
    directly or implied). No name heuristics — torch checkpoints are also
    commonly named `*.ckpt` (e.g. Lightning) and must route to torch.load."""
    return path.endswith(".index") or os.path.exists(path + ".index")


def setup_model(run_cfg: RunConfig, model_cfg: ModelConfig, head_type: str,
                seed: Optional[int] = None):
    """Init params; then e2e weights OR separate cnn/bert weights, each via
    the mismatch-tolerant merger (e2e_model.py:41-46, run_video_qa.py:185-198)."""
    key = jax.random.key(run_cfg.seed if seed is None else seed)
    params = clipbert.init_clipbert(key, model_cfg, head_type)
    params = jax.tree.map(np.asarray, params)

    if run_cfg.e2e_weights_path:
        LOGGER.info(f"Loading e2e weights from {run_cfg.e2e_weights_path}")
        flat = _load_flat_ckpt(run_cfg.e2e_weights_path)
        if any("/" in k for k in flat):     # our own flattened format
            params, report = checkpoint.load_with_mismatch(params, flat)
        else:                               # reference torch e2e state_dict
            imported = import_torch_e2e(
                flat, model_cfg, head_type,
                bgr_checkpoint=run_cfg.img_input_format == "BGR")
            params, report = checkpoint.load_with_mismatch(
                params, checkpoint.flatten_tree(imported))
        LOGGER.info(f"e2e load report: missing={len(report['missing'])} "
                    f"mismatched={report['mismatched']}")
    else:
        if run_cfg.backbone_weights_path:
            LOGGER.info(
                f"Loading cnn weights from {run_cfg.backbone_weights_path}")
            flat = _load_flat_ckpt(run_cfg.backbone_weights_path)
            bgr = run_cfg.img_input_format == "BGR"
            if any(k.startswith(("layer1", "conv1")) for k in flat):
                cnn = torch_import.import_resnet50_torchvision(flat)
            else:
                cnn = torch_import.import_resnet50_d2(flat, bgr_checkpoint=bgr)
            merged, report = checkpoint.load_with_mismatch(
                params["cnn"]["resnet"], checkpoint.flatten_tree(cnn))
            params["cnn"]["resnet"] = merged
            LOGGER.info(f"cnn load report: missing={len(report['missing'])} "
                        f"mismatched={report['mismatched']}")
        if run_cfg.bert_weights_path:
            LOGGER.info(f"Loading bert weights from {run_cfg.bert_weights_path}")
            bp = run_cfg.bert_weights_path
            if _is_tf_checkpoint(bp):
                # TF-1 BERT checkpoint (the reference's from_tf load,
                # transformers.py:64-137)
                bert_tree = torch_import.import_bert_tf(
                    bp.removesuffix(".index"), model_cfg.num_hidden_layers)
                cls_tree = bert_tree.pop("cls", None)
                if cls_tree is not None and "cls" in params["transformer"]:
                    merged, _ = checkpoint.load_with_mismatch(
                        params["transformer"]["cls"],
                        checkpoint.flatten_tree(cls_tree))
                    params["transformer"]["cls"] = merged
            else:
                flat = _load_flat_ckpt(bp)
                flat = {k.removeprefix("bert."): v for k, v in flat.items()}
                bert_tree = {
                    "embeddings": torch_import.import_bert_text_embeddings(flat),
                    "encoder": torch_import.import_bert_encoder(
                        flat, model_cfg.num_hidden_layers),
                    "pooler": torch_import.import_bert_pooler(flat),
                }
            merged, _ = checkpoint.load_with_mismatch(
                params["transformer"]["bert"],
                checkpoint.flatten_tree(bert_tree))
            params["transformer"]["bert"] = merged
    return params


def import_torch_e2e(flat: Dict[str, np.ndarray], cfg: ModelConfig,
                     head_type: str, bgr_checkpoint: bool = True) -> Dict:
    """Reference e2e `model_step_N.pt` state_dict -> our full pytree.
    Key scheme: cnn.backbone..., cnn.grid_encoder..., transformer.bert...,
    transformer.classifier/cls... (e2e_model.py:13-27)."""
    cnn_sd = torch_import.strip_prefix(flat, "cnn.")
    bert_sd = torch_import.strip_prefix(flat, "transformer.bert.")
    out: Dict = {
        "cnn": {
            "resnet": torch_import.import_resnet50_d2(
                cnn_sd, bgr_checkpoint=bgr_checkpoint),
            "grid_encoder": torch_import.import_grid_encoder(cnn_sd),
        },
        "transformer": {
            "bert": torch_import.import_clipbert_base(bert_sd, cfg)},
    }
    tsd = torch_import.strip_prefix(flat, "transformer.")
    if head_type == "pretrain":
        out["transformer"]["cls"] = torch_import.import_pretraining_heads(tsd)
    elif f"classifier.0.weight" in tsd:
        out["transformer"]["classifier"] = torch_import.import_mlp_head(tsd)
    return out


# ---------------------------------------------------------------------------
# the loop
# ---------------------------------------------------------------------------

def train(run_cfg: RunConfig, model_cfg: ModelConfig, spec: TaskSpec,
          mesh=None, max_steps: Optional[int] = None,
          stop_signal: Optional[Callable[[], bool]] = None) -> Dict[str, Any]:
    """Run training to completion; returns {params, global_step, history}.

    ``stop_signal`` (optional) is polled once per step; when it returns
    True the loop saves a restore bundle and exits cleanly — the next run
    auto-resumes from it. When None, a SIGTERM handler provides the same
    behavior (preemption-safe training: SIGTERM -> bundle -> resume)."""
    from clipbert_tpu.core import compile_cache
    compile_cache.enable()
    restore_sigterm = None
    if stop_signal is None:
        import signal
        flag = {"stop": False}

        def _on_term(signum, frame):
            flag["stop"] = True
            LOGGER.info("SIGTERM received: will checkpoint and exit "
                        "after this step")

        try:                       # signal.signal works in the main thread only
            prev = signal.signal(signal.SIGTERM, _on_term)
            restore_sigterm = (signal, prev)
        except ValueError:
            pass
        stop_signal = lambda: flag["stop"]  # noqa: E731
    try:
        return _train_loop(run_cfg, model_cfg, spec, mesh, max_steps,
                           stop_signal)
    finally:
        if restore_sigterm is not None:
            sig, prev = restore_sigterm
            sig.signal(sig.SIGTERM, prev)


def _train_loop(run_cfg: RunConfig, model_cfg: ModelConfig, spec: TaskSpec,
                mesh, max_steps, stop_signal) -> Dict[str, Any]:
    run_cfg.validate()
    mesh = mesh or make_mesh()
    main = dist.is_main_process()
    tb = TB_LOGGER if main else NoOp()
    out_dir = run_cfg.output_dir
    if main and out_dir:
        # args.json + model_config.json + a code.zip snapshot of the
        # package tree (reference save_training_meta, load_save.py:17-40)
        import clipbert_tpu
        code_dir = os.path.dirname(os.path.dirname(
            os.path.abspath(clipbert_tpu.__file__)))
        checkpoint.save_training_meta(out_dir, run_cfg.to_dict(),
                                      model_cfg.to_dict(), code_dir=code_dir)
        tb.create(os.path.join(out_dir, "log"))

    steps_per_epoch = max(1, spec.steps_per_epoch)
    num_train_steps = int(math.ceil(
        run_cfg.num_train_epochs * steps_per_epoch
        / run_cfg.gradient_accumulation_steps))
    if max_steps is not None:
        num_train_steps = min(num_train_steps, max_steps)
    if run_cfg.debug:
        num_train_steps = min(num_train_steps, 3)   # config.py:45-48
    # validate every ceil(steps/num_valid/min_valid)*min_valid steps — the
    # reference's rounding (run_vqa.py:302-304); debug validates every step
    min_valid = 1 if run_cfg.debug else max(run_cfg.min_valid_steps, 1)
    valid_steps = int(math.ceil(
        num_train_steps / max(run_cfg.num_valid, 1) / min_valid)) * min_valid
    valid_steps = max(valid_steps, 1)

    oc = optim_config_from_run(run_cfg)
    ss = schedule_from_run(run_cfg, num_train_steps, steps_per_epoch)
    params = setup_model(run_cfg, model_cfg, spec.head_type)
    meta = optim.build_group_meta(params, oc)
    groups = optim.count_groups(meta)
    # the reference asserts the 8-group structure (run_vqa.py:388); with an
    # empty lr_mul prefix the corresponding "top" groups are legally empty
    assert set(groups) <= set(range(-1, 8)), f"bad group ids: {groups}"

    from clipbert_tpu.core.dtypes import policy_for
    compute_dtype = policy_for(run_cfg.bf16).compute_dtype
    step_fn = steps.make_train_step(
        model_cfg, spec.settings, oc, ss, meta, mesh=mesh,
        accum_steps=run_cfg.gradient_accumulation_steps,
        compute_dtype=compute_dtype)
    eval_fn = steps.make_eval_step(model_cfg, spec.settings,
                                   compute_dtype=compute_dtype) \
        if spec.head_type != "pretrain" else \
        steps.make_pretrain_eval_step(model_cfg, spec.settings,
                                      compute_dtype=compute_dtype)

    state = steps.init_train_state(params)
    global_step = 0
    restorer = None
    if out_dir:
        restorer = checkpoint.TrainingRestorer(
            out_dir, save_steps=max(
                1, int(run_cfg.save_steps_ratio * num_train_steps)),
            async_write=True)
        resumed = restorer.restore()
        if resumed is not None:
            global_step, state_tree = resumed
            state = steps.TrainState(
                state_tree["params"],
                optim.AdamWState(np.int32(state_tree["opt"]["step"]),
                                 state_tree["opt"]["mu"],
                                 state_tree["opt"]["nu"]))
            LOGGER.info(f"resumed from restore bundle at step {global_step}")
    state = replicate_tree(mesh, state)
    # async: only the D2H fetch blocks the loop; serialization + disk
    # writes run on the checkpoint writer thread (drained before return)
    saver = (checkpoint.ModelSaver(out_dir, async_write=True)
             if (main and out_dir) else None)

    running = RunningMeter("train_loss")
    history = []
    root_key = jax.random.key(run_cfg.seed)
    LOGGER.info(f"[{spec.name}] training for {num_train_steps} steps "
                f"({steps_per_epoch}/epoch), validating every {valid_steps}")
    t_start = time.time()

    from clipbert_tpu.utils.profiling import StepTimer, TraceWindow
    timer = StepTimer()
    trace = TraceWindow(run_cfg.profile_dir if main else None)

    last_loss = float("nan")

    task_meters: Dict[str, RunningMeter] = {}

    def consume(pending):
        """Fetch a finished step's metrics (delayed one step so the host
        never blocks the device pipeline on a per-step round-trip)."""
        nonlocal last_loss
        gs, metrics, task = pending
        last_loss = float(metrics["loss"])   # device sync point
        timer.stop()
        running(last_loss)
        tb.step()
        scalars = {"train_loss": last_loss,
                   "grad_norm": float(metrics["grad_norm"]),
                   "lr": float(metrics["lr"]),
                   "cnn_lr": float(metrics["cnn_lr"])}
        if task is not None:
            # per-task loss meters, as the reference's task2loss RunningMeters
            # (run_pretrain.py:384-395)
            meter = task_meters.setdefault(
                task, RunningMeter(f"loss_{task}"))
            meter(last_loss)
            scalars[f"loss_{task}"] = last_loss
        tb.log_scalar_dict(scalars, "train")

    accum = run_cfg.gradient_accumulation_steps

    def next_task_batch(it):
        """Loader items are host batches, or (task_name, batch) pairs from a
        MetaLoader (multi-dataset pretrain keeps task identity for logging)."""
        item = next(it)
        if isinstance(item, tuple) and len(item) == 2 \
                and isinstance(item[0], str):
            return item
        return None, item

    pending = None
    train_iter = iter(spec.train_loader)
    while global_step < num_train_steps:
        if stop_signal():
            LOGGER.info(f"stop requested at step {global_step}: "
                        "saving restore bundle and exiting")
            if restorer is not None and main:
                restorer.save(global_step, _restore_bundle(state))
            break
        trace.maybe_start(global_step)
        if accum == 1:
            task, host_batch = next_task_batch(train_iter)
            batch = _to_device_batch(host_batch, mesh, spec, compute_dtype)
        else:
            # one update consumes `accum` loader batches (the reference's
            # delay-unscale window, run_pretrain.py:398-404); micro-batches
            # are stacked on a leading axis and scanned inside the jitted step
            # (the MetaLoader repeats one task across the whole accum window,
            # dataloader.py:44-46, so the first micro's task names the step)
            pairs = [next_task_batch(train_iter) for _ in range(accum)]
            task = pairs[0][0]
            micros = [_to_device_batch(b, mesh, spec, compute_dtype)
                      for _, b in pairs]
            batch = jax.tree.map(lambda *xs: jnp.stack(xs), *micros)
        step_key = jax.random.fold_in(root_key, global_step)
        timer.start()
        state, metrics = step_fn(state, batch, step_key)
        global_step += 1

        if pending is not None:
            consume(pending)
        pending = (global_step, metrics, task)
        trace.maybe_stop(global_step)

        sync_point = (global_step % valid_steps == 0
                      or global_step == num_train_steps
                      or (restorer is not None and main
                          and global_step % restorer.save_steps == 0))
        if not sync_point:
            continue
        consume(pending)
        pending = None

        if restorer is not None and main \
                and global_step % restorer.save_steps == 0:
            restorer.save(global_step, _restore_bundle(state))

        if global_step % valid_steps == 0 or global_step == num_train_steps:
            elapsed = time.time() - t_start
            perf = timer.summary()
            LOGGER.info(f"step {global_step}/{num_train_steps} "
                        f"loss {last_loss:.4f} ({elapsed:.1f}s, "
                        f"{perf.get('steps_per_sec', 0):.2f} steps/s)")
            tb.log_scalar_dict(perf, "perf")
            entry = {"step": global_step, "loss": last_loss, **perf}
            if spec.validate_fn is not None:
                # multi-host: validation shards per host and runs on local
                # devices with a local param copy (identity on one host)
                val_params = localize_tree(mesh, state.params)
                val_metrics = spec.validate_fn(val_params, eval_fn)
                tb.log_scalar_dict(
                    {k: v for k, v in val_metrics.items()
                     if isinstance(v, (int, float))}, "valid")
                entry["val"] = val_metrics
                LOGGER.info(f"validation: {val_metrics}")
            history.append(entry)
            if saver is not None:
                saver.save(global_step, state.params)

    if pending is not None:
        consume(pending)
    trace.close()
    # make every enqueued checkpoint durable before returning — the
    # SIGTERM/preemption path relies on the bundle being on disk when the
    # process exits (tests/test_graceful_stop.py)
    checkpoint.drain_writes()
    return {"params": state.params, "global_step": global_step,
            "history": history, "state": state,
            "task_loss": {t: m.val for t, m in task_meters.items()}}


def _restore_bundle(state) -> Dict:
    """The restore-bundle tree schema (one definition; TrainingRestorer
    round-trips it, tests/test_graceful_stop.py + auto-resume e2e)."""
    return {"params": state.params,
            "opt": {"step": np.asarray(state.opt.step),
                    "mu": state.opt.mu, "nu": state.opt.nu}}


def _to_device_batch(batch: Dict, mesh, spec: TaskSpec, compute_dtype):
    """Host batch -> device: shard on data axis, normalize pixels on device.
    Multi-host: each host's batch is its slice of the global batch."""
    from clipbert_tpu.core.mesh import put_batch_sharded
    n_data = (mesh.local_mesh.shape["data"] if jax.process_count() > 1
              else mesh.shape["data"])
    dev = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.dtype != object:
            assert v.shape[0] % n_data == 0, (
                f"train batch leading dim {v.shape[0]} for '{k}' must be "
                f"divisible by the {n_data}-way (local) data mesh axis")
            dev[k] = put_batch_sharded(mesh, v)
        elif hasattr(v, "dtype"):       # already on device (PrefetchLoader)
            dev[k] = v
    if "visual_src_hw" in dev:
        # native-size frames: jitted device resize + pad + normalize gives
        # the train step its static (B, T, S, S, 3) shape regardless of the
        # per-batch buffer bucket
        dev["visual_inputs"] = transforms.device_preprocess(
            dev["visual_inputs"], dev.pop("visual_src_hw"),
            spec.max_img_size, spec.mean, spec.std, compute_dtype)
    elif "visual_inputs" in dev and dev["visual_inputs"].dtype == jnp.uint8:
        dev["visual_inputs"] = transforms.normalize_pixels(
            dev["visual_inputs"], spec.mean, spec.std, compute_dtype)
    return dev

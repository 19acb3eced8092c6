"""Shared task-runner plumbing: tokenizer/store setup, loader assembly,
pooled-logit validation, and the inference-time config restore."""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import numpy as np

import jax

from clipbert_tpu.ckpt import checkpoint
from clipbert_tpu.core.config import ModelConfig, RunConfig
from clipbert_tpu.core.mesh import data_shard
from clipbert_tpu.data import loader, transforms
from clipbert_tpu.data.store import open_store
from clipbert_tpu.data.tokenization import BertTokenizer
from clipbert_tpu.utils import distributed as dist
from clipbert_tpu.utils.logger import LOGGER


def setup_tokenizer(cfg: RunConfig) -> BertTokenizer:
    return BertTokenizer.from_dir(cfg.tokenizer_dir)


def pixel_mean_std(cfg: RunConfig):
    """The configured normalization constants (img_pixel_mean/std,
    reference config.py:93-96) with the detectron2 caffe-style defaults."""
    mean = (tuple(cfg.img_pixel_mean) if cfg.img_pixel_mean
            else transforms.IMAGENET_MEAN_255)
    std = (tuple(cfg.img_pixel_std) if cfg.img_pixel_std
           else transforms.IMAGENET_STD_1)
    return mean, std


def compute_dtype_for(cfg: RunConfig):
    """Compute dtype from the run's mixed-precision policy (core.dtypes)."""
    from clipbert_tpu.core.dtypes import policy_for
    return policy_for(cfg.bf16).compute_dtype


def setup_store(path: str):
    return open_store(path)


def load_model_config(cfg: RunConfig, **overrides) -> ModelConfig:
    return ModelConfig.from_json(cfg.model_config, **overrides)


def make_batch_preprocess(cfg: RunConfig):
    """Batch hook for PrefetchLoader: dispatch the jitted device
    resize/pad/normalize (or plain normalize) as soon as the transfer is
    issued, one batch ahead of the consuming step."""
    import jax.numpy as jnp
    mean, std = pixel_mean_std(cfg)
    compute_dtype = compute_dtype_for(cfg)

    def fn(batch: Dict) -> Dict:
        if "visual_src_hw" in batch:
            batch = dict(batch)
            batch["visual_inputs"] = transforms.device_preprocess(
                batch["visual_inputs"], batch.pop("visual_src_hw"),
                cfg.max_img_size, mean, std, compute_dtype)
        elif ("visual_inputs" in batch
              and batch["visual_inputs"].dtype == jnp.uint8):
            batch = dict(batch)
            batch["visual_inputs"] = transforms.normalize_pixels(
                batch["visual_inputs"], mean, std, compute_dtype)
        return batch

    return fn


def build_train_loader(dataset, collate_fn, cfg: RunConfig,
                       mesh=None):
    sampler = loader.ShardedBatchSampler(
        len(dataset), cfg.train_batch_size, shuffle=True, seed=cfg.seed,
        process_index=dist.process_index(),
        process_count=dist.process_count(), drop_last=True)
    dl = loader.DataLoader(dataset, sampler, collate_fn,
                           num_workers=cfg.n_workers)
    # device transfer AND preprocess one batch ahead, overlapping the
    # previous step
    pf = loader.PrefetchLoader(dl, mesh=mesh,
                               preprocess_fn=make_batch_preprocess(cfg))
    return loader.InfiniteIterator(pf), len(sampler)


def build_eval_loader(dataset, collate_fn, cfg: RunConfig, batch_size=None):
    sampler = loader.ShardedBatchSampler(
        len(dataset), batch_size or cfg.val_batch_size, shuffle=False,
        process_index=dist.process_index(),
        process_count=dist.process_count(), drop_last=False)
    return loader.DataLoader(dataset, sampler, collate_fn,
                             num_workers=cfg.n_workers)


def device_batch(batch: Dict, mesh, mean=None, std=None, compute_dtype=None,
                 cfg: Optional[RunConfig] = None):
    import jax.numpy as jnp
    from clipbert_tpu.core.mesh import process_local_mesh
    if cfg is not None:
        cfg_mean, cfg_std = pixel_mean_std(cfg)
        mean = mean or cfg_mean
        std = std or cfg_std
    mean = mean or transforms.IMAGENET_MEAN_255
    std = std or transforms.IMAGENET_STD_1
    compute_dtype = compute_dtype or jnp.bfloat16
    # eval batches live on THIS host's devices: validation work is already
    # sharded across hosts by the sampler/video striding, so each host
    # scores its shard locally and results merge via all_gather_objects
    mesh = process_local_mesh(mesh)
    n_data = mesh.shape["data"]
    dev = {}
    host = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.dtype != object:
            # shard the leading axis when divisible; replicate tail batches
            if v.shape[0] % n_data == 0:
                dev[k] = jax.device_put(v, data_shard(mesh))
            else:
                dev[k] = jax.device_put(v)
        else:
            host[k] = v
    if "visual_src_hw" in dev:
        # native-size frames: jitted device resize + pad + normalize
        assert cfg is not None, "device preprocess path needs cfg.max_img_size"
        dev["visual_inputs"] = transforms.device_preprocess(
            dev["visual_inputs"], dev.pop("visual_src_hw"),
            cfg.max_img_size, mean, std, compute_dtype)
    elif "visual_inputs" in dev:
        dev["visual_inputs"] = transforms.normalize_pixels(
            dev["visual_inputs"], mean, std, compute_dtype)
    return dev, host


# How many deferred eval fetches may stay in flight. Deferring D2H
# conversions keeps the host decoding/dispatching instead of blocking per
# batch, but an unbounded `pending` list retains every batch's device
# logits until the loop ends — for VQA's ~3k-label head on a large val set
# that is GBs of extra HBM. A window of a few batches keeps the overlap
# (the oldest entry's async copy has long completed by the time it drains)
# while bounding retained device buffers to O(window).
EVAL_FETCH_WINDOW = 4


def drain_pending(pending: List, convert: Callable[[Any], None],
                  limit: int = EVAL_FETCH_WINDOW) -> None:
    """Convert (fetch) the oldest deferred entries until at most ``limit``
    remain in flight; call with ``limit=0`` after the loop to flush."""
    while len(pending) > limit:
        convert(pending.pop(0))


def restore_inference_config(cfg: RunConfig) -> RunConfig:
    """At inference, replay the stored training args except inference_* keys
    (run_video_retrieval.py:737-766)."""
    stored = checkpoint.load_training_args(cfg.output_dir)
    if stored is None:
        LOGGER.warning("no stored training args found; using live config")
        return cfg
    return cfg.restore_from_training_args(stored)


def load_inference_params(cfg: RunConfig, model_cfg: ModelConfig,
                          head_type: str):
    """Load the step-addressed deployment checkpoint
    (run_video_qa.py:629-631)."""
    from clipbert_tpu.train import trainer
    saver = checkpoint.ModelSaver(cfg.output_dir)
    step = cfg.inference_model_step
    if step < 0:
        steps_avail = saver.available_steps()
        assert steps_avail, f"no checkpoints in {cfg.output_dir}"
        step = steps_avail[-1]
    path = saver.path(step)
    LOGGER.info(f"loading inference params from {path}")
    params = trainer.setup_model(
        cfg.replace(e2e_weights_path=path, backbone_weights_path=None,
                    bert_weights_path=None),
        model_cfg, head_type)
    # inference-only param prep: frozen-BN scales fold into conv kernels
    # (exact; saves a full-activation multiply per conv on the hot path)
    from clipbert_tpu.models import clipbert
    params = clipbert.fold_cnn_bn_scales(params)
    return params, step

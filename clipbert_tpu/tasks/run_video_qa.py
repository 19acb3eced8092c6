"""Video QA task runner: TGIF-QA (action/transition/frameqa) + MSRVTT-QA.

Capability match for `/root/reference/src/tasks/run_video_qa.py`: MIL clip
loop training (:455-560), MC tasks concat question+option into 5 texts per
question (:206-213, collator :201-205), open-ended tasks classify over
ans2label (:166-176), validation pools per-clip logits and scores TGIF
metrics with cross-rank gathering (:216-362).

Annotation jsonl rows: {"vid_id", "question", "question_id", "answer",
"options"? (MC), "answer_type"? (open-ended)}.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


from clipbert_tpu.core.config import (RunConfig, inject_task_attrs,
                                      load_run_config)
from clipbert_tpu.core.mesh import make_mesh
from clipbert_tpu.data import datasets, transforms
from clipbert_tpu.data.datasets import OPEN_ENDED_QA, VideoQADataset
from clipbert_tpu.tasks import common
from clipbert_tpu.train import steps, trainer
from clipbert_tpu.utils import distributed as dist
from clipbert_tpu.utils.basic import load_json, load_jsonl, save_json
from clipbert_tpu.utils.logger import LOGGER

MC_TASKS = ("action", "transition")
N_OPTIONS = 5


def derive_task_attrs(cfg: RunConfig, ans2label) -> RunConfig:
    """task -> num_labels / loss_type (reference config.py:359-369)."""
    if cfg.task in MC_TASKS:
        cfg.num_labels = N_OPTIONS
        cfg.loss_type = "ce"
    else:
        assert ans2label is not None
        cfg.num_labels = len(ans2label)
        cfg.loss_type = "ce"
    return cfg


def make_task_settings(cfg: RunConfig, n_clips: int) -> steps.TaskSettings:
    if cfg.task in MC_TASKS:
        head, G = "multi_choice", N_OPTIONS
    else:
        head, G = "seq_cls", 1
    return steps.TaskSettings(
        head_type=head, num_labels=cfg.num_labels, loss_type=cfg.loss_type,
        score_agg_func=cfg.score_agg_func, train_n_clips=n_clips,
        group_size=G, remat=cfg.remat)


def build_groups(cfg: RunConfig, ann_paths, is_train: bool):
    if isinstance(ann_paths, str):
        ann_paths = [ann_paths]
    raw = []
    for p in ann_paths:
        raw.extend(load_jsonl(p))
    grouped = datasets.group_datalist_by_visual(raw, "vid_id")
    # one question per group keeps B_t = B_v * G static for MC and open-ended
    groups = transforms.mk_input_group(grouped, max_n_example_per_group=1,
                                       is_train=is_train)
    if is_train:
        groups = datasets.apply_data_ratio(groups, cfg.data_ratio, cfg.seed)
    return groups


def build_dataset(cfg: RunConfig, groups, tokenizer, store, ans2label,
                  is_train: bool, n_clips: int) -> VideoQADataset:
    return VideoQADataset(
        cfg.task, groups, tokenizer, store, ans2label=ans2label,
        fps=cfg.fps, num_frm=cfg.num_frm,
        frm_sampling_strategy=cfg.frm_sampling_strategy,
        max_img_size=cfg.max_img_size, max_txt_len=cfg.max_txt_len,
        ensemble_n_clips=n_clips, is_train=is_train,
        random_sample_clips=cfg.random_sample_clips, n_options=N_OPTIONS,
        seed=cfg.seed, device_preprocess=cfg.device_preprocess)


def build_validate(cfg: RunConfig, val_ds: VideoQADataset, val_loader, mesh,
                   compute_dtype):
    def validate(params, eval_fn) -> Dict:
        # fetches are deferred: an async D2H copy starts per batch and the
        # conversion runs in a sliding window, so the host keeps decoding
        # and dispatching instead of blocking on each batch's logits while
        # bounding retained device buffers (common.drain_pending;
        # run_video_retrieval.inference_retrieval has the measured A/B)
        results = []

        def convert(entry):
            qids, logits = entry
            preds = np.asarray(logits).argmax(-1)
            for qid, p in zip(qids, preds):
                results.append({"question_id": qid, "answer": int(p)})

        pending = []
        for batch in val_loader:
            dev, host = common.device_batch(batch, mesh, cfg=cfg,
                                            compute_dtype=compute_dtype)
            out = eval_fn(params, dev)
            out["logits"].copy_to_host_async()
            pending.append((host["question_ids"], out["logits"]))
            common.drain_pending(pending, convert)
        common.drain_pending(pending, convert, limit=0)
        gathered = [r for rank in dist.all_gather_objects(results)
                    for r in rank]
        metrics = val_ds.evaluate_tgif_qa(gathered)
        metrics["results"] = gathered
        return metrics

    return validate


def start_training(cfg: RunConfig):
    tokenizer = common.setup_tokenizer(cfg)
    ans2label = (load_json(cfg.ans2label_path)
                 if cfg.task in OPEN_ENDED_QA else None)
    cfg = derive_task_attrs(cfg, ans2label)
    model_cfg = inject_task_attrs(common.load_model_config(cfg), cfg)
    mesh = make_mesh()
    compute_dtype = common.compute_dtype_for(cfg)

    tspec = cfg.train_datasets[0]
    train_ds = build_dataset(cfg, build_groups(cfg, tspec.txt_paths(cfg.task), True),
                             tokenizer, common.setup_store(tspec.img),
                             ans2label, True, cfg.train_n_clips)
    train_loader, steps_per_epoch = common.build_train_loader(
        train_ds, datasets.VideoQACollator(tokenizer, cfg.max_txt_len),
        cfg, mesh)

    spec = trainer.TaskSpec(
        name=f"video_qa/{cfg.task}",
        head_type="multi_choice" if cfg.task in MC_TASKS else "seq_cls",
        settings=make_task_settings(cfg, cfg.train_n_clips),
        train_loader=train_loader, steps_per_epoch=steps_per_epoch,
        mean=common.pixel_mean_std(cfg)[0], std=common.pixel_mean_std(cfg)[1],
        max_img_size=cfg.max_img_size)

    if cfg.val_datasets:
        vspec = cfg.val_datasets[0]
        val_ds = build_dataset(cfg, build_groups(cfg, vspec.txt_paths(cfg.task), False),
                               tokenizer, common.setup_store(vspec.img),
                               ans2label, False, cfg.inference_n_clips)
        val_loader = common.build_eval_loader(
            val_ds, datasets.VideoQACollator(tokenizer, cfg.max_txt_len), cfg)
        val_eval = steps.make_eval_step(
            model_cfg, make_task_settings(cfg, cfg.inference_n_clips),
            compute_dtype=compute_dtype)
        validate = build_validate(cfg, val_ds, val_loader, mesh,
                                  compute_dtype)
        spec.validate_fn = lambda params, _e: validate(params, val_eval)

    return trainer.train(cfg, model_cfg, spec, mesh=mesh)


def start_inference(cfg: RunConfig):
    cfg = common.restore_inference_config(cfg)
    tokenizer = common.setup_tokenizer(cfg)
    ans2label = (load_json(cfg.ans2label_path)
                 if cfg.task in OPEN_ENDED_QA else None)
    cfg = derive_task_attrs(cfg, ans2label)
    model_cfg = inject_task_attrs(common.load_model_config(cfg), cfg)
    mesh = make_mesh()
    compute_dtype = common.compute_dtype_for(cfg)
    head = "multi_choice" if cfg.task in MC_TASKS else "seq_cls"
    params, step = common.load_inference_params(cfg, model_cfg, head)

    txt = (cfg.inference_txt_db
           or cfg.val_datasets[0].txt_paths(cfg.task)[0])
    img = cfg.inference_img_db or cfg.val_datasets[0].img
    ds = build_dataset(cfg, build_groups(cfg, txt, False), tokenizer,
                       common.setup_store(img), ans2label, False,
                       cfg.inference_n_clips)
    dl = common.build_eval_loader(
        ds, datasets.VideoQACollator(tokenizer, cfg.max_txt_len), cfg,
        batch_size=cfg.inference_batch_size)
    eval_fn = steps.make_eval_step(
        model_cfg, make_task_settings(cfg, cfg.inference_n_clips),
        compute_dtype=compute_dtype)
    metrics = build_validate(cfg, ds, dl, mesh, compute_dtype)(params, eval_fn)
    if dist.is_main_process() and cfg.output_dir:
        save_json({k: v for k, v in metrics.items() if k != "results"},
                  os.path.join(cfg.output_dir,
                               f"videoqa_{cfg.task}_metrics_step{step}.json"))
        save_json(metrics.get("results", []),
                  os.path.join(cfg.output_dir,
                               f"videoqa_{cfg.task}_results_step{step}.json"))
        LOGGER.info({k: v for k, v in metrics.items() if k != "results"})
    return metrics


def main(argv=None):
    cfg = load_run_config(argv)
    # pod-slice bootstrap before first device touch (reference: hvd.init())
    from clipbert_tpu.core.mesh import maybe_init_distributed
    maybe_init_distributed(cfg)
    if cfg.do_inference:
        return start_inference(cfg)
    return start_training(cfg)


if __name__ == "__main__":
    main()

"""VQA 2.0 image-QA task runner.

Capability match for `/root/reference/src/tasks/run_vqa.py`: soft-target
bce classification over 3129 answers, loss scaled by num_labels (:355-356),
VQA-score validation with answer-type breakdown (:172-243), inference replay
of stored args (:466-477).

Annotation format (jsonl): {"question_id", "txt", "img_id" (or "vid_id"),
"labels": {ans: score}, "answer_type"}; ans2label json maps answer->index.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np


from clipbert_tpu.core.config import (RunConfig, inject_task_attrs,
                                      load_run_config)
from clipbert_tpu.core.mesh import make_mesh
from clipbert_tpu.data import datasets, transforms
from clipbert_tpu.data.datasets import VQADataset
from clipbert_tpu.tasks import common
from clipbert_tpu.train import steps, trainer
from clipbert_tpu.utils import distributed as dist
from clipbert_tpu.utils.basic import load_json, load_jsonl, save_json
from clipbert_tpu.utils.logger import LOGGER


def build_datalist(ann_paths: List[str], data_ratio: float, is_train: bool,
                   max_n_example_per_group: int, seed: int = 42):
    raw = []
    for p in ann_paths:
        raw.extend(load_jsonl(p))
    key = "img_id" if raw and "img_id" in raw[0] else "vid_id"
    grouped = datasets.group_datalist_by_visual(raw, key)
    groups = transforms.mk_input_group(
        grouped,
        max_n_example_per_group=max_n_example_per_group if is_train else 1,
        is_train=is_train)
    return datasets.apply_data_ratio(groups, data_ratio, seed)


def make_task_settings(cfg: RunConfig, is_train: bool = True
                       ) -> steps.TaskSettings:
    return steps.TaskSettings(
        head_type="seq_cls", num_labels=cfg.num_labels, loss_type="bce",
        train_n_clips=1,
        group_size=cfg.max_n_example_per_group if is_train else 1,
        scale_loss_by_num_labels=True, remat=cfg.remat)


def build_validate(cfg: RunConfig, val_ds: VQADataset, val_loader, mesh,
                   compute_dtype):
    def validate(params, eval_fn) -> Dict:
        # deferred fetches (async D2H per batch, converted in a sliding
        # window) keep the host decoding/dispatching instead of blocking
        # per batch, without retaining every batch's (B, num_labels) device
        # logits until the loop ends — see common.drain_pending
        results = []

        def convert(entry):
            qids, logits_dev = entry
            preds = np.asarray(logits_dev).argmax(-1)
            for qid, p in zip(qids, preds):
                results.append({"question_id": qid,
                                "answer": val_ds.label2ans[int(p)]})

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
        metrics = val_ds.evaluate_vqa(gathered)
        metrics["results"] = gathered
        return metrics

    return validate


def start_training(cfg: RunConfig):
    tokenizer = common.setup_tokenizer(cfg)
    ans2label = load_json(cfg.ans2label_path)
    cfg.num_labels = len(ans2label)
    model_cfg = inject_task_attrs(common.load_model_config(cfg), cfg)
    mesh = make_mesh()
    compute_dtype = common.compute_dtype_for(cfg)

    tspec = cfg.train_datasets[0]
    train_groups = build_datalist(tspec.txt_paths(), cfg.data_ratio, True,
                                  cfg.max_n_example_per_group, cfg.seed)
    train_ds = VQADataset(train_groups, tokenizer,
                          common.setup_store(tspec.img),
                          ans2label=ans2label, is_train=True,
                          max_img_size=cfg.max_img_size,
                          max_txt_len=cfg.max_txt_len, seed=cfg.seed,
                          device_preprocess=cfg.device_preprocess)
    train_loader, steps_per_epoch = common.build_train_loader(
        train_ds, datasets.RetrievalCollator(tokenizer, cfg.max_txt_len),
        cfg, mesh)

    vspec = cfg.val_datasets[0]
    val_groups = build_datalist(vspec.txt_paths(), cfg.data_ratio, False, 1,
                                cfg.seed)
    val_ds = VQADataset(val_groups, tokenizer, common.setup_store(vspec.img),
                        ans2label=ans2label, max_img_size=cfg.max_img_size,
                        max_txt_len=cfg.max_txt_len, seed=cfg.seed,
                        device_preprocess=cfg.device_preprocess)
    val_loader = common.build_eval_loader(
        val_ds, datasets.RetrievalCollator(tokenizer, cfg.max_txt_len), cfg)

    spec = trainer.TaskSpec(
        name="vqa", head_type="seq_cls",
        settings=make_task_settings(cfg),
        train_loader=train_loader, steps_per_epoch=steps_per_epoch,
        validate_fn=None,
        mean=common.pixel_mean_std(cfg)[0], std=common.pixel_mean_std(cfg)[1],
        max_img_size=cfg.max_img_size)
    # validation runs with group_size=1 settings -> its own eval step
    val_settings = make_task_settings(cfg, is_train=False)
    val_eval_fn = steps.make_eval_step(model_cfg, val_settings,
                                       compute_dtype=compute_dtype)
    validate = build_validate(cfg, val_ds, val_loader, mesh, compute_dtype)
    spec.validate_fn = lambda params, _unused: validate(params, val_eval_fn)

    return trainer.train(cfg, model_cfg, spec, mesh=mesh)


def start_inference(cfg: RunConfig):
    cfg = common.restore_inference_config(cfg)
    tokenizer = common.setup_tokenizer(cfg)
    ans2label = load_json(cfg.ans2label_path)
    cfg.num_labels = len(ans2label)
    model_cfg = inject_task_attrs(common.load_model_config(cfg), cfg)
    mesh = make_mesh()
    compute_dtype = common.compute_dtype_for(cfg)

    params, step = common.load_inference_params(cfg, model_cfg, "seq_cls")
    txt = cfg.inference_txt_db or cfg.val_datasets[0].txt_paths()[0]
    img = cfg.inference_img_db or cfg.val_datasets[0].img
    groups = build_datalist([txt] if isinstance(txt, str) else txt,
                            1.0, False, 1, cfg.seed)
    ds = VQADataset(groups, tokenizer, common.setup_store(img),
                    ans2label=ans2label, max_img_size=cfg.max_img_size,
                    max_txt_len=cfg.max_txt_len,
                    device_preprocess=cfg.device_preprocess)
    dl = common.build_eval_loader(
        ds, datasets.RetrievalCollator(tokenizer, cfg.max_txt_len), cfg,
        batch_size=cfg.inference_batch_size)
    eval_fn = steps.make_eval_step(
        model_cfg, make_task_settings(cfg, is_train=False),
        compute_dtype=compute_dtype)
    metrics = build_validate(cfg, ds, dl, mesh, compute_dtype)(params, eval_fn)
    if dist.is_main_process() and cfg.output_dir:
        save_json(metrics.get("results", []),
                  os.path.join(cfg.output_dir,
                               f"vqa_results_step{step}.json"))
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

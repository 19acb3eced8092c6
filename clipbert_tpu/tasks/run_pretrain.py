"""Image-text pretraining (MLM + ITM) on COCO + Visual Genome captions.

Capability match for `/root/reference/src/pretrain/run_pretrain.py`:
MetaLoader over multiple caption datasets with ratio weighting (:133-152),
MLM + ITM loss sum (:384-395), validation reporting MLM token accuracy and
ITM accuracy gathered across hosts (:205-273), pixel random sampling active
during training via the model config (modeling.py:80-88).

Annotation jsonl rows: {"img_id" (or "vid_id"), "txt"}.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


from clipbert_tpu.core.config import (RunConfig, inject_task_attrs,
                                      load_run_config)
from clipbert_tpu.core.mesh import make_mesh
from clipbert_tpu.data import datasets, loader, transforms
from clipbert_tpu.data.datasets import PretrainCollator, PretrainDataset
from clipbert_tpu.tasks import common
from clipbert_tpu.train import steps, trainer
from clipbert_tpu.utils import distributed as dist
from clipbert_tpu.utils.basic import load_jsonl


def make_task_settings(cfg: RunConfig) -> steps.TaskSettings:
    return steps.TaskSettings(
        head_type="pretrain", use_mlm=cfg.use_mlm, use_itm=cfg.use_itm,
        group_size=cfg.max_n_example_per_group, remat=cfg.remat)


def build_groups(ann_paths, cfg: RunConfig, is_train: bool):
    if isinstance(ann_paths, str):
        ann_paths = [ann_paths]
    raw = []
    for p in ann_paths:
        raw.extend(load_jsonl(p))
    key = "img_id" if raw and "img_id" in raw[0] else "vid_id"
    grouped = datasets.group_datalist_by_visual(raw, key)
    groups = transforms.mk_input_group(
        grouped,
        max_n_example_per_group=(cfg.max_n_example_per_group
                                 if is_train else 1),
        is_train=is_train)
    return datasets.apply_data_ratio(groups, cfg.data_ratio, cfg.seed)


def build_one_loader(spec, cfg: RunConfig, tokenizer, is_train: bool):
    vis_format = getattr(spec, "vis_format", "image")
    groups = build_groups(spec.txt_paths(), cfg, is_train)
    ds = PretrainDataset(
        groups, tokenizer, common.setup_store(spec.img), fps=cfg.fps,
        num_frm=cfg.num_frm, frm_sampling_strategy=cfg.frm_sampling_strategy,
        max_img_size=cfg.max_img_size, max_txt_len=cfg.max_txt_len,
        itm_neg_prob=cfg.itm_neg_prob if is_train else 0.5,
        use_itm=cfg.use_itm, vis_format=vis_format, seed=cfg.seed,
        device_preprocess=cfg.device_preprocess)
    coll = PretrainCollator(tokenizer, mlm=cfg.use_mlm,
                            max_length=cfg.max_txt_len, is_train=is_train,
                            seed=cfg.seed)
    if is_train:
        sampler = loader.ShardedBatchSampler(
            len(ds), cfg.train_batch_size, shuffle=True, seed=cfg.seed,
            process_index=dist.process_index(),
            process_count=dist.process_count())
        dl = loader.DataLoader(ds, sampler, coll, num_workers=cfg.n_workers)
        return dl, ds
    return common.build_eval_loader(ds, coll, cfg), ds


def build_validate(cfg: RunConfig, val_loaders, mesh, compute_dtype):
    def validate(params, eval_fn) -> Dict:
        out: Dict = {}
        for name, dl in val_loaders.items():
            n_mlm_correct = n_mlm = n_itm_correct = n_itm = 0
            loss_sum = 0.0
            n_batches = 0
            for batch in dl:
                dev, _host = common.device_batch(batch, mesh, cfg=cfg,
                                                 compute_dtype=compute_dtype)
                res = eval_fn(params, dev)
                if "mlm_scores" in res and "mlm_labels" in dev:
                    labels = np.asarray(dev["mlm_labels"]).reshape(-1)
                    pred = np.asarray(res["mlm_scores"]).reshape(
                        labels.shape[0], -1).argmax(-1)
                    valid = labels != -100
                    n_mlm_correct += int((pred[valid] == labels[valid]).sum())
                    n_mlm += int(valid.sum())
                    loss_sum += float(np.asarray(res["mlm_loss"]).mean())
                if "itm_scores" in res and "itm_labels" in dev:
                    labels = np.asarray(dev["itm_labels"]).reshape(-1)
                    pred = np.asarray(res["itm_scores"]).argmax(-1)
                    n_itm_correct += int((pred == labels).sum())
                    n_itm += len(labels)
                n_batches += 1
                if cfg.debug and n_batches >= 3:
                    break
            totals = dist.all_gather_objects(
                (n_mlm_correct, n_mlm, n_itm_correct, n_itm))
            c_mlm = sum(t[0] for t in totals)
            t_mlm = sum(t[1] for t in totals)
            c_itm = sum(t[2] for t in totals)
            t_itm = sum(t[3] for t in totals)
            if t_mlm:
                out[f"{name}_mlm_acc"] = c_mlm / t_mlm
            if t_itm:
                out[f"{name}_itm_acc"] = c_itm / t_itm
        return out

    return validate


def start_training(cfg: RunConfig):
    tokenizer = common.setup_tokenizer(cfg)
    model_cfg = inject_task_attrs(common.load_model_config(cfg), cfg)
    mesh = make_mesh()
    compute_dtype = common.compute_dtype_for(cfg)

    train_loaders = {}
    ratios = {}
    steps_per_epoch = 0
    for spec in cfg.train_datasets:
        dl, _ds = build_one_loader(spec, cfg, tokenizer, is_train=True)
        # prefetch: transfer AND device preprocess overlap the previous step
        train_loaders[spec.name or str(spec.txt)] = \
            loader.PrefetchLoader(dl, mesh=mesh,
                                  preprocess_fn=common.make_batch_preprocess(cfg))
        ratios[spec.name or str(spec.txt)] = spec.ratio
        steps_per_epoch += len(dl)
    meta_loader = loader.MetaLoader(
        train_loaders, ratios=ratios,
        accum_steps=cfg.gradient_accumulation_steps, seed=cfg.seed)
    # the engine keeps the MetaLoader's (task, batch) pairing so per-task
    # loss meters/TB scalars match the reference (run_pretrain.py:384-395)

    spec = trainer.TaskSpec(
        name="pretrain", head_type="pretrain",
        settings=make_task_settings(cfg),
        train_loader=meta_loader, steps_per_epoch=steps_per_epoch,
        mean=common.pixel_mean_std(cfg)[0], std=common.pixel_mean_std(cfg)[1],
        max_img_size=cfg.max_img_size)

    if cfg.val_datasets:
        val_loaders = {}
        for vs in cfg.val_datasets:
            dl, _ds = build_one_loader(vs, cfg, tokenizer, is_train=False)
            val_loaders[vs.name or str(vs.txt)] = dl
        # eval groups are G=1 (one text per visual) -> dedicated eval step
        val_settings = steps.TaskSettings(
            head_type="pretrain", use_mlm=cfg.use_mlm, use_itm=cfg.use_itm,
            group_size=1)
        val_eval = steps.make_pretrain_eval_step(
            model_cfg, val_settings, compute_dtype=compute_dtype)
        validate = build_validate(cfg, val_loaders, mesh, compute_dtype)
        spec.validate_fn = lambda params, _e: validate(params, val_eval)

    return trainer.train(cfg, model_cfg, spec, mesh=mesh)


def main(argv=None):
    cfg = load_run_config(argv)
    # pod-slice bootstrap before first device touch (reference: hvd.init())
    from clipbert_tpu.core.mesh import maybe_init_distributed
    maybe_init_distributed(cfg)
    return start_training(cfg)


if __name__ == "__main__":
    main()

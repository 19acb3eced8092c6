"""MSRVTT multiple-choice test — inference-only, reusing a retrieval
checkpoint (`/root/reference/src/tasks/run_msrvtt_mc.py`: asserts
do_inference :322, scores each of 5 candidate captions with the retrieval
head and takes the argmax probability :190-197, accuracy via the dataset
:237).

Annotation jsonl rows: {"id", "vid_id", "options": [5 captions],
"answer": int}.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


from clipbert_tpu.core.config import RunConfig, inject_task_attrs, load_run_config
from clipbert_tpu.core.mesh import make_mesh
from clipbert_tpu.data import datasets
from clipbert_tpu.data.datasets import MSRVTTMCEvalDataset
from clipbert_tpu.tasks import common
from clipbert_tpu.train import steps
from clipbert_tpu.utils import distributed as dist
from clipbert_tpu.utils.basic import load_jsonl, save_json
from clipbert_tpu.utils.logger import LOGGER


def inference_mc(cfg: RunConfig, model_cfg, params,
                 ds: MSRVTTMCEvalDataset, mesh, compute_dtype) -> Dict:
    ts = steps.TaskSettings(
        head_type="retrieval", num_labels=cfg.num_labels,
        loss_type=cfg.loss_type, score_agg_func=cfg.score_agg_func,
        train_n_clips=cfg.inference_n_clips, group_size=5)
    eval_fn = steps.make_eval_step(model_cfg, ts,
                                   compute_dtype=compute_dtype)
    coll = datasets.RetrievalCollator(ds.tokenizer, cfg.max_txt_len)
    dl = common.build_eval_loader(ds, coll, cfg,
                                  batch_size=cfg.inference_batch_size)
    preds = {}
    # deferred fetches: async D2H per batch, converted in a sliding window
    # so decode/dispatch of batch i+1 overlaps batch i's compute without
    # retaining every batch's device logits (common.drain_pending)

    def convert(entry):
        host, logits_dev = entry
        logits = np.asarray(logits_dev)     # (B_v*5, num_labels)
        if cfg.loss_type == "ce":
            e = np.exp(logits - logits.max(-1, keepdims=True))
            prob = (e / e.sum(-1, keepdims=True))[:, 1]
        else:
            prob = 1.0 / (1.0 + np.exp(-logits[:, 0]))
        prob = prob.reshape(-1, 5)
        qids = host["question_ids"][::5]
        for qid, p in zip(qids, prob.argmax(-1)):
            preds[qid] = int(p)

    pending = []
    for batch in dl:
        dev, host = common.device_batch(batch, mesh, cfg=cfg,
                                        compute_dtype=compute_dtype)
        out = eval_fn(params, dev)
        out["logits"].copy_to_host_async()
        pending.append((host, out["logits"]))
        common.drain_pending(pending, convert)
    common.drain_pending(pending, convert, limit=0)
    gathered = dist.all_gather_objects(preds)
    merged = {k: v for rank in gathered for k, v in rank.items()}
    metrics = ds.evaluate_qa_accuracy(merged, force_same=True)
    metrics["preds"] = merged
    return metrics


def start_inference(cfg: RunConfig):
    assert cfg.do_inference, "MSRVTT-MC is inference-only"
    cfg = common.restore_inference_config(cfg)
    cfg.do_inference = True
    tokenizer = common.setup_tokenizer(cfg)
    cfg.num_labels = 2 if cfg.loss_type == "ce" else 1
    model_cfg = inject_task_attrs(common.load_model_config(cfg), cfg)
    mesh = make_mesh()
    compute_dtype = common.compute_dtype_for(cfg)
    params, step = common.load_inference_params(cfg, model_cfg, "retrieval")

    txt = cfg.inference_txt_db
    img = cfg.inference_img_db
    raw = load_jsonl(txt)
    ds = MSRVTTMCEvalDataset(
        raw, tokenizer, common.setup_store(img), fps=cfg.fps,
        num_frm=cfg.num_frm, max_img_size=cfg.max_img_size,
        max_txt_len=cfg.max_txt_len, ensemble_n_clips=cfg.inference_n_clips,
        device_preprocess=cfg.device_preprocess)
    metrics = inference_mc(cfg, model_cfg, params, ds, mesh, compute_dtype)
    if dist.is_main_process() and cfg.output_dir:
        save_json({k: v for k, v in metrics.items() if k != "preds"},
                  os.path.join(cfg.output_dir,
                               f"mc_metrics_step{step}.json"))
        LOGGER.info({k: v for k, v in metrics.items() if k != "preds"})
    return metrics


def main(argv=None):
    cfg = load_run_config(argv)
    # pod-slice bootstrap before first device touch (reference: hvd.init())
    from clipbert_tpu.core.mesh import maybe_init_distributed
    maybe_init_distributed(cfg)
    return start_inference(cfg)


if __name__ == "__main__":
    main()

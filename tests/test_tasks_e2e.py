"""End-to-end task-runner tests: tiny model, synthetic media + annotations,
debug-length training with validation, and retrieval/MC inference — the
integration layer the reference only exercised manually via --debug runs
(SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest

from clipbert_tpu.core.config import DatasetSpec, RunConfig
from clipbert_tpu.data import store, tokenization, video


TINY_MODEL_CFG = dict(
    vocab_size=None,  # filled from tokenizer
    hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=64, max_position_embeddings=64,
    max_grid_row_position_embeddings=4, max_grid_col_position_embeddings=4,
    hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Shared synthetic corpus: vocab, model config, image+video stores."""
    root = tmp_path_factory.mktemp("ws")
    vocab = root / "tokenizer" / "vocab.txt"
    vocab.parent.mkdir()
    tokenization.write_tiny_vocab(
        str(vocab), extra_tokens=["cat", "dog", "bird", "runs", "jumps",
                                  "sits", "a", "the", "what", "who"])
    tok = tokenization.BertTokenizer(str(vocab))

    mc = dict(TINY_MODEL_CFG)
    mc["vocab_size"] = len(tok)
    model_cfg_path = root / "model_config.json"
    model_cfg_path.write_text(json.dumps(mc))

    import io
    from PIL import Image
    img_store = root / "imgs.cbpk"
    with store.PackWriter(str(img_store)) as w:
        for i in range(12):
            arr = np.full((40, 48, 3), (i * 19) % 255, np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            w.put(f"img{i}", buf.getvalue())

    vid_store = root / "vids.cbpk"
    with store.PackWriter(str(vid_store)) as w:
        for i in range(12):
            frames = np.zeros((16, 32, 32, 3), np.uint8)
            frames[:, :, :, 0] = (i * 19) % 255
            for t in range(16):
                frames[t, :, :, 1] = t * 15
            w.put(f"vid{i}", video.encode_jseq_from_array(frames, fps=8))

    return {"root": root, "tokenizer_dir": str(vocab.parent),
            "model_config": str(model_cfg_path),
            "img_store": str(img_store), "vid_store": str(vid_store),
            "tok": tok}


def base_cfg(workspace, out_name, **kw) -> RunConfig:
    out = str(workspace["root"] / out_name)
    defaults = dict(
        model_config=workspace["model_config"],
        tokenizer_dir=workspace["tokenizer_dir"],
        output_dir=out, debug=True, bf16=False, max_img_size=64,
        max_txt_len=10, train_batch_size=8, val_batch_size=4,
        num_train_epochs=5, n_workers=2, num_valid=1, min_valid_steps=100,
        learning_rate=1e-4, cnn_learning_rate=1e-4, seed=7)
    defaults.update(kw)
    return RunConfig(**defaults)


def write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_vqa_end_to_end(workspace):
    from clipbert_tpu.tasks import run_vqa
    root = workspace["root"]
    ans2label = {"cat": 0, "dog": 1, "bird": 2}
    a2l_path = root / "vqa_ans2label.json"
    a2l_path.write_text(json.dumps(ans2label))
    rows = [{"question_id": i, "txt": "what a cat", "img_id": f"img{i % 12}",
             "labels": {"cat": 1.0}, "answer_type": "other"}
            for i in range(16)]
    ann = root / "vqa.jsonl"
    write_jsonl(ann, rows)

    cfg = base_cfg(workspace, "vqa_out",
                   train_datasets=[DatasetSpec(name="vqa", txt=str(ann),
                                               img=workspace["img_store"])],
                   val_datasets=[DatasetSpec(name="vqa", txt=str(ann),
                                             img=workspace["img_store"])],
                   ans2label_path=str(a2l_path), loss_type="bce",
                   max_n_example_per_group=2)
    result = run_vqa.start_training(cfg)
    assert result["global_step"] == 3  # debug truncation
    assert result["history"], "validation ran"
    val = result["history"][-1]["val"]
    assert "overall_acc" in val and 0.0 <= val["overall_acc"] <= 1.0
    # deployment ckpt + restore bundle written
    out = cfg.output_dir
    assert any(f.startswith("model_step") for f in os.listdir(out))
    assert os.path.exists(os.path.join(out, "restore.npz"))
    assert os.path.exists(os.path.join(out, "log", "args.json"))

    # inference path replays stored args and loads the saved ckpt
    infer_cfg = RunConfig(
        model_config=workspace["model_config"],
        tokenizer_dir=workspace["tokenizer_dir"], output_dir=out,
        do_inference=True, inference_txt_db=str(ann),
        inference_img_db=workspace["img_store"], inference_batch_size=4,
        ans2label_path=str(a2l_path), bf16=False)
    metrics = run_vqa.start_inference(infer_cfg)
    assert "overall_acc" in metrics


def test_video_qa_action_end_to_end(workspace):
    from clipbert_tpu.tasks import run_video_qa
    root = workspace["root"]
    rows = [{"vid_id": f"vid{i % 12}", "question": "what runs",
             "question_id": 100 + i, "answer": i % 5,
             "options": ["a cat", "a dog", "a bird", "the cat", "the dog"]}
            for i in range(8)]
    ann = root / "tgif_action.jsonl"
    write_jsonl(ann, rows)

    cfg = base_cfg(workspace, "vqa_action_out",
                   train_datasets=[DatasetSpec(name="action", txt=str(ann),
                                               img=workspace["vid_store"])],
                   val_datasets=[DatasetSpec(name="action", txt=str(ann),
                                             img=workspace["vid_store"])],
                   task="action", num_frm=1, fps=4, train_n_clips=2,
                   inference_n_clips=2, score_agg_func="mean",
                   train_batch_size=8)
    result = run_video_qa.start_training(cfg)
    assert result["global_step"] == 3
    val = result["history"][-1]["val"]
    assert "overall_acc" in val


def test_video_retrieval_train_and_inference(workspace):
    from clipbert_tpu.tasks import run_video_retrieval
    root = workspace["root"]
    rows = [{"vid_id": f"vid{i}", "txt": f"a cat runs {i}", "id": i}
            for i in range(8)]
    ann = root / "ret.jsonl"
    write_jsonl(ann, rows)

    cfg = base_cfg(workspace, "ret_out",
                   train_datasets=[DatasetSpec(name="ret", txt=str(ann),
                                               img=workspace["vid_store"])],
                   val_datasets=[DatasetSpec(name="ret", txt=str(ann),
                                             img=workspace["vid_store"])],
                   loss_type="ce", score_agg_func="lse", train_n_clips=2,
                   inference_n_clips=2, num_frm=1, fps=4, itm_neg_size=1,
                   train_batch_size=8, inference_batch_size=4)
    result = run_video_retrieval.start_training(cfg)
    assert result["global_step"] == 3
    val = result["history"][-1]["val"]
    assert "t2v_r1" in val and "v2t_r1" in val
    assert val["score_matrix"].shape == (8, 8)

    # standalone inference entry
    infer_cfg = RunConfig(
        model_config=workspace["model_config"],
        tokenizer_dir=workspace["tokenizer_dir"],
        output_dir=cfg.output_dir, do_inference=True,
        inference_txt_db=str(ann), inference_img_db=workspace["vid_store"],
        inference_batch_size=4, inference_n_clips=1, bf16=False)
    m = run_video_retrieval.start_inference(infer_cfg)
    assert "t2v_r1" in m


def test_msrvtt_mc_inference(workspace):
    from clipbert_tpu.tasks import run_msrvtt_mc, run_video_retrieval
    root = workspace["root"]
    # need a trained retrieval output dir; reuse the one from the retrieval
    # test if present, else train quickly
    ret_out = root / "ret_out"
    if not (ret_out / "log" / "args.json").exists():
        pytest.skip("retrieval training output missing")
    rows = [{"id": i, "vid_id": f"vid{i}", "answer": i % 5,
             "options": [f"a cat {j}" for j in range(5)]}
            for i in range(4)]
    ann = root / "mc.jsonl"
    write_jsonl(ann, rows)
    cfg = RunConfig(
        model_config=workspace["model_config"],
        tokenizer_dir=workspace["tokenizer_dir"], output_dir=str(ret_out),
        do_inference=True, inference_txt_db=str(ann),
        inference_img_db=workspace["vid_store"], inference_batch_size=1,
        inference_n_clips=1, bf16=False)
    m = run_msrvtt_mc.start_inference(cfg)
    assert "mc_accuracy" in m
    assert len(m["preds"]) == 4


def test_pretrain_end_to_end(workspace):
    """Two-dataset MetaLoader pretrain: per-task loss observability
    (reference task2loss meters, run_pretrain.py:384-395) + validation."""
    from clipbert_tpu.tasks import run_pretrain
    root = workspace["root"]
    rows = [{"img_id": f"img{i % 12}", "txt": f"a cat sits {i}"}
            for i in range(16)]
    ann = root / "cap.jsonl"
    write_jsonl(ann, rows)
    rows_vg = [{"img_id": f"img{i % 12}", "txt": f"a dog runs {i}"}
               for i in range(16)]
    ann_vg = root / "cap_vg.jsonl"
    write_jsonl(ann_vg, rows_vg)

    cfg = base_cfg(workspace, "pretrain_out",
                   train_datasets=[
                       DatasetSpec(name="coco", txt=str(ann),
                                   img=workspace["img_store"], ratio=1.0),
                       DatasetSpec(name="vg", txt=str(ann_vg),
                                   img=workspace["img_store"], ratio=1.0)],
                   val_datasets=[DatasetSpec(name="coco", txt=str(ann),
                                             img=workspace["img_store"])],
                   use_mlm=True, use_itm=True, itm_neg_prob=0.5,
                   max_n_example_per_group=2, pixel_random_sampling_size=0)
    result = run_pretrain.start_training(cfg)
    assert result["global_step"] == 3
    val = result["history"][-1]["val"]
    assert "coco_mlm_acc" in val and "coco_itm_acc" in val
    # every step is attributed to a named task and metered separately
    assert result["task_loss"], "per-task loss meters missing"
    assert set(result["task_loss"]) <= {"coco", "vg"}
    assert all(np.isfinite(v) for v in result["task_loss"].values())


def test_pretrain_grad_accumulation(workspace):
    """gradient_accumulation_steps>1 consumes N loader batches per update."""
    from clipbert_tpu.tasks import run_pretrain
    root = workspace["root"]
    rows = [{"img_id": f"img{i % 12}", "txt": f"a cat sits {i}"}
            for i in range(32)]
    ann = root / "cap_accum.jsonl"
    write_jsonl(ann, rows)
    cfg = base_cfg(workspace, "pretrain_accum_out",
                   train_datasets=[
                       DatasetSpec(name="coco", txt=str(ann),
                                   img=workspace["img_store"], ratio=1.0)],
                   val_datasets=[],
                   use_mlm=True, use_itm=True,
                   gradient_accumulation_steps=2,
                   max_n_example_per_group=1)
    result = run_pretrain.start_training(cfg)
    assert result["global_step"] == 3
    assert np.isfinite(result["history"][-1]["loss"])


def test_retrieval_rank_loss_e2e(workspace):
    """Retrieval training with the margin-rank head (loss_type=rank,
    num_labels=1 — modeling.py:560-580 semantics)."""
    from clipbert_tpu.tasks import run_video_retrieval
    root = workspace["root"]
    rows = [{"vid_id": f"vid{i}", "txt": f"a dog jumps {i}", "id": i}
            for i in range(8)]
    ann = root / "ret_rank.jsonl"
    write_jsonl(ann, rows)
    cfg = base_cfg(workspace, "ret_rank_out",
                   train_datasets=[DatasetSpec(name="ret", txt=str(ann),
                                               img=workspace["vid_store"])],
                   val_datasets=[DatasetSpec(name="ret", txt=str(ann),
                                             img=workspace["vid_store"])],
                   loss_type="rank", score_agg_func="mean", margin=0.2,
                   train_n_clips=1, inference_n_clips=1, num_frm=1, fps=4,
                   itm_neg_size=1, train_batch_size=8,
                   inference_batch_size=4)
    result = run_video_retrieval.start_training(cfg)
    assert result["global_step"] == 3
    val = result["history"][-1]["val"]
    assert "t2v_r1" in val  # rank head scored via sigmoid prob


def test_auto_resume_from_restore_bundle(workspace):
    """A re-launched run picks up global_step/params/opt from restore.npz
    (reference E2E_TrainingRestorer auto-resume, load_save.py:264-276)."""
    from clipbert_tpu.tasks import run_vqa
    root = workspace["root"]
    ans2label = {"cat": 0, "dog": 1}
    a2l = root / "resume_a2l.json"
    a2l.write_text(json.dumps(ans2label))
    rows = [{"question_id": i, "txt": "a cat", "img_id": f"img{i % 12}",
             "labels": {"cat": 1.0}, "answer_type": "other"}
            for i in range(16)]
    ann = root / "resume.jsonl"
    write_jsonl(ann, rows)
    kw = dict(train_datasets=[DatasetSpec(name="v", txt=str(ann),
                                          img=workspace["img_store"])],
              val_datasets=[DatasetSpec(name="v", txt=str(ann),
                                        img=workspace["img_store"])],
              ans2label_path=str(a2l), loss_type="bce",
              max_n_example_per_group=1, save_steps_ratio=0.34)
    cfg = base_cfg(workspace, "resume_out", **kw)
    r1 = run_vqa.start_training(cfg)
    assert r1["global_step"] == 3
    # second launch, same output dir: must resume (not restart from 0) and
    # therefore run 0 further optimizer steps under the same debug budget
    cfg2 = base_cfg(workspace, "resume_out", **kw)
    r2 = run_vqa.start_training(cfg2)
    assert r2["global_step"] >= 3
    assert int(np.asarray(r2["state"].opt.step)) >= 3


def test_vqa_bf16_compute_path(workspace):
    """bf16 policy (the production default) through train + validate."""
    from clipbert_tpu.tasks import run_vqa
    root = workspace["root"]
    ans2label = {"cat": 0, "dog": 1}
    a2l = root / "bf16_a2l.json"
    a2l.write_text(json.dumps(ans2label))
    rows = [{"question_id": i, "txt": "a cat", "img_id": f"img{i % 12}",
             "labels": {"cat": 1.0}, "answer_type": "other"}
            for i in range(16)]
    ann = root / "bf16.jsonl"
    write_jsonl(ann, rows)
    cfg = base_cfg(workspace, "bf16_out",
                   train_datasets=[DatasetSpec(name="v", txt=str(ann),
                                               img=workspace["img_store"])],
                   val_datasets=[DatasetSpec(name="v", txt=str(ann),
                                             img=workspace["img_store"])],
                   ans2label_path=str(a2l), loss_type="bce",
                   max_n_example_per_group=1, bf16=True)
    result = run_vqa.start_training(cfg)
    assert result["global_step"] == 3
    assert np.isfinite(result["history"][-1]["loss"])


def test_pretrain_to_finetune_handoff(workspace):
    """The reference's headline workflow: a pretraining deployment
    checkpoint fed to a finetune run as --e2e_weights_path (every finetune
    config pins one, e.g. msrvtt_ret_base_resnet50.json:3-5 in the
    reference), merged by the mismatch-tolerant loader
    (load_save.py:71-100, e2e_model.py:41-46): the shared trunk
    (CNN + BERT embeddings/encoder/pooler) transfers verbatim, the
    pretrain MLM/ITM head is dropped, the task head keeps its fresh
    init — and the finetune runner trains from it."""
    import jax

    from clipbert_tpu.ckpt import checkpoint
    from clipbert_tpu.core.config import inject_task_attrs
    from clipbert_tpu.models import clipbert
    from clipbert_tpu.tasks import common, run_video_retrieval
    from clipbert_tpu.train import trainer

    root = workspace["root"]
    rows = [{"vid_id": f"vid{i}", "txt": f"a dog jumps {i}", "id": i}
            for i in range(8)]
    ann = root / "handoff_ret.jsonl"
    write_jsonl(ann, rows)

    # a "pretraining run" that produced a step-addressed deployment ckpt
    # (pretrain head: transformer/cls MLM+ITM weights)
    pre_dir = str(root / "handoff_pretrain_out")
    base = common.load_model_config(base_cfg(workspace, "handoff_pretrain_out"))
    pre_params = clipbert.init_clipbert(jax.random.key(123), base, "pretrain")
    ckpt_path = checkpoint.ModelSaver(pre_dir).save(7, pre_params)

    cfg = base_cfg(workspace, "handoff_ret_out",
                   train_datasets=[DatasetSpec(name="ret", txt=str(ann),
                                               img=workspace["vid_store"])],
                   val_datasets=[DatasetSpec(name="ret", txt=str(ann),
                                             img=workspace["vid_store"])],
                   loss_type="ce", score_agg_func="lse", train_n_clips=2,
                   inference_n_clips=2, num_frm=1, fps=4, itm_neg_size=1,
                   e2e_weights_path=ckpt_path)
    model_cfg = inject_task_attrs(common.load_model_config(cfg), cfg)

    params = trainer.setup_model(cfg, model_cfg, "retrieval")
    pre_flat = checkpoint.flatten_tree(pre_params)
    got_flat = checkpoint.flatten_tree(params)
    fresh_flat = checkpoint.flatten_tree(clipbert.init_clipbert(
        jax.random.key(cfg.seed), model_cfg, "retrieval"))

    trunk = [k for k in got_flat
             if k.startswith("cnn/") or k.startswith("transformer/bert/")]
    assert trunk
    for k in trunk:
        np.testing.assert_array_equal(got_flat[k], pre_flat[k], err_msg=k)
    head = [k for k in got_flat if k.startswith("transformer/classifier")]
    assert head
    for k in head:
        assert k not in pre_flat  # pretrain ckpt has cls, not classifier
        np.testing.assert_array_equal(got_flat[k], fresh_flat[k], err_msg=k)

    # and the full finetune runner consumes the checkpoint end-to-end
    result = run_video_retrieval.start_training(cfg)
    assert result["global_step"] == 3
    assert "t2v_r1" in result["history"][-1]["val"]


def test_verify_ckpt_harness_smoke(workspace):
    """The one-command released-checkpoint harness
    (`python -m clipbert_tpu.verify_ckpt`) runs offline end-to-end on a
    synthetic checkpoint + video store: import -> full-matrix retrieval
    eval -> report. This is the same run_verification code path the gated
    released-ckpt test uses, so the harness is proven executable before
    the real artifacts exist."""
    import json

    import jax

    from clipbert_tpu import verify_ckpt
    from clipbert_tpu.ckpt import checkpoint
    from clipbert_tpu.core.config import ModelConfig
    from clipbert_tpu.models import clipbert

    root = workspace["root"]
    rows = [{"vid_id": f"vid{i}", "txt": f"a dog jumps {i}", "id": i}
            for i in range(4)]
    ann = root / "verify_ret.jsonl"
    write_jsonl(ann, rows)

    model_cfg = ModelConfig.from_json(workspace["model_config"],
                                      num_labels=2, loss_type="ce")
    params = clipbert.init_clipbert(jax.random.key(3), model_cfg,
                                    "retrieval")
    ckpt_path = root / "verify_model.npz"
    checkpoint.save_tree(str(ckpt_path), params)

    run_cfg = {"model_config": workspace["model_config"], "fps": 4,
               "num_frm": 1, "inference_n_clips": 2,
               "score_agg_func": "lse", "max_img_size": 64,
               "max_txt_len": 10, "loss_type": "ce",
               "inference_batch_size": 4, "bf16": False}
    cfg_path = root / "verify_cfg.json"
    cfg_path.write_text(json.dumps(run_cfg))

    m = verify_ckpt.run_verification(
        str(ckpt_path), str(ann), workspace["vid_store"],
        workspace["tokenizer_dir"], config=str(cfg_path))
    for k in ("t2v_r1", "t2v_r5", "v2t_r1", "t2v_medianR"):
        assert k in m, k
    assert m["protocol"]["inference_n_clips"] == 2
    report = verify_ckpt.format_report(m)
    assert "paper" in report and "t2v_r1" in report
    # 1-clip override reaches the protocol (the fast smoke setting)
    m1 = verify_ckpt.run_verification(
        str(ckpt_path), str(ann), workspace["vid_store"],
        workspace["tokenizer_dir"], config=str(cfg_path),
        inference_n_clips=1, data_ratio=0.5)
    assert m1["protocol"]["inference_n_clips"] == 1
    assert m1["protocol"]["n_examples"] == 2

"""Shipped config files parse, validate, and resolve dataset specs."""

import glob
import os

from clipbert_tpu.core.config import (DatasetSpec, ModelConfig,
                                      load_run_config)

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_all_configs_parse_and_validate():
    paths = sorted(glob.glob(os.path.join(CFG_DIR, "*.json")))
    assert len(paths) >= 10
    for p in paths:
        if "base_model" in p:
            mc = ModelConfig.from_json(p)
            assert mc.hidden_size == 768 and mc.num_hidden_layers == 12
        else:
            cfg = load_run_config(["--config", p])
            cfg.validate()
            assert cfg.train_datasets or cfg.do_inference


def test_dataset_spec_txt_variants():
    assert DatasetSpec(txt="a.jsonl").txt_paths() == ["a.jsonl"]
    assert DatasetSpec(txt=["a", "b"]).txt_paths() == ["a", "b"]
    d = DatasetSpec(txt={"action": "act.jsonl", "frameqa": "fq.jsonl"})
    assert d.txt_paths("action") == ["act.jsonl"]


def test_tgif_config_task_dict():
    p = os.path.join(CFG_DIR, "tgif_qa_action_base_resnet50.json")
    cfg = load_run_config(["--config", p])
    assert cfg.task == "action"
    assert cfg.train_datasets[0].txt_paths(cfg.task)[0].endswith(
        "action_train.jsonl")


def test_cli_overrides_config(tmp_path):
    p = os.path.join(CFG_DIR, "msrvtt_ret_base_resnet50.json")
    cfg = load_run_config(["--config", p, "--train_batch_size", "99",
                           "--debug", "1"])
    assert cfg.train_batch_size == 99
    assert cfg.debug is True
    assert cfg.score_agg_func == "lse"  # from file


def test_restore_inference_config_keeps_inference_keys():
    from clipbert_tpu.core.config import RunConfig
    live = RunConfig(output_dir="/out", do_inference=True,
                     inference_n_clips=16, inference_batch_size=4,
                     train_batch_size=99)
    stored = {"train_batch_size": 16, "inference_n_clips": 1,
              "output_dir": "/training_out", "score_agg_func": "lse",
              "do_inference": False}
    merged = live.restore_from_training_args(stored)
    assert merged.train_batch_size == 16        # training arg replayed
    assert merged.score_agg_func == "lse"       # training arg replayed
    assert merged.inference_n_clips == 16       # inference_* kept live
    assert merged.output_dir == "/out"          # output_dir kept live
    assert merged.do_inference is True          # kept live


def test_pixel_knobs_wired():
    """img_pixel_mean/std flow into normalization; img_input_format is
    validated (reference config.py:93-96 via detectron2)."""
    import numpy as np
    import pytest
    from clipbert_tpu.core.config import RunConfig
    from clipbert_tpu.tasks import common

    cfg = RunConfig(img_pixel_mean=[1.0, 2.0, 3.0],
                    img_pixel_std=[2.0, 2.0, 2.0])
    mean, std = common.pixel_mean_std(cfg)
    assert mean == (1.0, 2.0, 3.0) and std == (2.0, 2.0, 2.0)
    # defaults: detectron2 caffe-style BGR means, unit std
    dmean, dstd = common.pixel_mean_std(RunConfig())
    assert dmean == (123.675, 116.28, 103.53) and dstd == (1.0, 1.0, 1.0)

    from clipbert_tpu.data import transforms
    px = np.full((1, 1, 2, 2, 3), 7, np.uint8)
    out = np.asarray(transforms.normalize_pixels(px, mean, std))
    np.testing.assert_allclose(out[..., 0], (7 - 1.0) / 2.0, rtol=1e-2)
    np.testing.assert_allclose(out[..., 2], (7 - 3.0) / 2.0, rtol=1e-2)

    with pytest.raises(AssertionError):
        RunConfig(img_input_format="YUV").validate()
    RunConfig(img_input_format="RGB").validate()


def test_inference_video_batch_size_survives_restore():
    from clipbert_tpu.core.config import RunConfig
    live = RunConfig(inference_video_batch_size=16)
    merged = live.restore_from_training_args(
        {"inference_video_batch_size": 4, "train_batch_size": 8})
    assert merged.inference_video_batch_size == 16
    assert merged.train_batch_size == 8


REF_CFG_DIR = "/root/reference/src/configs"

# Reference key -> our key (TPU renames: fp16/amp -> bf16 policy; the
# detectron2 weights path is just a backbone weights path here).
_REF_KEY_RENAMES = {
    "fp16": "bf16",
    "detectron2_weights_path": "backbone_weights_path",
}
# Reference-only keys with no counterpart in this framework: the backbone
# architecture is built into models/resnet.py (no detectron2 YAML), and
# HF's `model_type` tag is meaningless outside transformers' auto-loading.
_REF_KEYS_DROPPED = {"detectron2_model_cfg", "model_type"}
# Ours-only keys that merely restate the reference's argparse default for
# that task (reference src/configs/config.py defaults; get_vqa_args
# loss_type default "bce" at :318, itm_neg_prob 0.5 at :276,
# score_agg_func "mean" at :99). Any key containing "inference" is also
# permitted: the reference supplies those per-run on the CLI
# (README.md:109-124) and they are excluded from training-args restore.
_OURS_ONLY_DEFAULTS = {
    "score_agg_func": "mean",
    "itm_neg_prob": 0.5,
    "loss_type": {"vqa_base_resnet50.json": "bce"},
}


def _norm_cfg_value(key, value):
    if key == "model_config" and isinstance(value, str):
        # reference paths are repo-rooted under src/
        return value[len("src/"):] if value.startswith("src/") else value
    if key in ("train_datasets", "val_datasets"):
        out = []
        for d in value:
            d = {k: (v.rstrip("/") if isinstance(v, str) and "/" in v else v)
                 for k, v in d.items()}
            out.append(tuple(sorted(d.items(), key=lambda kv: kv[0])))
        return out
    if isinstance(value, bool):
        return int(value)
    return value


def test_shipped_configs_match_reference_values():
    """Every shipped JSON reproduces the reference's shipped values
    key-for-key, modulo the explicit rename/drop/default allowlists above —
    so hyperparameter drift can never silently recur (VERDICT r3 #2)."""
    import json

    import pytest

    if not os.path.isdir(REF_CFG_DIR):
        pytest.skip("reference checkout not available")

    ref_paths = sorted(glob.glob(os.path.join(REF_CFG_DIR, "*.json")))
    assert len(ref_paths) == 10
    for ref_path in ref_paths:
        name = os.path.basename(ref_path)
        ours_path = os.path.join(CFG_DIR, name)
        assert os.path.exists(ours_path), f"missing shipped config {name}"
        with open(ref_path) as f:
            ref = json.load(f)
        with open(ours_path) as f:
            ours = json.load(f)

        problems = []
        for ref_key, ref_val in ref.items():
            if ref_key in _REF_KEYS_DROPPED:
                continue
            our_key = _REF_KEY_RENAMES.get(ref_key, ref_key)
            if our_key not in ours:
                problems.append(f"missing key {our_key!r} (ref {ref_key!r})")
                continue
            got = _norm_cfg_value(our_key, ours.pop(our_key))
            want = _norm_cfg_value(ref_key, ref_val)
            if got != want:
                problems.append(f"{our_key}: ours={got!r} != ref={want!r}")
        # remaining ours-only keys must be allowlisted restatements
        for key, val in ours.items():
            if "inference" in key:
                continue
            if key == "backbone_weights_path" and "detectron2_weights_path" \
                    not in ref:
                problems.append(f"extra key {key!r}")
                continue
            allowed = _OURS_ONLY_DEFAULTS.get(key)
            if isinstance(allowed, dict):
                allowed = allowed.get(name, object())
            if key not in _OURS_ONLY_DEFAULTS or val != allowed:
                problems.append(f"extra key {key!r}={val!r} not an "
                                "allowlisted reference-default restatement")
        assert not problems, f"{name}: " + "; ".join(problems)


def test_vestigial_knobs_fail_loudly():
    """Accepted-but-unimplemented reference values must error, not silently
    substitute (reference's sgd/cnn_optim and linear/classifier branches are
    vestigial — no shipped config uses them)."""
    import pytest
    from clipbert_tpu.core.config import RunConfig

    with pytest.raises(ValueError, match="cnn_optim"):
        RunConfig(cnn_optim="sgd").validate()
    with pytest.raises(ValueError, match="classifier"):
        RunConfig(classifier="linear").validate()
    with pytest.raises(ValueError, match="optim"):
        RunConfig(optim="sgd", cnn_optim="sgd").validate()
    with pytest.raises(ValueError, match="one optimizer family"):
        RunConfig(optim="adamw", cnn_optim="adam").validate()
    RunConfig(optim="adamax", cnn_optim="adamax").validate()

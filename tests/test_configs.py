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

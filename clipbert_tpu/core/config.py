"""Configuration system.

Two-level configuration mirroring the reference semantics
(`/root/reference/src/configs/config.py`):

1. :class:`ModelConfig` — model architecture (the `base_model.json` contract:
   BERT-base fields + ClipBERT extras such as 2D grid position-embedding table
   sizes and the CNN output channel count), plus task-injected attributes
   (num_labels / loss_type / classifier / margin / pixel_random_sampling_size).

2. :class:`RunConfig` — the run/trainer flag set (the `SharedConfigs` contract:
   data paths, video sampling knobs, MIL knobs, batch/epochs/lr/decay, twin
   cnn_* hyperparameters, inference_* flags). Values are resolved as
   CLI > JSON config file > dataclass default, matching the reference's
   `parse_with_config` rule that explicit command-line flags win
   (`config.py:12-29`).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class ModelConfig:
    """Architecture config (reference `src/configs/base_model.json`)."""

    # BERT encoder
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0

    # ClipBERT visual extras (reference base_model.json + modeling.py:40-60)
    max_grid_row_position_embeddings: int = 100
    max_grid_col_position_embeddings: int = 100
    max_temporal_position_embeddings: int = 100
    backbone_channel_in_size: int = 2048

    # Task-injected attributes (reference injects these into BertConfig at
    # runner setup, e.g. run_video_qa.py:166-176)
    num_labels: int = 2
    loss_type: str = "ce"  # ce | bce | mse | rank
    classifier: str = "mlp"  # mlp | linear
    cls_hidden_scale: int = 2
    margin: float = 0.2  # ranking loss margin (retrieval)
    pixel_random_sampling_size: int = 0  # 0 disables; pretrain uses 100
    score_agg_func: str = "mean"  # mean | max | lse (cross-clip aggregation)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_json(cls, path: str, **overrides: Any) -> "ModelConfig":
        with open(path) as f:
            raw = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in known}
        kwargs.update(overrides)
        return cls(**kwargs)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def replace(self, **kw: Any) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclass
class DatasetSpec:
    """One dataset entry (reference task-config `train_datasets` items).

    ``txt`` may be a single jsonl path, a list of paths (merged, e.g. the
    reference VQA config), or a {task: path} dict (e.g. the TGIF-QA config,
    resolved by the runner's `task` flag).
    """

    name: str = ""
    txt: Any = ""   # str | list[str] | {task: str}
    img: str = ""   # path to media store (.cbpk / lmdb dir / file dir)
    ratio: float = 1.0  # MetaLoader sampling weight
    vis_format: str = "image"  # image | video (pretrain datasets)

    def txt_paths(self, task: str = "") -> List[str]:
        if isinstance(self.txt, str):
            return [self.txt]
        if isinstance(self.txt, dict):
            assert task in self.txt, (task, list(self.txt))
            v = self.txt[task]
            return [v] if isinstance(v, str) else list(v)
        return list(self.txt)

    @classmethod
    def from_obj(cls, obj: Any) -> "DatasetSpec":
        if isinstance(obj, DatasetSpec):
            return obj
        return cls(**{k: v for k, v in dict(obj).items()
                      if k in {f.name for f in dataclasses.fields(cls)}})


@dataclass
class RunConfig:
    """Run/trainer flags (reference `SharedConfigs`, config.py:42-232)."""

    # debug
    debug: bool = False
    data_ratio: float = 1.0

    # required paths
    model_config: str = ""
    tokenizer_dir: str = ""
    output_dir: str = ""

    # datasets
    train_datasets: List[Any] = field(default_factory=list)
    val_datasets: List[Any] = field(default_factory=list)

    # data preprocessing
    max_txt_len: int = 20
    max_img_size: int = 448
    img_pixel_mean: Optional[List[float]] = None
    img_pixel_std: Optional[List[float]] = None
    img_input_format: str = "BGR"
    # True: datasets emit native-size frames and resize/pad/normalize run
    # on-device in one jitted MXU program (transforms.resize_pad_normalize);
    # False: host torch resize, the reference transform kept as parity oracle.
    device_preprocess: bool = True
    max_n_example_per_group: int = 2

    # video sampling
    fps: int = 1
    num_frm: int = 3
    frm_sampling_strategy: str = "rand"  # rand|uniform|start|middle|end

    # MIL training
    train_n_clips: int = 3
    score_agg_func: str = "mean"  # mean|max|lse
    random_sample_clips: bool = True

    # training
    # rematerialize CNN stages + BERT scan body in the backward pass:
    # more forward FLOPs for a large activation-memory cut, raising the
    # per-chip batch ceiling (jax.checkpoint; no reference equivalent).
    # True picks the measured-best "early" granularity (checkpoint only
    # the big stem/res2/res3 activations); strings "stage"|"block"|"early"
    # select explicitly (models/resnet.py::resnet50_forward docstring)
    remat: bool = False
    train_batch_size: int = 128
    val_batch_size: int = 128
    gradient_accumulation_steps: int = 1
    learning_rate: float = 5e-5
    num_valid: int = 20
    min_valid_steps: int = 100
    save_steps_ratio: float = 0.01
    num_train_epochs: int = 10
    optim: str = "adamw"  # adam|adamax|adamw
    betas: Tuple[float, float] = (0.9, 0.98)
    decay: str = "linear"  # linear|invsqrt|multi_step|constant
    dropout: float = 0.1
    weight_decay: float = 1e-3
    grad_norm: float = 2.0  # -1 disables clipping
    warmup_ratio: float = 0.1
    transformer_lr_mul: float = 1.0
    transformer_lr_mul_prefix: str = ""
    step_decay_epochs: Optional[List[int]] = None

    # CNN twin hyperparameters
    cnn_optim: str = "adamw"
    cnn_learning_rate: float = 5e-5
    cnn_weight_decay: float = 1e-3
    cnn_sgd_momentum: float = 0.9
    cnn_lr_mul: float = 1.0
    cnn_lr_mul_prefix: str = "grid_encoder"
    cnn_lr_decay: str = "linear"
    cnn_step_decay_epochs: Optional[List[int]] = None
    freeze_cnn: bool = False

    # checkpoints
    e2e_weights_path: Optional[str] = None
    backbone_weights_path: Optional[str] = None  # reference: detectron2_weights_path
    bert_weights_path: Optional[str] = None

    # inference flags — like the reference, any flag whose name contains
    # "inference" survives config restoration at eval time
    # (run_video_retrieval.py:762-766)
    inference_model_step: int = -1
    do_inference: bool = False
    inference_split: str = "val"
    inference_txt_db: Optional[str] = None
    inference_img_db: Optional[str] = None
    inference_batch_size: int = 64
    inference_n_clips: int = 1
    # videos whose cached features fold into one BERT scoring batch during
    # full-matrix retrieval eval (ours; the reference recomputes per text
    # minibatch instead, run_video_retrieval.py:640-666). 8 is the
    # A/B-measured v5e optimum bench.py reports at.
    inference_video_batch_size: int = 8

    # multi-host (pod-slice) launch topology. On Cloud TPU pods these
    # auto-detect (leave unset); for manual launches pass all three on every
    # process. They replace the reference's `horovodrun -np N` / mpirun
    # launch surface (README.md:93). Like the inference_* keys, they are
    # launch-specific and never replayed from stored training args.
    coordinator_address: Optional[str] = None  # "host:port" of process 0
    num_processes: int = -1                    # -1 = auto-detect
    process_id: int = -1                       # -1 = auto-detect

    # device / precision
    seed: int = 42
    bf16: bool = True  # TPU-native replacement of the reference's fp16/amp O2
    n_workers: int = 4
    profile_dir: Optional[str] = None  # jax.profiler trace output (steps 10-15)

    # task-specific (populated by per-task arg extenders; kept here so JSON
    # round-trips and restore-at-inference behave like the reference)
    itm_neg_prob: float = 0.5
    use_itm: bool = False
    use_mlm: bool = False
    pixel_random_sampling_size: int = 0
    itm_neg_size: int = 1
    classifier: str = "mlp"
    cls_hidden_scale: int = 2
    margin: float = 0.2
    loss_type: str = "ce"
    eval_retrieval_batch_size: int = 256
    ans2label_path: Optional[str] = None
    num_labels: int = 2
    task: str = ""  # video-qa task selector: action|transition|frameqa|msrvtt_qa

    def __post_init__(self) -> None:
        self.train_datasets = [DatasetSpec.from_obj(d) for d in self.train_datasets]
        self.val_datasets = [DatasetSpec.from_obj(d) for d in self.val_datasets]
        if isinstance(self.betas, list):
            self.betas = tuple(self.betas)

    def validate(self) -> None:
        """Cross-checks mirroring reference config.py:261-271, plus
        fail-loudly rules for knob values the reference accepts but never
        actually ships (no accepted value may silently change behavior)."""
        assert self.gradient_accumulation_steps >= 1
        assert 0 < self.data_ratio <= 1.0
        assert self.max_img_size > 0
        assert self.img_input_format in ("BGR", "RGB"), (
            f"img_input_format must be BGR or RGB, got "
            f"{self.img_input_format!r}")
        if self.score_agg_func == "lse":
            assert self.loss_type == "ce", (
                f"lse aggregation requires ce loss, not {self.loss_type}")
        implemented = ("adam", "adamax", "adamw")
        if self.optim not in implemented:
            raise ValueError(f"optim={self.optim!r}; implemented: {implemented}")
        if self.cnn_optim not in implemented:
            # the reference parses cnn_optim="sgd" but no shipped config uses
            # it (its sgd branch is vestigial, optimization/utils.py:118-127)
            raise ValueError(
                f"cnn_optim={self.cnn_optim!r} is not implemented; "
                f"use one of {implemented}")
        if self.cnn_optim != self.optim:
            raise ValueError(
                f"cnn_optim={self.cnn_optim!r} != optim={self.optim!r}: the "
                "engine runs one optimizer family across all 8 groups (every "
                "reference config uses adamw for both; twin LR/decay knobs "
                "remain per-side)")
        if self.classifier != "mlp":
            # reference accepts classifier="linear" but every shipped config
            # and head uses the mlp classifier (modeling.py head setup)
            raise ValueError(
                f"classifier={self.classifier!r} is not implemented; only "
                "'mlp' heads exist ('linear' is vestigial in the reference)")

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        return d

    def replace(self, **kw: Any) -> "RunConfig":
        return dataclasses.replace(self, **kw)

    def restore_from_training_args(self, stored: Dict[str, Any]) -> "RunConfig":
        """At inference, overwrite this config with the stored training args,
        keeping any key containing 'inference' plus output_dir
        (reference run_video_retrieval.py:762-766)."""
        keep = {k for k in self.to_dict() if "inference" in k}
        keep.add("output_dir")
        keep.add("do_inference")
        # launch topology belongs to THIS launch, not the training run
        keep.update(("coordinator_address", "num_processes", "process_id"))
        known = {f.name for f in dataclasses.fields(RunConfig)}
        merged = self.to_dict()
        for k, v in stored.items():
            if k in known and k not in keep:
                merged[k] = v
        return RunConfig(**merged)


def _coerce(value: str, default: Any) -> Any:
    """Coerce a CLI string to the type of the dataclass default."""
    if isinstance(default, bool):
        return value not in ("0", "false", "False")
    if isinstance(default, int):
        return int(value)
    if isinstance(default, float):
        return float(value)
    return value


def load_run_config(argv: Optional[List[str]] = None,
                    defaults: Optional[Dict[str, Any]] = None) -> RunConfig:
    """Resolve a RunConfig: CLI flags > JSON --config file > defaults.

    Mirrors the reference rule that only flags explicitly present on the
    command line override the config file (`config.py:12-29`).
    """
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(description="clipbert_tpu run config",
                                     allow_abbrev=False)
    parser.add_argument("--config", type=str, default=None)
    fields = {f.name: f for f in dataclasses.fields(RunConfig)}
    for name in fields:
        parser.add_argument(f"--{name}", type=str, default=None, nargs="*")
    parsed, _ = parser.parse_known_args(argv)

    base: Dict[str, Any] = dict(defaults or {})
    if parsed.config:
        with open(parsed.config) as f:
            cfg = json.load(f)
        for k, v in cfg.items():
            if k in fields:
                base[k] = v
    # explicit CLI flags win
    explicit = {a[2:].split("=")[0] for a in argv if a.startswith("--")}
    proto = RunConfig()
    for name in fields:
        if name in explicit and getattr(parsed, name) is not None:
            raw = getattr(parsed, name)
            default = getattr(proto, name)
            if isinstance(raw, list) and not isinstance(default, (list, tuple)):
                raw = raw[0] if raw else ""
            if isinstance(raw, list):
                elt = (default[0] if isinstance(default, (list, tuple)) and default
                       else 0.0)
                base[name] = [_coerce(x, elt) for x in raw]
            else:
                base[name] = _coerce(raw, default if default is not None else "")
    cfg = RunConfig(**base)
    return cfg


def inject_task_attrs(model_cfg: ModelConfig, run_cfg: RunConfig) -> ModelConfig:
    """Inject per-task attributes into the model config, as the reference does
    when constructing BertConfig at runner setup (run_video_qa.py:166-176)."""
    return model_cfg.replace(
        num_labels=run_cfg.num_labels,
        loss_type=run_cfg.loss_type,
        classifier=run_cfg.classifier,
        cls_hidden_scale=run_cfg.cls_hidden_scale,
        margin=run_cfg.margin,
        pixel_random_sampling_size=run_cfg.pixel_random_sampling_size,
        score_agg_func=run_cfg.score_agg_func,
        hidden_dropout_prob=run_cfg.dropout,
    )

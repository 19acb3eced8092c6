"""clipbert_tpu: a TPU-native (JAX/XLA/Pallas/pjit) video-and-language framework.

From-scratch rebuild of the capabilities of jayleicn/ClipBERT ("Less is More:
ClipBERT for Video-and-Language Learning via Sparse Sampling", CVPR 2021):
end-to-end learning from raw videos/images + text via sparse clip sampling.

Layer map (bottom-up):
  core/     config system, device mesh, dtype policy, rng threading
  ops/      compute primitives (layernorm, attention, conv helpers, Pallas kernels)
  models/   ResNet-50 grid-feature backbone, BERT encoder, ClipBERT task heads
  parallel/ multi-host & multi-chip collectives and sharding helpers
  train/    optimizer (AdamW w/ 8 param groups), LR schedules, step functions, trainer
  data/     tokenizer, samplers, transforms, datasets, loaders, media stores
  evaluation/ retrieval metrics (VQA / TGIF-QA scorers live on the datasets)
  ckpt/     checkpoint save/restore + PyTorch-checkpoint importers
  tasks/    per-task entrypoints (pretrain, retrieval, video QA, VQA, MSRVTT-MC)
"""

__version__ = "0.1.0"

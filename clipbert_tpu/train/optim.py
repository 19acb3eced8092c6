"""AdamW with the reference's 8-param-group structure, as a pure pytree update.

Reference behavior being matched:
 - HF-style AdamW with decoupled weight decay and bias correction
   (`/root/reference/src/optimization/adamw.py:60-101`, eps 1e-6).
 - setup_e2e_optimizer's name-based split into exactly 8 groups
   (`/root/reference/src/optimization/utils.py:96-161`):
   {transformer, cnn} x {lr_mul-prefix "top", rest} x {decay, no_decay},
   where no_decay = biases + LayerNorm params, the transformer groups use
   `learning_rate` and the cnn groups `cnn_learning_rate`, and the prefix
   groups get lr * lr_mul. Group LRs are re-derived from schedules every step
   (e.g. run_video_qa.py:521-546) — here the schedule lives inside the jitted
   update.
 - FrozenBatchNorm buffers never train (they are torch buffers); `freeze_cnn`
   stops the whole CNN (config.py:176-178).

TPU-first: instead of materializing group lists, each leaf carries static
metadata (use_cnn_lr, lr_mul, weight_decay, trainable) computed once from its
pytree path; the update is a single fused tree_map under jit, and grads/params
never leave the device.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class GroupMeta(NamedTuple):
    """Static per-leaf optimizer metadata (hashable, not a pytree node)."""
    use_cnn_lr: bool
    lr_mul: float
    weight_decay: float
    trainable: bool
    group_id: int  # 0..7 (the reference's 8 groups) or -1 for frozen


@dataclass(frozen=True)
class OptimConfig:
    optim: str = "adamw"  # adamw | adam | adamax (utils.py:118-127)
    learning_rate: float = 5e-5
    cnn_learning_rate: float = 5e-5
    weight_decay: float = 1e-3
    cnn_weight_decay: float = 1e-3
    betas: Tuple[float, float] = (0.9, 0.98)
    eps: float = 1e-6
    correct_bias: bool = True
    grad_norm: float = 2.0  # -1 disables clipping
    transformer_lr_mul: float = 1.0
    transformer_lr_mul_prefix: str = ""
    cnn_lr_mul: float = 1.0
    cnn_lr_mul_prefix: str = "grid_encoder"
    freeze_cnn: bool = False


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _is_no_decay(name: str) -> bool:
    # reference no_decay = ['bias', 'LayerNorm.bias', 'LayerNorm.weight'];
    # in our trees LayerNorm params live under .../ln/{scale,bias}
    leaf = name.rsplit("/", 1)[-1]
    return leaf == "bias" or "/ln/" in name or name.endswith("/ln")


def _is_frozen_leaf(name: str, cfg: OptimConfig) -> bool:
    if "cnn/" in name or name.startswith("cnn"):
        if cfg.freeze_cnn:
            return True
        if "/bn/" in name:  # FrozenBatchNorm folded (scale, bias) pairs
            return True
    # regression-head BatchNorm1d running stats are state, not weights
    if "regressor/bn/mean" in name or "regressor/bn/var" in name:
        return True
    return False


def build_group_meta(params: Dict, cfg: OptimConfig) -> Dict:
    """Pytree of GroupMeta mirroring `params`. Group ids follow the
    reference order: transformer [top_decay, top_nodecay, decay, nodecay]
    then cnn [same] (utils.py:115-117, 146-160)."""

    def meta_for(path, _leaf) -> GroupMeta:
        name = _path_str(path)
        is_cnn = name.startswith("cnn")
        if _is_frozen_leaf(name, cfg):
            return GroupMeta(is_cnn, 0.0, 0.0, False, -1)
        prefix = cfg.cnn_lr_mul_prefix if is_cnn else cfg.transformer_lr_mul_prefix
        lr_mul = cfg.cnn_lr_mul if is_cnn else cfg.transformer_lr_mul
        is_top = bool(prefix) and prefix in name
        no_decay = _is_no_decay(name)
        wd = 0.0 if no_decay else (cfg.cnn_weight_decay if is_cnn
                                   else cfg.weight_decay)
        gid = (4 if is_cnn else 0) + (0 if is_top else 2) + (1 if no_decay else 0)
        return GroupMeta(is_cnn, lr_mul if is_top else 1.0, wd, True, gid)

    return jax.tree_util.tree_map_with_path(meta_for, params)


class AdamWState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    mu: Any
    nu: Any


def init_adamw_state(params: Dict) -> AdamWState:
    # moments are allocated for every leaf, including frozen ones (zeroed,
    # never read) — ~190MB of HBM/bundle waste under freeze_cnn, kept
    # deliberately so the restore-bundle schema is structure-stable across
    # freeze configurations (resuming a freeze_cnn run without the flag,
    # as reference fine-tuning recipes do, just works)
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamWState(jnp.zeros((), jnp.int32), zeros,
                      jax.tree.map(jnp.zeros_like, params))


def global_norm(tree) -> jnp.ndarray:
    leaves = [jnp.sum(jnp.square(x.astype(jnp.float32)))
              for x in jax.tree.leaves(tree)]
    return jnp.sqrt(jnp.sum(jnp.stack(leaves)))


def clip_by_global_norm(grads, max_norm: float):
    """torch.nn.utils.clip_grad_norm_ semantics: scale by
    max_norm / (norm + 1e-6) when norm exceeds max_norm."""
    norm = global_norm(grads)
    coef = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: g * coef.astype(g.dtype), grads), norm


def _elementwise_update(pf, g, m, v, lr, wd, cfg: OptimConfig,
                        bias_corr, t):
    """The per-element optimizer math, shared by the per-leaf and the
    group-fused paths (identical expressions -> bitwise-identical results).
    All inputs fp32."""
    b1, b2 = cfg.betas
    if cfg.optim == "adamw":
        # decoupled weight decay (reference adamw.py:60-101)
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * jnp.square(g)
        pf = pf - lr * (m / (jnp.sqrt(v) + cfg.eps) * bias_corr)
        if wd > 0:
            pf = pf - lr * wd * pf
    elif cfg.optim == "adam":
        # torch.optim.Adam: L2 reg folded into the gradient
        if wd > 0:
            g = g + wd * pf
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * jnp.square(g)
        pf = pf - lr * (m / (jnp.sqrt(v) + cfg.eps) * bias_corr)
    elif cfg.optim == "adamax":
        # torch.optim.Adamax: infinity-norm second moment
        if wd > 0:
            g = g + wd * pf
        m = b1 * m + (1.0 - b1) * g
        v = jnp.maximum(b2 * v, jnp.abs(g))
        pf = pf - (lr / (1.0 - b1 ** t)) * (m / (v + cfg.eps))
    else:
        raise ValueError(f"unknown optim {cfg.optim}")
    return pf, m, v


def _bias_corr(cfg: OptimConfig, step):
    b1, b2 = cfg.betas
    t = step.astype(jnp.float32)
    if cfg.correct_bias:
        return jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t), t
    return jnp.float32(1.0), t


def adamw_update(params: Dict, grads: Dict, state: AdamWState,
                 meta: Dict, cfg: OptimConfig,
                 lr_transformer, lr_cnn, fused: bool = True):
    """One AdamW step. lr_transformer / lr_cnn are (traced) scalars from
    the schedules; per-leaf lr = base * lr_mul per its group.

    ``fused=True`` (default) routes through the group-fused implementation
    — one concatenated buffer per optimizer group instead of ~7 ops per
    leaf x ~300 leaves. Measured on the real chip the per-leaf tree update
    was 86 ms of a 149 ms train step (kernel-launch bound, not bandwidth);
    the 8-group structure is exactly the uniform-hyperparameter boundary,
    so fusion changes nothing mathematically (tested exact-equal). Keep
    ``fused=False`` for tensor-parallel state shardings — concatenating
    model-axis-sharded leaves would force gathers.
    """
    if fused:
        return _adamw_update_fused(params, grads, state, meta, cfg,
                                   lr_transformer, lr_cnn)
    # the reference clips amp master params = the 8 optimizer groups only
    # (optimization/utils.py:96-161; frozen BN pairs are torch buffers with
    # no grad there) — zero frozen leaves so they don't contribute to the
    # global norm / clip coefficient / logged grad_norm
    grads = jax.tree.map(
        lambda g, gm: g if gm.trainable else jnp.zeros_like(g), grads, meta)
    if cfg.grad_norm is not None and cfg.grad_norm > 0:
        grads, grad_norm_val = clip_by_global_norm(grads, cfg.grad_norm)
    else:
        grad_norm_val = global_norm(grads)

    step = state.step + 1
    bias_corr, t = _bias_corr(cfg, step)

    def upd(p, g, m, v, gm: GroupMeta):
        if not gm.trainable:
            return p, m, v
        lr = (lr_cnn if gm.use_cnn_lr else lr_transformer) * gm.lr_mul
        pf, m, v = _elementwise_update(
            p.astype(jnp.float32), g.astype(jnp.float32), m, v,
            lr, gm.weight_decay, cfg, bias_corr, t)
        return pf.astype(p.dtype), m, v

    out = jax.tree.map(upd, params, grads, state.mu, state.nu, meta,
                       is_leaf=lambda x: isinstance(x, GroupMeta))
    outer = jax.tree.structure(params)
    inner = jax.tree.structure((0, 0, 0))
    new_params, new_mu, new_nu = jax.tree_util.tree_transpose(outer, inner, out)
    return new_params, AdamWState(step, new_mu, new_nu), grad_norm_val


# Leaves at or above this many elements update in their NATIVE shape (one
# fused kernel each — they're few: stacked BERT kernels, big convs,
# embeddings); only the long tail of small leaves (biases, LN/BN pairs,
# 1x1 convs) concatenates per group. Concatenating everything into one
# >100M-element vector triggered a pathological XLA layout on TPU (the
# vector reshaped to [N/2, 2] and tile-padded (8,128) -> 64x memory, a
# 28 GB compile-time allocation); native-shape updates for the big leaves
# keep their layouts while still collapsing ~2000 per-leaf kernels to ~60.
_FUSE_CONCAT_MAX_ELEMS = 1 << 20


def _adamw_update_fused(params: Dict, grads: Dict, state: AdamWState,
                        meta: Dict, cfg: OptimConfig, lr_transformer, lr_cnn):
    """Group-fused update: big leaves update in native shape, small leaves
    concatenate into one fp32 vector per optimizer group — ~8 bag kernels
    + ~30 big-leaf kernels instead of ~7 ops x ~300 leaves. The clip norm
    comes from the same partials (frozen leaves excluded — the value the
    per-leaf path computes over zeroed frozen grads, modulo summation
    order). State schema is unchanged: moments stay per-leaf trees."""
    leaves_p, treedef = jax.tree_util.tree_flatten(params)
    leaves_g = jax.tree.leaves(grads)
    leaves_m = jax.tree.leaves(state.mu)
    leaves_v = jax.tree.leaves(state.nu)
    metas = jax.tree.leaves(
        meta, is_leaf=lambda x: isinstance(x, GroupMeta))
    assert len(leaves_p) == len(metas)

    groups: Dict[int, list] = {}
    big: list = []
    for i, gm in enumerate(metas):
        if not gm.trainable:
            continue
        if leaves_p[i].size >= _FUSE_CONCAT_MAX_ELEMS:
            big.append(i)
        else:
            groups.setdefault(gm.group_id, []).append(i)
    if not groups and not big:          # fully-frozen model: no-op update
        return params, AdamWState(state.step + 1, state.mu, state.nu), \
            jnp.float32(0.0)

    def cat(leaves, idxs):
        return jnp.concatenate(
            [leaves[i].astype(jnp.float32).ravel() for i in idxs])

    gvecs = {gid: cat(leaves_g, idxs) for gid, idxs in groups.items()}
    gbig = {i: leaves_g[i].astype(jnp.float32) for i in big}
    sq = [jnp.sum(jnp.square(g)) for g in gvecs.values()]
    sq += [jnp.sum(jnp.square(g)) for g in gbig.values()]
    norm = jnp.sqrt(jnp.sum(jnp.stack(sq)))
    if cfg.grad_norm is not None and cfg.grad_norm > 0:
        coef = jnp.minimum(1.0, cfg.grad_norm / (norm + 1e-6))
    else:
        coef = jnp.float32(1.0)

    step = state.step + 1
    bias_corr, t = _bias_corr(cfg, step)

    def lr_of(gm):
        return (lr_cnn if gm.use_cnn_lr else lr_transformer) * gm.lr_mul

    new_p = list(leaves_p)
    new_m = list(leaves_m)
    new_v = list(leaves_v)
    for i in big:
        gm = metas[i]
        pf, m2, v2 = _elementwise_update(
            leaves_p[i].astype(jnp.float32), gbig[i] * coef,
            leaves_m[i], leaves_v[i], lr_of(gm), gm.weight_decay, cfg,
            bias_corr, t)
        new_p[i] = pf.astype(leaves_p[i].dtype)
        new_m[i], new_v[i] = m2, v2
    for gid, idxs in groups.items():
        gm0 = metas[idxs[0]]
        pv, mv, vv = cat(leaves_p, idxs), cat(leaves_m, idxs), \
            cat(leaves_v, idxs)
        pv2, mv2, vv2 = _elementwise_update(
            pv, gvecs[gid] * coef, mv, vv, lr_of(gm0), gm0.weight_decay,
            cfg, bias_corr, t)
        sizes = np.cumsum([leaves_p[i].size for i in idxs])[:-1]
        for i, pc, mc, vc in zip(idxs, jnp.split(pv2, sizes),
                                 jnp.split(mv2, sizes),
                                 jnp.split(vv2, sizes)):
            new_p[i] = pc.reshape(leaves_p[i].shape).astype(
                leaves_p[i].dtype)
            new_m[i] = mc.reshape(leaves_m[i].shape)
            new_v[i] = vc.reshape(leaves_v[i].shape)

    unflatten = treedef.unflatten
    return unflatten(new_p), AdamWState(step, unflatten(new_m),
                                        unflatten(new_v)), norm


def count_groups(meta: Dict) -> Dict[int, int]:
    """#leaves per group id — the reference asserts 8 groups exist
    (run_vqa.py:388); tests assert ids 0..7 are all populated."""
    counts: Dict[int, int] = {}
    for gm in jax.tree.leaves(meta, is_leaf=lambda x: isinstance(x, GroupMeta)):
        counts[gm.group_id] = counts.get(gm.group_id, 0) + 1
    return counts

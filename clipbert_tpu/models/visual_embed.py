"""Visual input embedding.

Behavioral contract from the reference VisualInputEmbedding
(`/root/reference/src/modeling/modeling.py:40-101`):
  grid (B, n_frm, H, W, D)
    -> temporal mean-pool over frames          (:73)
    -> + learned row/col 2D position embeddings (:124-153)
    -> flatten to (B, H*W, D) token sequence    (:76)
    -> optional train-time pixel random sampling to K tokens (:80-88;
       indices sampled once per forward, shared across the batch, sorted)
    -> + (single) token-type embedding, LayerNorm, dropout (:93-100)

The (unused-in-forward) sequence `position_embeddings` table is kept in the
param pytree so reference checkpoints round-trip exactly.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from clipbert_tpu.core.config import ModelConfig
from clipbert_tpu.ops.dropout import dropout
from clipbert_tpu.ops.layernorm import layer_norm


def init_visual_embeddings(key, cfg: ModelConfig) -> Dict:
    ks = jax.random.split(key, 4)
    std = cfg.initializer_range
    D = cfg.hidden_size
    return {
        "position_embeddings": jax.random.normal(
            ks[0], (cfg.max_position_embeddings, D), jnp.float32) * std,
        "row_position_embeddings": jax.random.normal(
            ks[1], (cfg.max_grid_row_position_embeddings, D), jnp.float32) * std,
        "col_position_embeddings": jax.random.normal(
            ks[2], (cfg.max_grid_col_position_embeddings, D), jnp.float32) * std,
        "token_type_embeddings": jax.random.normal(
            ks[3], (1, D), jnp.float32) * std,
        "ln": {"scale": jnp.ones((D,), jnp.float32),
               "bias": jnp.zeros((D,), jnp.float32)},
    }


def visual_embeddings(p: Dict, grid: jnp.ndarray, cfg: ModelConfig,
                      dropout_key: Optional[jax.Array] = None,
                      pixel_sampling_key: Optional[jax.Array] = None
                      ) -> jnp.ndarray:
    """(B, n_frm, H, W, D) grid features -> (B, Lv, D) visual tokens.

    Pixel random sampling runs only when ``pixel_sampling_key`` is provided
    (training during pretraining) and K < H*W, mirroring the reference's
    train-only gate (modeling.py:78-88). Shapes stay static under jit because
    K and H*W are Python ints at trace time.
    """
    B, T, H, W, D = grid.shape
    g = jnp.mean(grid, axis=1)  # temporal mean pool (B, H, W, D)
    g = g + p["row_position_embeddings"][:H][None, :, None, :].astype(g.dtype)
    g = g + p["col_position_embeddings"][:W][None, None, :, :].astype(g.dtype)
    tokens = g.reshape(B, H * W, D)

    k = cfg.pixel_random_sampling_size
    if pixel_sampling_key is not None and 0 < k < H * W:
        idx = jax.random.choice(pixel_sampling_key, H * W, (k,), replace=False)
        idx = jnp.sort(idx)  # sorted, batch-shared, like the reference
        tokens = jnp.take(tokens, idx, axis=1)

    tokens = tokens + p["token_type_embeddings"][0][None, None, :].astype(tokens.dtype)
    tokens = layer_norm(tokens, p["ln"]["scale"], p["ln"]["bias"],
                        cfg.layer_norm_eps)
    return dropout(tokens, cfg.hidden_dropout_prob, dropout_key)

"""Dropout with explicit rng key (None key or rate 0 -> identity)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dropout(x: jnp.ndarray, rate: float, key: Optional[jax.Array]) -> jnp.ndarray:
    if key is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))

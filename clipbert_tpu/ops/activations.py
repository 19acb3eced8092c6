"""Activation functions (reference `transformers.py:144-145` ACT2FN)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf-based) GELU — matches HF `gelu` used by BERT."""
    return jax.nn.gelu(x, approximate=False)


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-approximated GELU (HF `gelu_new`)."""
    return jax.nn.gelu(x, approximate=True)


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x))


ACT2FN = {
    "gelu": gelu,
    "relu": jax.nn.relu,
    "swish": swish,
    "gelu_new": gelu_new,
    "mish": mish,
}

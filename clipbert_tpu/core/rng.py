"""RNG threading helpers.

The reference seeds python/numpy/torch RNGs globally (`misc.py:21-26`) and
relies on implicit per-op randomness (dropout, clip sampling, MLM masks).
JAX randomness is explicit: every stochastic op gets a key derived from a
root key. We thread a single key through forward passes and split named
subkeys deterministically, so parity tests can pin seeds.
"""

from __future__ import annotations

import zlib
from typing import Dict, Optional

import jax


class RngGen:
    """Deterministic named-key generator for one step.

    Usage::
        rngs = RngGen(key)
        dropout_key = rngs("dropout")   # stable per (step key, name, counter)
    """

    def __init__(self, key: Optional[jax.Array]):
        self._key = key
        self._counts: Dict[str, int] = {}

    def __call__(self, name: str) -> Optional[jax.Array]:
        if self._key is None:
            return None
        idx = self._counts.get(name, 0)
        self._counts[name] = idx + 1
        tag = zlib.crc32(name.encode()) & 0x7FFFFFFF  # stable across processes
        return jax.random.fold_in(jax.random.fold_in(self._key, tag), idx)


def maybe_split(key: Optional[jax.Array], n: int = 2):
    if key is None:
        return (None,) * n
    return jax.random.split(key, n)

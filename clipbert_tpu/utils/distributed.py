"""Host-level distributed helpers.

The reference's Horovod host-object collectives
(`/root/reference/src/utils/distributed.py:148-203` — pickle into fixed 4KB
CUDA byte buffers + hvd.allgather / hvd.broadcast) map to JAX multihost
utilities; on a single host they degenerate to identity, which is also the
test path. Device-side gradient collectives don't live here — they are XLA
psums inserted by GSPMD inside the jitted train step (train/steps.py).
"""

from __future__ import annotations

import pickle
from typing import Any, List

import numpy as np


def process_index() -> int:
    import jax
    return jax.process_index()


def process_count() -> int:
    import jax
    return jax.process_count()


def is_main_process() -> bool:
    return process_index() == 0


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every host
    (replaces all_gather_list, distributed.py:148-177)."""
    if process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    # pad to a host-wide max length, prefixing the true length
    local_len = np.array([len(payload)], np.int32)
    all_lens = multihost_utils.process_allgather(local_len)
    max_len = int(np.max(all_lens))
    padded = np.zeros(max_len, np.uint8)
    padded[:len(payload)] = payload
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for i in range(gathered.shape[0]):
        n = int(all_lens[i][0] if all_lens.ndim > 1 else all_lens[i])
        out.append(pickle.loads(gathered[i, :n].tobytes()))
    return out


def broadcast_object(obj: Any, root: int = 0) -> Any:
    """Broadcast a picklable object from the root host (replaces
    any_broadcast, distributed.py:180-203).

    A true one-to-all: only the root's payload crosses the network (one
    scalar length round, then one root-sourced byte array) — not a
    gather-and-discard, which would ship every host's payload to every
    host (N^2 bytes) for nothing.
    """
    if process_count() == 1:
        return obj
    from jax.experimental import multihost_utils
    is_src = process_index() == root
    payload = (np.frombuffer(pickle.dumps(obj), np.uint8) if is_src
               else np.zeros(0, np.uint8))
    n = int(multihost_utils.broadcast_one_to_all(
        np.array(len(payload), np.int32), is_source=is_src))
    buf = np.zeros(n, np.uint8)
    if is_src:
        buf[:] = payload
    out = multihost_utils.broadcast_one_to_all(buf, is_source=is_src)
    return obj if is_src else pickle.loads(np.asarray(out).tobytes())

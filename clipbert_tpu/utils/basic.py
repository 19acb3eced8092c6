"""Small io / misc helpers (reference `src/utils/basic_utils.py`,
`src/utils/misc.py`)."""

from __future__ import annotations

import json
import random
from typing import Any, Dict, Iterable, List

import numpy as np


def load_json(path: str) -> Any:
    with open(path) as f:
        return json.load(f)


def save_json(obj: Any, path: str, indent: int = 2) -> None:
    with open(path, "w") as f:
        json.dump(obj, f, indent=indent, default=str)


def load_jsonl(path: str) -> List[Dict]:
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def save_jsonl(rows: Iterable[Dict], path: str) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r, default=str) + "\n")


def flat_list_of_lists(lst: Iterable[Iterable]) -> List:
    return [x for sub in lst for x in sub]


def set_random_seed(seed: int) -> None:
    """Seed host-side RNGs (misc.py:21-26). Device randomness is explicit
    jax keys and doesn't need this."""
    random.seed(seed)
    np.random.seed(seed)

"""JSON IO helpers (reference chexpert.py:81-88)."""

from __future__ import annotations

import json
import os
from typing import Any


def is_primary() -> bool:
    """True on the process that owns run artifacts (process 0).

    Multi-process runs compute identical metrics on every host (eval
    allgathers, train/loop.py:63-69), so writes are primary-only — the
    others would merely race on the shared files."""
    import jax

    return jax.process_index() == 0


def save_json(data: Any, filename: str, output_dir: str) -> str:
    path = os.path.join(output_dir, filename + ".json")
    if not is_primary():
        return path
    with open(path, "w") as f:
        json.dump(data, f, indent=4)
    return path


def load_json(file_path: str) -> Any:
    with open(file_path) as f:
        return json.load(f)


def enable_compilation_cache(path: str = "") -> None:
    """Persistent XLA compilation cache — compiles on this class of host cost
    minutes; cache them across processes/runs."""
    import os

    import jax

    cache = path or os.environ.get(
        "CHEXPERT_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/chexpert_tpu_xla")
    )
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without the flags

"""Converted-checkpoint caching with orbax (SURVEY.md §5.4).

The reference reloads torch checkpoints via from_pretrained each run; here
converted flax trees are cached on disk so subsequent loads skip the
safetensors -> pytree conversion entirely.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def save_params(params: Any, path: str) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)


def load_params(path: str, like: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(os.path.abspath(path), like)
        return ckptr.restore(os.path.abspath(path))


def cached_convert(convert_fn, src_path: str, cache_dir: str, name: str):
    """Convert once, cache, reload thereafter."""
    cache_path = os.path.join(cache_dir, name)
    if os.path.exists(cache_path):
        return load_params(cache_path)
    params = convert_fn(src_path)
    os.makedirs(cache_dir, exist_ok=True)
    save_params(params, cache_path)
    return params

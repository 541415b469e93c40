"""Checkpoint / resume for sim + game state.

The reference has no state persistence beyond an ImGui layout file and a
player-name file (SURVEY.md §5 "Checkpoint/resume: none").  Here all
runtime state is a pytree (character state, player poses, uniforms,
mesh matrices), so checkpointing falls out naturally: save/restore any
nested dict/list of arrays + scalars to a single .npz, with orbax as the
optional heavyweight backend for long-running benchmark loops.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np


def _flatten(tree: Any, prefix: str, out: Dict[str, np.ndarray],
             meta: Dict[str, Any]) -> None:
    if isinstance(tree, dict):
        meta[prefix + "/__type__"] = "dict"
        meta[prefix + "/__keys__"] = sorted(tree.keys())
        for k in sorted(tree.keys()):
            _flatten(tree[k], f"{prefix}/{k}", out, meta)
    elif isinstance(tree, (list, tuple)):
        meta[prefix + "/__type__"] = ("list" if isinstance(tree, list)
                                      else "tuple")
        meta[prefix + "/__len__"] = len(tree)
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}/{i}", out, meta)
    elif isinstance(tree, (str, type(None))):
        meta[prefix + "/__type__"] = "json"
        meta[prefix + "/__value__"] = tree
    else:
        meta[prefix + "/__type__"] = "array"
        out[prefix] = np.asarray(tree)


def _unflatten(prefix: str, data, meta: Dict[str, Any]) -> Any:
    t = meta[prefix + "/__type__"]
    if t == "dict":
        return {k: _unflatten(f"{prefix}/{k}", data, meta)
                for k in meta[prefix + "/__keys__"]}
    if t in ("list", "tuple"):
        items = [_unflatten(f"{prefix}/{i}", data, meta)
                 for i in range(meta[prefix + "/__len__"])]
        return items if t == "list" else tuple(items)
    if t == "json":
        return meta[prefix + "/__value__"]
    return data[prefix]


def save(path: str, state: Any) -> None:
    """Save a pytree of arrays/scalars/strings to one .npz file."""
    arrays: Dict[str, np.ndarray] = {}
    meta: Dict[str, Any] = {}
    _flatten(state, "root", arrays, meta)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic: a crash never corrupts the checkpoint


def load(path: str) -> Any:
    """Restore the pytree saved by save()."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"]).decode("utf-8"))
        data = {k: z[k] for k in z.files if k != "__meta__"}
    return _unflatten("root", data, meta)


def save_orbax(path: str, state: Any) -> None:
    """Optional orbax backend (async-capable, sharding-aware) for device
    pytrees in long benchmark loops."""
    import orbax.checkpoint as ocp
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), state, force=True)
    ckpt.wait_until_finished()


def load_orbax(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.abspath(path), target=like)

"""Checkpoint save/load with the reference's artifact layout.

The reference saves ``state_dict()`` per model into
``<ckpt>/<experiment>/<iter>/models/{sdf_model.pt, rgb_model.pt,
nerf_hash_model_bg.pt, colorcal_model.pt}`` plus raw occupancy-grid tensors
(``/root/reference/permuto_sdf_py/train_permuto_sdf.py:443-453``,
``models.py:296-307``) and reloads them in ``load_from_checkpoint``
(``permuto_sdf_utils.py:222-237``). We keep the same directory semantics
with true ``.npz`` archives: every pytree leaf is stored as a NumPy array
and the tree structure as a JSON descriptor INSIDE the archive — no pickle,
so loading an untrusted checkpoint cannot execute code. Reconstruction of
dataclass/namedtuple nodes is restricted to classes inside this package.

Unlike the reference (which cannot resume mid-training — no optimizer state
is saved), :func:`save_train_state`/:func:`load_train_state` round-trip the
full training state (params + optimizer moments + grid + counters), and the
trainers call them on every checkpoint save so preempted TPU runs resume
exactly (``--resume`` in the training CLIs).
"""

from __future__ import annotations

import dataclasses
import importlib
import io
import json
import os
from typing import Any

import numpy as np
import jax

# Only classes under these prefixes may be reconstructed from a checkpoint's
# structure descriptor (npz is data-only; this keeps it that way).
_ALLOWED_CLASS_PREFIXES = ("permuto_sdf_tpu.",)


def _class_path(obj) -> str:
    t = type(obj)
    return f"{t.__module__}:{t.__qualname__}"


def _resolve_class(path: str):
    module, _, qual = path.partition(":")
    if not any(module.startswith(p) or module == p.rstrip(".")
               for p in _ALLOWED_CLASS_PREFIXES):
        raise ValueError(
            f"refusing to reconstruct class {path!r} from checkpoint "
            f"(only {_ALLOWED_CLASS_PREFIXES} are allowed)"
        )
    obj = importlib.import_module(module)
    for name in qual.split("."):
        obj = getattr(obj, name)
    return obj


def _flatten(obj, arrays: list) -> dict:
    if obj is None:
        return {"t": "none"}
    if isinstance(obj, dict):
        return {"t": "dict", "k": {str(k): _flatten(v, arrays)
                                   for k, v in obj.items()}}
    if isinstance(obj, tuple) and hasattr(obj, "_fields"):  # NamedTuple
        return {"t": "nt", "cls": _class_path(obj),
                "items": [_flatten(v, arrays) for v in obj]}
    if isinstance(obj, (list, tuple)):
        return {"t": "list" if isinstance(obj, list) else "tuple",
                "items": [_flatten(v, arrays) for v in obj]}
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {"t": "dc", "cls": _class_path(obj),
                "k": {f.name: _flatten(getattr(obj, f.name), arrays)
                      for f in dataclasses.fields(obj)}}
    arrays.append(np.asarray(obj))
    return {"t": "leaf", "i": len(arrays) - 1}


def _rebuild(desc: dict, arrays):
    t = desc["t"]
    if t == "none":
        return None
    if t == "dict":
        return {k: _rebuild(v, arrays) for k, v in desc["k"].items()}
    if t == "list":
        return [_rebuild(v, arrays) for v in desc["items"]]
    if t == "tuple":
        return tuple(_rebuild(v, arrays) for v in desc["items"])
    if t == "nt":
        cls = _resolve_class(desc["cls"])
        return cls(*(_rebuild(v, arrays) for v in desc["items"]))
    if t == "dc":
        cls = _resolve_class(desc["cls"])
        return cls(**{k: _rebuild(v, arrays) for k, v in desc["k"].items()})
    if t == "leaf":
        return arrays[f"a{desc['i']}"]
    raise ValueError(f"unknown checkpoint node type {t!r}")


def save_pytree(path: str, tree: Any):
    arrays: list = []
    desc = _flatten(jax.tree_util.tree_map(np.asarray, tree), arrays)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {f"a{i}": a for i, a in enumerate(arrays)}
    payload["__structure__"] = np.frombuffer(
        json.dumps(desc).encode(), dtype=np.uint8
    )
    # write via a buffer + rename so a preemption mid-write never leaves a
    # truncated archive behind
    buf = io.BytesIO()
    np.savez(buf, **payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def load_pytree(path: str) -> Any:
    with np.load(path, allow_pickle=False) as arrays:
        desc = json.loads(bytes(arrays["__structure__"]).decode())
        return _rebuild(desc, arrays)


def models_dir(ckpt_folder: str, experiment_name: str, iter_nr: int) -> str:
    return os.path.join(ckpt_folder, experiment_name, str(iter_nr), "models")


def save_model(ckpt_folder: str, experiment_name: str, iter_nr: int,
               name: str, params: Any) -> str:
    d = models_dir(ckpt_folder, experiment_name, iter_nr)
    save_pytree(os.path.join(d, name + ".npz"), params)
    return d


def load_model(ckpt_folder_full: str, name: str) -> Any:
    return load_pytree(os.path.join(ckpt_folder_full, name + ".npz"))


def save_train_state(ckpt_folder: str, experiment_name: str, iter_nr: int,
                     state: Any) -> str:
    d = models_dir(ckpt_folder, experiment_name, iter_nr)
    save_pytree(os.path.join(d, "train_state.npz"), state)
    return d


def load_train_state(ckpt_folder_full: str) -> Any:
    return load_pytree(os.path.join(ckpt_folder_full, "train_state.npz"))


def latest_checkpoint_dir(ckpt_folder: str, experiment_name: str):
    """Highest-iteration ``<ckpt>/<exp>/<iter>/models`` dir, or None."""
    base = os.path.join(ckpt_folder, experiment_name)
    if not os.path.isdir(base):
        return None
    iters = sorted(
        (int(n) for n in os.listdir(base) if n.isdigit()
         and os.path.isfile(os.path.join(base, n, "models", "train_state.npz"))),
        reverse=True,
    )
    return os.path.join(base, str(iters[0]), "models") if iters else None

"""Checkpoint save/load with the reference's artifact layout.

The reference saves ``state_dict()`` per model into
``<ckpt>/<experiment>/<iter>/models/{sdf_model.pt, rgb_model.pt,
nerf_hash_model_bg.pt, colorcal_model.pt}`` plus raw occupancy-grid tensors
(``/root/reference/permuto_sdf_py/train_permuto_sdf.py:443-453``,
``models.py:296-307``) and reloads them in ``load_from_checkpoint``
(``permuto_sdf_utils.py:222-237``). We keep the same directory semantics
with ``.npz`` files of flattened pytrees.

Unlike the reference (which cannot resume mid-training — no optimizer state
is saved), :func:`save_train_state` optionally includes optimizer state, so
preempted TPU runs can resume exactly.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import numpy as np
import jax


def _to_numpy(tree: Any):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_pytree(path: str, tree: Any):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(tree), f)


def load_pytree(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def models_dir(ckpt_folder: str, experiment_name: str, iter_nr: int) -> str:
    return os.path.join(ckpt_folder, experiment_name, str(iter_nr), "models")


def save_model(ckpt_folder: str, experiment_name: str, iter_nr: int,
               name: str, params: Any) -> str:
    d = models_dir(ckpt_folder, experiment_name, iter_nr)
    save_pytree(os.path.join(d, name + ".npz.pkl"), params)
    return d


def load_model(ckpt_folder_full: str, name: str) -> Any:
    return load_pytree(os.path.join(ckpt_folder_full, name + ".npz.pkl"))


def save_train_state(ckpt_folder: str, experiment_name: str, iter_nr: int,
                     state: Any) -> str:
    d = models_dir(ckpt_folder, experiment_name, iter_nr)
    save_pytree(os.path.join(d, "train_state.pkl"), state)
    return d


def load_train_state(ckpt_folder_full: str) -> Any:
    return load_pytree(os.path.join(ckpt_folder_full, "train_state.pkl"))

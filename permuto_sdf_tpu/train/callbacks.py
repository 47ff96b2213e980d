"""Training callbacks: phase counters, console/TensorBoard/W&B logging.

Functional equivalent of the reference's callback bus
(``/root/reference/permuto_sdf_py/callbacks/``): ``Phase`` counters
(``phase.py:5-20``), ``StateCallback`` iteration bookkeeping, scalar
logging every N iters (``tensorboard_callback.py:10-28``) and the optional
W&B variant, assembled by a factory keyed off the train params
(``callback_utils.py:12-27``).

JAX pipelines are functional, so callbacks here are plain callables invoked
by the training loops as ``cb(iter_nr, loss, aux, params, grid)``; the
factory returns a list of them.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Optional


@dataclasses.dataclass
class Phase:
    """Iteration/sample counters (phase.py:5-20)."""

    name: str = "train"
    grad: bool = True
    iter_nr: int = 0
    epoch_nr: int = 0
    samples_processed_this_epoch: int = 0


class ConsoleCallback:
    """Loss print every N iters (train_permuto_sdf.py:434-435)."""

    def __init__(self, every: int = 1000):
        self.every = every
        self._t0 = time.perf_counter()

    def __call__(self, iter_nr, loss, aux, params=None, grid=None):
        if iter_nr % self.every == 0:
            extra = " ".join(
                f"{k}={float(v):.5f}" for k, v in (aux or {}).items()
                if hasattr(v, "__float__") or isinstance(v, (int, float))
            )
            print(f"[{time.perf_counter()-self._t0:8.1f}s] iter {iter_nr} "
                  f"loss {float(loss):.6f} {extra}")


class TensorboardCallback:
    """Scalar logging every 500 iters (tensorboard_callback.py:14-27)."""

    def __init__(self, experiment_name: str, logdir: str = "tensorboard_logs",
                 every: int = 500):
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(f"{logdir}/{experiment_name}")
        self.every = every

    def __call__(self, iter_nr, loss, aux, params=None, grid=None):
        if iter_nr % self.every == 0:
            self.writer.add_scalar("train/loss", float(loss), iter_nr)
            for k, v in (aux or {}).items():
                try:
                    self.writer.add_scalar(f"train/{k}", float(v), iter_nr)
                except (TypeError, ValueError):
                    pass

    def add_image(self, tag: str, img, iter_nr: int):
        """img: [H, W, C] float in [0,1] (images every 5000 iters in the
        reference, train_permuto_sdf.py:496-527)."""
        import numpy as np

        self.writer.add_image(tag, np.moveaxis(np.asarray(img), -1, 0), iter_nr)


class WandBCallback:
    def __init__(self, experiment_name: str, project: str = "permuto_sdf_tpu",
                 every: int = 500):
        import wandb  # optional dependency — import error surfaces to caller

        wandb.init(project=project, name=experiment_name)
        self._wandb = wandb
        self.every = every

    def __call__(self, iter_nr, loss, aux, params=None, grid=None):
        if iter_nr % self.every == 0:
            log = {"loss": float(loss)}
            for k, v in (aux or {}).items():
                try:
                    log[k] = float(v)
                except (TypeError, ValueError):
                    pass
            self._wandb.log(log, step=iter_nr)


def create_callbacks(experiment_name: str, with_tensorboard: bool = False,
                     with_wandb: bool = False, console_every: int = 1000):
    """Factory mirroring callback_utils.create_callbacks."""
    cbs: list[Callable] = [ConsoleCallback(console_every)]
    if with_tensorboard:
        cbs.append(TensorboardCallback(experiment_name))
    if with_wandb:
        cbs.append(WandBCallback(experiment_name))
    return cbs

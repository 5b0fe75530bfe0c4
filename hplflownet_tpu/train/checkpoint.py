"""Orbax checkpointing (reference: main_utils.py:54-64, main.py:116-129).

Keeps the reference's policy: save every epoch, keep a periodic copy every
10 epochs, track the best-validation checkpoint.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointIO"]


class CheckpointIO:
    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = osp.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return osp.join(self.ckpt_dir, name)

    def save(self, state: Any, epoch: int, min_loss: float,
             is_best: bool = False, keep_every: int = 10):
        payload = {
            "state": jax.device_get(state),
            "meta": {"epoch": epoch, "min_loss": float(min_loss)},
        }
        self._ckptr.save(self._path("checkpoint"), payload, force=True)
        if epoch % keep_every == 1:
            self._ckptr.save(self._path(f"checkpoint_{epoch}"), payload,
                             force=True)
        if is_best:
            self._ckptr.save(self._path("model_best"), payload, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, template: Any, name: str = "checkpoint"):
        """Restore into the structure of ``template`` (a TrainState pytree).

        Returns (state, epoch, min_loss).
        """
        payload = {
            "state": jax.device_get(template),
            "meta": {"epoch": 0, "min_loss": 0.0},
        }
        out = self._ckptr.restore(self._path(name), payload)
        return out["state"], int(out["meta"]["epoch"]), float(out["meta"]["min_loss"])

    def exists(self, name: str = "checkpoint") -> bool:
        return osp.isdir(self._path(name))

"""Checkpointing (orbax) — params, optimizer state, step, and RNG.

A real resume path, by design absent in the reference (best-params
``state_dict`` save only, no optimizer/RNG state, no load path —
``utils/train.py:197-208``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree checkpoint to ``path`` (overwrites)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, tree)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree checkpoint; ``target`` provides structure/shardings."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target=target)
    return ckptr.restore(path)

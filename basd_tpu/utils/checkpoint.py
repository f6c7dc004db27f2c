"""Orbax checkpointing of the full train state.

Mirrors the reference's three artifact kinds (reference:
``src/training/trainer.py:94-123``):

1. full train-state dirs ``checkpoints/{best_model,latest}`` — here a
   single Orbax StandardCheckpointer save of the optimizer state
   (x, z, v, step, schedule-free scalars) + selector buffers + rngs;
2. sidecar custom state {epoch, best_val_acc, metrics_history} — a JSON
   file inside the checkpoint dir;
3. plain weights files (``best_model.pth`` analogues) — an Orbax save of
   the eval parameters ``x`` only, consumed by ``basd-eval``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.StandardCheckpointer()


def save_state(path: str | Path, state: Any, custom: dict) -> None:
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = _checkpointer()
    ckptr.save(path / "state", state, force=True)
    ckptr.wait_until_finished()
    with open(path / "custom_state.json", "w") as f:
        json.dump(custom, f)


def load_state(path: str | Path, target: Any) -> tuple[Any, dict]:
    path = Path(path).absolute()
    ckptr = _checkpointer()
    state = ckptr.restore(path / "state", target)
    with open(path / "custom_state.json") as f:
        custom = json.load(f)
    return state, custom


def save_weights(path: str | Path, params: Any, epoch: int) -> None:
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = _checkpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    with open(str(path) + ".meta.json", "w") as f:
        json.dump({"epoch": epoch}, f)


def load_weights(path: str | Path, target: Any) -> tuple[Any, int]:
    path = Path(path).absolute()
    params = _checkpointer().restore(path, target)
    meta_path = str(path) + ".meta.json"
    epoch = -1
    if Path(meta_path).exists():
        with open(meta_path) as f:
            epoch = json.load(f).get("epoch", -1)
    return params, epoch

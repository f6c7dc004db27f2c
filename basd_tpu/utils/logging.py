"""Structured logging: key=value lines (the reference's only observability
surface, e.g. ``src/training/trainer.py:191-196``) plus an optional JSONL
metrics stream the reference lacks (SURVEY.md §5 'metrics/observability')."""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any


def log_kv(event: str, **kwargs: Any) -> None:
    """Print a reference-style structured line: ``event k=v k=v``."""
    parts = [event]
    for k, v in kwargs.items():
        if isinstance(v, float):
            parts.append(f"{k}={v:.6g}")
        else:
            parts.append(f"{k}={v}")
    print(" ".join(parts), flush=True)


class MetricsLogger:
    """Append-only JSONL metrics stream (one object per step/epoch)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._t0 = time.time()

    def log(self, kind: str, **metrics: Any) -> None:
        rec = {"kind": kind, "t": round(time.time() - self._t0, 3), **metrics}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

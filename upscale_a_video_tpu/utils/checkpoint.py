"""Checkpoint save/load (Orbax) and per-clip batch-run resume.

The reference has no mid-run resume (SURVEY §5.4); long YouHQ40 batch runs
re-execute everything after a failure. Here:

- ``save_params`` / ``load_params``: Orbax single-item checkpoints of any
  param pytree (used to cache converted torch weights so conversion runs once).
- ``ClipLedger``: a tiny JSON ledger marking completed clips so a batch eval
  resumes exactly where it stopped; deterministic threefry keys make the
  re-execution bit-identical (SURVEY §5.3 rebuild note).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, List, Optional


def save_params(path: str, params: Any) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, template: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, target=template)
    return ckptr.restore(path)


class ClipLedger:
    """Crash-safe record of completed work items."""

    def __init__(self, path: str):
        self.path = path
        self._done = set()
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        self._done.add(json.loads(line)["clip"])

    def is_done(self, clip: str) -> bool:
        return clip in self._done

    def mark_done(self, clip: str, **meta) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps({"clip": clip, **meta}) + "\n")
            f.flush()
            os.fsync(f.fileno())
        self._done.add(clip)

    def pending(self, clips: List[str]) -> List[str]:
        return [c for c in clips if c not in self._done]

"""Analytic FLOP/parameter counting (replaces the reference's thop hooks,
models_video/utils.py:192-215) via jax.

``flops_of`` uses XLA's cost analysis on the compiled computation — exact for
the program actually executed, covering convs, matmuls, and attention."""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import numpy as np


def count_params(params: Any) -> int:
    return sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(params))


def flops_of(fn: Callable, *args, **kwargs) -> Optional[float]:
    """Total FLOPs of ``fn(*args)`` per XLA cost analysis (None if the backend
    does not report it)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        analysis = compiled.cost_analysis()
    except Exception:
        return None
    if isinstance(analysis, list):
        analysis = analysis[0] if analysis else {}
    return float(analysis.get("flops", 0.0)) or None

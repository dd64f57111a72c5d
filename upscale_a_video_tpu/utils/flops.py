"""Parameter / FLOP accounting (ref models_video/utils.py:192-215 thop hooks).

The reference carries thop hooks (``count_flops_attn``, ``count_params``) from
guided-diffusion. The TPU-native replacement does not need per-module hooks:
XLA already knows the exact cost of the compiled program, so we expose

- :func:`count_params` — leaf-sum over a param pytree (ref count_params),
- :func:`attention_flops` — the analytic 2·B·(HW)²·C attention count the
  reference's hook computes (ref utils.py:192-211), kept for parity checks,
- :func:`cost_analysis` — XLA's own FLOP/byte-access estimate for any jitted
  function, the number that actually matches the hardware schedule.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import numpy as np


def count_params(params) -> int:
    """Total number of scalar parameters in a pytree (ref count_params)."""
    return int(sum(np.prod(leaf.shape) if hasattr(leaf, "shape") else 1
                   for leaf in jax.tree_util.tree_leaves(params)))


def attention_flops(batch: int, seq: int, channels: int,
                    heads: Optional[int] = None) -> int:
    """Matmul FLOPs of one (softmax-)attention: 2 · B · S² · C.

    Matches the reference hook's model (ref models_video/utils.py:192-211):
    QK^T and attn·V each cost B·S²·C multiply-adds; head count does not change
    the total. Softmax/scales are excluded, as in the reference.
    """
    del heads
    return 2 * batch * seq * seq * channels


def cost_analysis(fn: Callable, *example_args: Any, **kw) -> dict:
    """XLA's cost model for ``jit(fn)`` on the given example arguments.

    Returns ``{"flops": float, "bytes_accessed": float, "params": ...}``-style
    entries as reported by the compiled executable — the authoritative count
    for MXU-utilization estimates (bench.py's speed-of-light math).
    """
    lowered = jax.jit(fn).lower(*example_args, **kw)
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns one dict per device
        ca = ca[0] if ca else {}
    return dict(ca or {})


def flops_of(fn: Callable, *args, **kwargs) -> Optional[float]:
    """Total FLOPs of ``fn(*args)`` per XLA cost analysis (None if the
    backend does not report it)."""
    try:
        ca = cost_analysis(fn, *args, **kwargs)
    except Exception:
        return None
    return float(ca.get("flops", 0.0)) or None


def format_count(n: float) -> str:
    """Human-readable count (1.23 G, 45.6 M, ...)."""
    for unit, div in (("T", 1e12), ("G", 1e9), ("M", 1e6), ("K", 1e3)):
        if abs(n) >= div:
            return f"{n / div:.2f} {unit}"
    return f"{n:.0f}"

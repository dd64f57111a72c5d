"""T5-style relative position bucketing for temporal attention bias.

Matches ``RelativePositionBias._relative_position_bucket`` in the reference
(attention.py:747-765, duplicated at unet_video.py:70-88): bidirectional
buckets, half for sign, half split between exact small offsets and
log-spaced large offsets. The bucket table for a given frame count is static,
so we compute it in numpy — it bakes into the jitted program as a constant
gather index.
"""

from __future__ import annotations

import numpy as np


def relative_position_buckets(n: int, num_buckets: int = 32, max_distance: int = 128) -> np.ndarray:
    """(n, n) int32 bucket ids for query i, key j with rel = j - i."""
    q = np.arange(n)
    k = np.arange(n)
    rel = k[None, :] - q[:, None]  # (i, j): j - i
    # The reference negates: n = -relative_position  (attention.py:750)
    neg = -rel
    nb = num_buckets // 2
    ret = (neg < 0).astype(np.int64) * nb
    mag = np.abs(neg)
    max_exact = nb // 2
    is_small = mag < max_exact
    # log-spaced buckets for large distances; guard log(0)
    safe = np.maximum(mag, 1)
    val_if_large = max_exact + (
        np.log(safe.astype(np.float64) / max_exact) / np.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, nb - 1)
    ret = ret + np.where(is_small, mag, val_if_large)
    return ret.astype(np.int32)

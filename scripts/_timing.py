"""Chained timing for TPU micro-benches through the axon tunnel.

Unchained rep loops (N independent dispatches + one readback of the last
output) can report *impossibly fast* times through the tunnel — runs were
observed at 2x the chip's measured matmul peak, consistent with unconsumed
executions being elided. The fix: make rep i+1 consume rep i's output, so
every execution is on the data path to the final readback.

``step_fn`` must map x -> array of the same shape/dtype (wrap your op with a
residual-style feedback); compile+warmup happens on the first call.
"""

import time

import numpy as np


def timed_chained(name, step_fn, x0, reps=20, verbose=True):
    out = step_fn(x0)
    np.asarray(out[(0,) * out.ndim])  # compile + warm (readback forces done)
    cur = x0
    t0 = time.time()
    for _ in range(reps):
        cur = step_fn(cur)
    np.asarray(cur[(0,) * cur.ndim])
    dt = (time.time() - t0) / reps * 1e3
    if verbose:
        print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt

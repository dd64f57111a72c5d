"""Data-parallel optical flow over the mesh.

The reference computes RAFT flow in a serial width-dependent clip loop
(`/root/reference/models_video/RAFT/raft_bi.py:71-104`) purely to bound GPU
memory; the frame pairs are independent work items. Here all 2·(T-1)
directed pairs become one batch whose leading axis is sharded over the mesh
(the same axis the window-sharded denoise uses), so N chips each run
(T-1)/N RAFT forward passes — no collectives beyond the output gather XLA
inserts. The pair batch is zero-padded up to a multiple of the device count
(padded rows compute flow of black frames and are sliced off), keeping the
program shape static for any T.

Serial equivalence: the batched pair formulation is exactly
``models.raft.compute_flow_pair``, which `compute_bidirectional_flows`'s
clip loop reproduces (tests/test_raft.py); the sharded variant is checked
against the serial one in tests/test_sharded_flow.py and the multi-chip
dryrun.
"""

from __future__ import annotations

from math import ceil
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.raft import RaftRunner, resize_flow
from ..ops.resize import resize_2d


def build_sharded_flows(runner: RaftRunner, mesh: Mesh, axis: str = "win"):
    """Returns ``flows(frames) -> (fwd, bwd)`` with frames (B, T, H, W, 3)
    in [-1, 1] and flows (B, T-1, H, W, 2), the contract of
    ``compute_bidirectional_flows`` (ref raft_bi.py:47-104)."""
    n_dev = mesh.shape[axis]
    pair_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    jfn = jax.jit(
        lambda params, i1, i2: runner.model.apply(params, i1, i2, runner.iters),
        in_shardings=(repl, pair_sharding, pair_sharding),
        out_shardings=pair_sharding,
    )

    def flows(frames: jax.Array) -> Tuple[jax.Array, jax.Array]:
        b, t, h, w, _ = frames.shape
        h8 = int(ceil(h / 8) * 8)
        w8 = int(ceil(w / 8) * 8)
        f = (resize_2d(frames, (h8, w8), "bilinear")
             if (h8, w8) != (h, w) else frames)
        f1 = f[:, :-1].reshape(b * (t - 1), h8, w8, 3)
        f2 = f[:, 1:].reshape(b * (t - 1), h8, w8, 3)
        # both directions in ONE sharded batch: rows [fwd pairs, bwd pairs]
        src = jnp.concatenate([f1, f2], axis=0)
        dst = jnp.concatenate([f2, f1], axis=0)
        rows = src.shape[0]
        pad = (-rows) % n_dev
        if pad:
            src = jnp.concatenate([src, jnp.zeros((pad,) + src.shape[1:],
                                                  src.dtype)])
            dst = jnp.concatenate([dst, jnp.zeros((pad,) + dst.shape[1:],
                                                  dst.dtype)])
        out = jfn(runner.params,
                  jax.device_put(src, pair_sharding),
                  jax.device_put(dst, pair_sharding))[:rows]
        fwd, bwd = out[: rows // 2], out[rows // 2:]
        if (h8, w8) != (h, w):
            fwd = resize_flow(fwd, h, w)
            bwd = resize_flow(bwd, h, w)
        return (fwd.reshape(b, t - 1, h, w, 2),
                bwd.reshape(b, t - 1, h, w, 2))

    return flows

"""A/B the ×2-upsample+3×3-conv emission at the fp32 decoder's hot stage
(640²→1280², 256ch, 3 frames): time + compiled HBM for each candidate.

Candidates:
  naive    — materialize nearest-×2, 3×3 SAME conv (36 MACs/px)
  folded   — 2×2 conv with 4·Co channels + stack/transpose interleave (16)
  perframe — folded, one frame at a time under lax.map
  dilated  — transposed conv: lhs_dilation=2, folded 4×4 kernel (16, no
             interleave, output written directly)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import os as _os
if _os.environ.get("UAV_AB_SHAPE"):
    N, H, W, CI, CO = (int(v) for v in _os.environ["UAV_AB_SHAPE"].split(","))
else:
    N, H, W, CI, CO = 2, 640, 640, 256, 256
if _os.environ.get("UAV_AB_BF16"):
    pass
DT = jnp.bfloat16 if _os.environ.get("UAV_AB_BF16") else jnp.float32


def make_inputs(key=0):
    kx, kk, kb = jax.random.split(jax.random.PRNGKey(key), 3)
    x = jax.random.normal(kx, (N, H, W, CI), DT)
    k = jax.random.normal(kk, (3, 3, CI, CO), jnp.float32) * 0.02
    b = jax.random.normal(kb, (CO,), jnp.float32)
    return x, k, b


def naive(x, k, b):
    up = jnp.broadcast_to(x[:, :, None, :, None, :], (N, H, 2, W, 2, CI)
                          ).reshape(N, 2 * H, 2 * W, CI)
    y = jax.lax.conv_general_dilated(up, k.astype(DT), (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(DT)


def _fold(k):
    r_even = jnp.stack([k[0], k[1] + k[2]], 0)
    r_odd = jnp.stack([k[0] + k[1], k[2]], 0)

    def fold_cols(kr):
        return (jnp.stack([kr[:, 0], kr[:, 1] + kr[:, 2]], 1),
                jnp.stack([kr[:, 0] + kr[:, 1], kr[:, 2]], 1))

    ee, eo = fold_cols(r_even)
    oe, oo = fold_cols(r_odd)
    return jnp.concatenate([ee, eo, oe, oo], -1)  # (2,2,CI,4CO)


def _folded_one(xf, wbig, b, h, w):
    xpad = jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(xpad, wbig, (1, 1), "VALID",
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
    o = CO
    parts = [y[:, 0:h, 0:w, 0:o], y[:, 0:h, 1:w + 1, o:2 * o],
             y[:, 1:h + 1, 0:w, 2 * o:3 * o],
             y[:, 1:h + 1, 1:w + 1, 3 * o:4 * o]]
    z = jnp.stack(parts, axis=3).reshape(xf.shape[0], h, w, 2, 2, o)
    z = z.transpose(0, 1, 3, 2, 4, 5).reshape(xf.shape[0], 2 * h, 2 * w, o)
    return z + b.astype(DT)


def folded(x, k, b):
    return _folded_one(x, _fold(k).astype(DT), b, H, W)


def perframe(x, k, b):
    wbig = _fold(k).astype(DT)
    return jax.lax.map(lambda xf: _folded_one(xf[None], wbig, b, H, W)[0], x)


def _dilated_kernel(k):
    # cross-correlation with lhs_dilation=2, pad (2,2):
    #   out[i] = Σ_a d[i+a-2]·W4[a],  d[2j]=in[j]
    #   i=2m   → a∈{0,2}: W4[0]=K0,    W4[2]=K1+K2
    #   i=2m+1 → a∈{1,3}: W4[1]=K0+K1, W4[3]=K2
    def taps(kd):  # kd indexed [0..2] along one spatial dim
        return [kd[0], kd[0] + kd[1], kd[1] + kd[2], kd[2]]

    rows = taps(k)                                   # 4 × (3, CI, CO)
    k4 = jnp.stack([jnp.stack(taps(r), 0) for r in rows], 0)  # (4,4,CI,CO)
    return k4


def dilated(x, k, b):
    k4 = _dilated_kernel(k).astype(DT)
    y = jax.lax.conv_general_dilated(
        x, k4, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert y.shape == (x.shape[0], 2 * x.shape[1], 2 * x.shape[2], CO), y.shape
    return y + b.astype(DT)


def run(name, fn):
    x, k, b = make_inputs()
    j = jax.jit(fn)
    lowered = j.lower(x, k, b)
    comp = lowered.compile()
    ma = comp.memory_analysis()
    out = comp(x, k, b)
    np.asarray(out[0, 0, 0])
    t0 = time.time()
    for _ in range(5):
        out = comp(x, k, b)
    np.asarray(out[0, 0, 0])
    dt = (time.time() - t0) / 5
    print(f"{name:9s} {dt * 1e3:8.1f} ms   temp {ma.temp_size_in_bytes / 2**30:6.2f} GiB")
    return out


def main():
    ref = np.asarray(run("naive", naive)[:, :8, :8, :4])
    for name, fn in [("folded", folded), ("perframe", perframe),
                     ("dilated", dilated)]:
        out = np.asarray(run(name, fn)[:, :8, :8, :4])
        err = float(np.max(np.abs(out - ref)))
        print(f"  max|Δ| vs naive (corner): {err:.2e}")


if __name__ == "__main__":
    main()

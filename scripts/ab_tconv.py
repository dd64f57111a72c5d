"""A/B the (5,1,1) temporal conv at L0 shapes (2,8,256,256,256):
nn.Conv NDHWC vs an unfold→matmul formulation."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

import jax.numpy as jnp
import numpy as np

REPS = 20
B, T, HW, C = 2, 8, 256, 256
K = 5


def timed(name, fn, *args):
    out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    print(f"{name:46s} {(time.time() - t0) / REPS * 1e3:8.2f} ms", flush=True)
    return out


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, HW, HW, C), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, 1, 1, C, C),
                          jnp.float32) * 0.02

    def conv_native(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1, 1),
            [((K - 1) // 2, (K - 1) // 2), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def conv_matmul(x, w):
        # unfold T taps with static shifts → one (rows, K·C) @ (K·C, C)
        pad = (K - 1) // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
        taps = [xp[:, i:i + T] for i in range(K)]           # K × (B,T,H,W,C)
        xk = jnp.concatenate(taps, axis=-1)                 # (B,T,H,W,K·C)
        wk = w.astype(x.dtype).reshape(K * C, C)
        return jax.lax.dot_general(
            xk, wk, (((4,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)

    a = timed("native NDHWC conv (5,1,1)", jax.jit(conv_native), x, w)
    b = timed("unfold->matmul", jax.jit(conv_matmul), x, w)
    print("maxdiff", float(np.max(np.abs(
        np.asarray(a[:, :, :4, :4], np.float32)
        - np.asarray(b[:, :, :4, :4], np.float32)))))


if __name__ == "__main__":
    main()



def extra():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, HW, HW, C), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, 1, 1, C, C), jnp.float32) * 0.02

    def conv2d_folded(x, w):
        xf = x.reshape(B, T, HW * HW, C)
        wf = w.astype(x.dtype).reshape(K, 1, C, C)
        out = jax.lax.conv_general_dilated(
            xf, wf, (1, 1), [((K - 1) // 2, (K - 1) // 2), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out.reshape(B, T, HW, HW, C)

    def conv1d_rows(x, w):
        # put T minor-adjacent: (B,H,W,T,C) then conv over T as last spatial
        xt = x.transpose(0, 2, 3, 1, 4).reshape(B, HW * HW, T, C)
        wf = w.astype(x.dtype).reshape(K, 1, C, C).transpose(1, 0, 2, 3)
        out = jax.lax.conv_general_dilated(
            xt, wf, (1, 1), [(0, 0), ((K - 1) // 2, (K - 1) // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out.reshape(B, HW, HW, T, C).transpose(0, 3, 1, 2, 4)

    timed("conv2d folded (T, HW2)", jax.jit(conv2d_folded), x, w)
    timed("conv1d rows (HW2, T)", jax.jit(conv1d_rows), x, w)


extra()


def extra2():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, HW, HW, C), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, 1, 1, C, C), jnp.float32) * 0.02

    def conv_shifted_gemms(x, w):
        wk = w.astype(x.dtype)  # (K,1,1,C,C)
        pad = (K - 1) // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
        out = None
        for i in range(K):
            tap = jax.lax.dot_general(
                xp[:, i:i + T], wk[i, 0, 0],
                (((4,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out = tap if out is None else out + tap
        return out.astype(x.dtype)

    a = timed("5 shifted GEMMs", jax.jit(conv_shifted_gemms), x, w)

    def conv_native2(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1, 1),
            [((K - 1) // 2, (K - 1) // 2), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    b = timed("native again", jax.jit(conv_native2), x, w)
    print("maxdiff", float(np.max(np.abs(
        np.asarray(a[:, :, :4, :4], np.float32)
        - np.asarray(b[:, :, :4, :4], np.float32)))))


extra2()

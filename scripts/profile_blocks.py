"""Per-block TPU micro-bench for the released-config UNet at 256 input.

Times each level's building blocks standalone (resblocks, transformers,
temporal modules, VAE decoder blocks) with the exact shapes the e2e bench
produces, to locate where the 1.09 s/step goes. Timings force a scalar
readback (block_until_ready is unreliable through the axon tunnel).
"""

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

from upscale_a_video_tpu.config import UNetVideoConfig
from upscale_a_video_tpu.nn.blocks import ResnetBlock3D
from upscale_a_video_tpu.nn.attention import Transformer3DModel
from upscale_a_video_tpu.nn.temporal import TemporalModule3D

CFG = UNetVideoConfig.from_json("/root/reference/configs/unet_video_config.json")
B, T = 2, 8
SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def timed(name, module, *args, reps=8, method=None):
    """CHAINED timing: rep i+1 consumes rep i's output (module output must
    have the input's shape, true for all blocks here). Unchained rep loops
    can report impossibly fast times through the axon tunnel — unconsumed
    executions appear to be elided (see scripts/_timing.py)."""
    import gc

    def scalar(o):
        o = o[0] if isinstance(o, tuple) else o
        return np.asarray(o[(0,) * o.ndim])  # 1-element device slice readback

    params = out = None
    try:
        params = jax.jit(module.init)(jax.random.PRNGKey(0), *args)
        fn = jax.jit(lambda p, *a: module.apply(p, *a))
        scalar(fn(params, *args))
        cur = args[0]
        t0 = time.time()
        for _ in range(reps):
            cur = fn(params, cur, *args[1:])
            if isinstance(cur, tuple):
                cur = cur[0]
        scalar(cur)
        dt = (time.time() - t0) / reps * 1e3
        print(f"{name:55s} {dt:8.1f} ms", flush=True)
        out = cur
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:55s} FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
        return 0.0
    finally:
        del params, out  # free HBM before the next block
        gc.collect()


def main():
    dt = jnp.bfloat16
    boc = CFG.block_out_channels
    temb = jnp.zeros((B,), jnp.float32)
    emb = jnp.zeros((B, boc[0] * 4), dt)
    ctx = jnp.zeros((B, 77, CFG.cross_attention_dim), dt)
    total = 0.0
    print(f"config boc={boc} heads_dim={CFG.attention_head_dim} "
          f"down={CFG.down_block_types}")

    for lvl in range(4):
        hw = SIZE // (2 ** lvl)
        ch = boc[lvl]
        x = jnp.zeros((B, T, hw, hw, ch), dt)
        n_res = CFG.layers_per_block
        ms = timed(f"L{lvl} ResnetBlock3D {hw}x{hw} c{ch}",
                   ResnetBlock3D(in_channels=ch, out_channels=ch,
                                 temb_channels=boc[0] * 4, groups=32,
                                 dtype=dt), x, emb)
        total += ms * (n_res * 2 + (1 if lvl else 0))  # down+up levels reuse

        if CFG.down_block_types[lvl] == "CrossAttnDownBlock3D":
            tr = Transformer3DModel(
                heads=CFG.attention_head_dim,
                dim_head=ch // CFG.attention_head_dim,
                in_channels=ch,
                cross_attention_dim=CFG.cross_attention_dim,
                only_cross_attention=CFG.only_cross_attention[lvl],
                use_linear_projection=CFG.use_linear_projection,
                norm_num_groups=min(32, CFG.norm_num_groups), dtype=dt)
            ms = timed(f"L{lvl} Transformer3D {hw}x{hw} c{ch} "
                       f"(only_cross={CFG.only_cross_attention[lvl]})",
                       tr, x, ctx)
            total += ms * (n_res * 2 + 1)

        if lvl in CFG.down_temporal_idx:
            tm = TemporalModule3D(in_channels=ch, temb_channels=boc[0] * 4,
                                  groups=32, dtype=dt)
            ms = timed(f"L{lvl} TemporalModule3D {hw}x{hw} c{ch}", tm, x, emb)
            total += ms * 2

    print(f"--- rough weighted total ≈ {total:.0f} ms vs measured 1091 ms")


if __name__ == "__main__":
    main()

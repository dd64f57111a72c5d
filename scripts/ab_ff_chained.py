import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import jax.numpy as jnp
from _timing import timed_chained
from upscale_a_video_tpu.ops.fused_feedforward import _reference, fused_feedforward

def run(bt, s, c):
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (bt, s, c), jnp.bfloat16)
    lns = 1 + 0.1*jax.random.normal(ks[1], (c,)); lnb = 0.1*jax.random.normal(ks[2], (c,))
    w1 = 0.03*jax.random.normal(ks[3], (c, 8*c)); b1 = 0.05*jax.random.normal(ks[4], (8*c,))
    w2 = 0.03*jax.random.normal(ks[5], (4*c, c)); b2 = 0.05*jax.random.normal(ks[6], (c,))
    fused = jax.jit(lambda x: x + fused_feedforward(x, lns, lnb, w1, b1, w2, b2, use_pallas=True))
    ref = jax.jit(lambda x: x + _reference(x, lns, lnb, w1, b1, w2, b2, 1e-5))
    timed_chained(f"ff fused BT{bt} S{s} c{c}", fused, x)
    timed_chained(f"ff xla   BT{bt} S{s} c{c}", ref, x)

run(16, 16384, 512)
run(16, 4096, 512)
run(16, 1024, 1024)

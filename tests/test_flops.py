"""utils/flops.py: param counting, analytic attention FLOPs, XLA cost model."""

import jax
import jax.numpy as jnp
import numpy as np

from upscale_a_video_tpu.utils.flops import (
    attention_flops,
    cost_analysis,
    count_params,
    format_count,
)


def test_count_params():
    tree = {"a": jnp.ones((3, 4)), "b": {"c": jnp.ones((5,)), "d": jnp.ones(())}}
    assert count_params(tree) == 12 + 5 + 1


def test_attention_flops():
    # 2 * B * S^2 * C, head-count independent (ref models_video/utils.py model)
    assert attention_flops(2, 64, 32) == 2 * 2 * 64 * 64 * 32
    assert attention_flops(2, 64, 32, heads=8) == attention_flops(2, 64, 32)


def test_cost_analysis_matmul():
    a = jnp.ones((64, 128), jnp.float32)
    b = jnp.ones((128, 256), jnp.float32)
    ca = cost_analysis(lambda x, y: x @ y, a, b)
    if "flops" not in ca:  # backend without a cost model: nothing to assert
        return
    want = 2 * 64 * 128 * 256
    assert 0.4 * want <= float(ca["flops"]) <= 2.5 * want


def test_format_count():
    assert format_count(1.5e9) == "1.50 G"
    assert format_count(2_000) == "2.00 K"
    assert format_count(12) == "12"

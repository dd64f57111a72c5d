"""Int8 weight-only quantization (SURVEY §2.11 N8 — bitsandbytes parity).

The reference optionally loads LLaVA with bitsandbytes 8-bit weights
(ref llava/model/builder.py:29-38; CLI ``--load_8bit_llava`` in
ref inference_upscale_a_video.py). The TPU-native equivalent implemented here
is per-channel symmetric int8 *storage*: quantized weights live in HBM as
``int8 values + fp32 scales`` and are dequantized **inside** the jitted
program, where XLA fuses the int8→bf16 multiply into the consuming matmul's
operand read. Each weight crosses HBM at half (vs bf16) or a quarter (vs fp32)
of the bytes — the win on a bandwidth-bound decode loop — while the matmul
math itself stays bf16 on the MXU. Weight-only means activations are
untouched, so no calibration data is needed (same property bitsandbytes'
LLM.int8() relies on for its fp16 outlier path).

Usage:
    qtree = quantize_tree(params)              # host- or device-side, once
    def fn(qtree, x):
        params = dequantize_tree(qtree, jnp.bfloat16)   # inside jit
        return model.apply(params, x)

``QuantizedTensor`` is a registered pytree, so quantized trees pass through
``jax.jit`` / ``jax.device_put`` / orbax like ordinary param trees.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class QuantizedTensor:
    """Per-channel symmetric int8 weight: ``values * scale`` ≈ original.

    ``scale`` keeps the original rank (reduced axes are size-1) so
    dequantization is a plain broadcast multiply.
    """

    def __init__(self, values, scale):
        self.values = values
        self.scale = scale

    @property
    def shape(self):
        return self.values.shape

    @property
    def dtype(self):  # what dequantization yields by default
        return self.scale.dtype

    @property
    def ndim(self):
        return self.values.ndim

    @property
    def size(self):
        return self.values.size

    def tree_flatten(self):
        return (self.values, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)

    def __repr__(self):
        return (f"QuantizedTensor(shape={tuple(self.values.shape)}, "
                f"scale_shape={tuple(self.scale.shape)})")


def quantize(w, axis: int = -1) -> QuantizedTensor:
    """Symmetric per-channel int8 quantization along ``axis``.

    ``axis`` is the axis that KEEPS independent scales (the output-feature
    axis: last for flax Dense/Conv kernels). All other axes are reduced.
    """
    w = jnp.asarray(w, jnp.float32)
    axis = axis % w.ndim
    reduce_axes = tuple(a for a in range(w.ndim) if a != axis)
    amax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QuantizedTensor(q, scale)


def dequantize(q: QuantizedTensor, dtype=jnp.float32):
    return q.values.astype(dtype) * q.scale.astype(dtype)


def _default_should_quantize(path: str, leaf) -> bool:
    """Quantize big matmul weights; keep norms/biases/embeddings exact.

    Mirrors bitsandbytes' scope (nn.Linear only): ≥2-D, reasonably large, and
    not an embedding / normalization / positional table.
    """
    if getattr(leaf, "ndim", 0) < 2 or getattr(leaf, "size", 0) < 16384:
        return False
    lname = path.lower()
    skip = ("embed", "norm", "position", "relative_attention_bias", "logit")
    return not any(s in lname for s in skip)


def quantize_tree(
    params,
    should_quantize: Optional[Callable[[str, Any], bool]] = None,
    axis: int = -1,
):
    """Quantize selected leaves of a param tree to int8.

    ``should_quantize(path, leaf)`` decides per-leaf; the default takes
    large ≥2-D weights and skips embeddings/norms. Returns a tree of the same
    structure with chosen leaves replaced by :class:`QuantizedTensor`.
    """
    pred = should_quantize or _default_should_quantize

    def visit(path, leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        if pred(name, leaf):
            return quantize(leaf, axis=axis)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)


def dequantize_tree(tree, dtype=None):
    """Inverse of :func:`quantize_tree`; call INSIDE jit so XLA fuses the
    int8→float multiply into each consumer. Non-quantized leaves pass through
    (cast to ``dtype`` only if they are float and ``dtype`` is given)."""

    def visit(leaf):
        if isinstance(leaf, QuantizedTensor):
            return dequantize(leaf, dtype or leaf.dtype)
        if dtype is not None and jnp.issubdtype(
                jnp.asarray(leaf).dtype, jnp.floating):
            return jnp.asarray(leaf, dtype)
        return leaf

    return jax.tree_util.tree_map(
        visit, tree, is_leaf=lambda x: isinstance(x, QuantizedTensor))


def tree_nbytes(tree) -> int:
    """Total storage bytes of a (possibly quantized) tree.

    QuantizedTensor flattens to its int8 values + fp32 scales, so summing
    over flat leaves accounts for quantized storage automatically."""
    return sum(leaf.size * jnp.dtype(leaf.dtype).itemsize
               for leaf in jax.tree_util.tree_leaves(tree))

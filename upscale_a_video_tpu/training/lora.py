"""LoRA adapters (ref llava/train/train.py:100-106 ``lora_enable`` — the
reference finetunes its LLaVA captioner with PEFT LoRA; rebuilt here as pure
param-tree transforms so any flax model in this framework can be adapted
without touching module code).

Weight-space formulation: for every targeted 2-D kernel ``W (in, out)`` keep
``A (in, r)`` (Gaussian init) and ``B (r, out)`` (zero init — the adapted
model starts exactly at the base model, the standard LoRA identity-at-init
property) and run the model with ``W' = W + (alpha/r)·A@B``. Under ``jit``
the merge is one rank-r matmul per target per step; gradients flow to A/B
only (the base tree is a constant of the loss), which is the JAX-native
equivalent of PEFT's frozen-base parametrization.

``merge_lora`` bakes adapters into the base weights for serving —
the reference's ``merge_lora_weights.py`` / ``get_peft_state`` save path.
"""

from __future__ import annotations

import re
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

DEFAULT_TARGETS = (
    # LLaMA attention + MLP projections (PEFT's default target_modules for
    # llama plus the reference's mm_projector option) and MPT's fused Wqkv
    r".*(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|down_proj|Wqkv|"
    r"out_proj|mm_projector.*)/kernel$"
)


def _match(path: Tuple[str, ...], pattern: str) -> bool:
    return re.match(pattern, "/".join(path)) is not None


def init_lora(params, rank: int = 8, *, targets: str = DEFAULT_TARGETS,
              seed: int = 0, stddev: float = 0.01):
    """Build a LoRA tree shaped like ``params`` with ``{"a","b"}`` leaves at
    every targeted 2-D kernel and ``None`` elsewhere."""
    key = jax.random.PRNGKey(seed)

    def build(tree, path=()):
        if isinstance(tree, dict):
            return {k: build(v, path + (k,)) for k, v in tree.items()}
        if tree.ndim == 2 and _match(path, targets):
            nonlocal key
            key, sub = jax.random.split(key)
            fan_in, fan_out = tree.shape
            return {
                "a": jax.random.normal(sub, (fan_in, rank),
                                       jnp.float32) * stddev,
                "b": jnp.zeros((rank, fan_out), jnp.float32),
            }
        return None

    return build(params)


def _is_adapter(node) -> bool:
    return isinstance(node, dict) and set(node) == {"a", "b"}


def apply_lora(params, lora, alpha: float = 16.0):
    """Return the adapted param tree ``W + (alpha/r)·A@B`` (base unchanged)."""

    def walk(p, l):
        if l is None:
            return p
        if _is_adapter(l):
            scale = alpha / l["a"].shape[1]
            delta = (l["a"] @ l["b"]) * scale
            return p + delta.astype(p.dtype)
        return {k: walk(p[k], l.get(k)) for k in p} if isinstance(p, dict) else p

    return walk(params, lora)


def merge_lora(params, lora, alpha: float = 16.0):
    """Bake adapters into the base weights (serving-time merge; ref LLaVA's
    LoRA-merge save path). Identical outputs to :func:`apply_lora`."""
    return apply_lora(params, lora, alpha)


def num_lora_params(lora) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(lora))


def make_lora_train_step(loss_fn: Callable, optimizer, alpha: float = 16.0):
    """``loss_fn(adapted_params, batch, key) -> scalar``; returns a jittable
    ``step(base_params, lora, opt_state, batch, key)`` updating ONLY the
    adapters (base params are a closed-over constant of the grad)."""

    def step(base_params, lora, opt_state, batch, key):
        def loss_of_lora(l):
            return loss_fn(apply_lora(base_params, lora=l, alpha=alpha),
                           batch, key)

        loss, grads = jax.value_and_grad(loss_of_lora)(lora)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return step

"""Textual-inversion loading (ref: ``VideoUpscalePipeline`` inherits
diffusers' ``TextualInversionLoaderMixin``, pipeline_upscale_a_video.py:61).

A textual-inversion checkpoint maps one or more placeholder tokens (e.g.
``<concept>``) to learned embedding vectors in the text encoder's input
space. Loading it means (a) registering each placeholder in the tokenizer so
prompts tokenize it to fresh ids, and (b) appending the learned rows to the
CLIP token-embedding table. Both checkpoint schemas diffusers accepts are
supported:

- diffusers-native: ``{token: tensor(dim) | tensor(n, dim)}``
- original A1111/SD: ``{"string_to_param": {"*": tensor(n, dim)},
  "name": token}``

Multi-vector concepts expand to ``token, token_1, ..`` exactly as diffusers
does, so downstream prompts behave identically.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np


def parse_textual_inversion(state: Dict[str, Any], token: str = None):
    """Checkpoint dict → list of (token_string, (n_vectors, dim) ndarray)."""
    def to_np(t):
        try:  # torch tensor
            t = t.detach().cpu().float().numpy()
        except AttributeError:
            t = np.asarray(t, np.float32)
        return t.reshape(1, -1) if t.ndim == 1 else t

    if "string_to_param" in state:  # A1111 schema
        emb = to_np(next(iter(state["string_to_param"].values())))
        name = token or state.get("name", "<concept>")
        return [(name, emb)]
    entries = []
    for k, v in state.items():
        if k in ("name", "step", "sd_checkpoint", "sd_checkpoint_name"):
            continue
        entries.append((token or k, to_np(v)))
    if not entries:
        raise ValueError("no embeddings found in textual-inversion checkpoint")
    return entries


def _expand_multi(entries) -> List[Tuple[str, str, np.ndarray]]:
    """(tok, (n, d)) → n single-vector (part_token, base_token, vec) rows:
    tok, tok_1, ... (diffusers TextualInversionLoaderMixin
    .maybe_convert_prompt convention)."""
    flat = []
    for tok, emb in entries:
        for i in range(emb.shape[0]):
            flat.append((tok if i == 0 else f"{tok}_{i}", tok, emb[i]))
    return flat


class TextualInversionTokenizer:
    """Wraps any ``prompts -> (B, 77) ids`` tokenizer with placeholder-token
    support: placeholders are replaced by reserved high ids before the base
    tokenizer runs (HF CLIPTokenizer path uses add_tokens natively)."""

    def __init__(self, base, vocab_size: int):
        self.base = base
        self.vocab_size = vocab_size
        self.tokens: Dict[str, int] = {}
        # base placeholder -> ordered part tokens (incl. the base itself);
        # kept explicitly so placeholders containing '_' expand correctly
        # instead of being reverse-engineered from token names
        self.groups: Dict[str, List[str]] = {}
        self._hf = getattr(base, "tok", None)  # HFTokenizerAdapter

    def add_token(self, token: str, group: str = None) -> int:
        """Register ``token``; ``group`` names the base placeholder this
        token is a multi-vector part of (defaults to itself)."""
        if token not in self.tokens:
            new_id = self.vocab_size + len(self.tokens)
            self.tokens[token] = new_id
            if self._hf is not None:
                self._hf.add_tokens([token])
                # HF assigns len(tokenizer)-1; keep our table in sync with it
                self.tokens[token] = self._hf.convert_tokens_to_ids(token)
        base = group if group is not None else token
        parts = self.groups.setdefault(base, [])
        if token not in parts:
            parts.append(token)
        return self.tokens[token]

    def expand_prompt(self, prompt: str) -> str:
        """Multi-vector expansion: '<c>' -> '<c> <c>_1 ...' when present."""
        for base in sorted(self.groups, key=len, reverse=True):
            if base in prompt:
                prompt = prompt.replace(base, " ".join(self.groups[base]))
        return prompt

    def __call__(self, prompts):
        prompts = [self.expand_prompt(p) for p in prompts]
        if self._hf is None and any(
                t in p for p in prompts for t in self.tokens):
            raise ValueError(
                "textual-inversion placeholders require the HF CLIPTokenizer "
                "(loader.HFTokenizerAdapter); the fallback tokenizer cannot "
                "map them to ids")
        return self.base(prompts)


def load_textual_inversion(pipeline, state: Dict[str, Any], token: str = None):
    """Load a textual-inversion checkpoint into a pipeline in place:
    extends the tokenizer and appends rows to the CLIP token embedding.
    Returns the list of registered token strings."""
    entries = _expand_multi(parse_textual_inversion(state, token))

    params = pipeline.m.text_params
    emb_path = params["params"]["token_embedding"]["embedding"]
    vocab, dim = emb_path.shape
    if entries[0][2].shape[-1] != dim:
        raise ValueError(
            f"embedding dim {entries[0][2].shape[-1]} != text encoder {dim}")

    if not isinstance(pipeline.m.tokenizer, TextualInversionTokenizer):
        pipeline.m.tokenizer = TextualInversionTokenizer(
            pipeline.m.tokenizer, vocab)
    tok = pipeline.m.tokenizer

    rows = []
    names = []
    for name, base, vec in entries:
        tid = tok.add_token(name, group=base)
        rows.append((tid, vec))
        names.append(name)

    new_vocab = max(tid for tid, _ in rows) + 1
    if new_vocab > vocab:
        pad = jnp.zeros((new_vocab - vocab, dim), emb_path.dtype)
        emb_path = jnp.concatenate([emb_path, pad], axis=0)
    for tid, vec in rows:
        emb_path = emb_path.at[tid].set(jnp.asarray(vec, emb_path.dtype))

    params["params"]["token_embedding"]["embedding"] = emb_path
    pipeline.m.text_params = params

    # grow the model's declared vocab (flax validates param shapes at apply)
    # and drop any jitted encoder built against the old module
    if new_vocab > vocab:
        import dataclasses

        import jax

        cfg = dataclasses.replace(pipeline.m.text_encoder.config,
                                  vocab_size=new_vocab)
        pipeline.m.text_encoder = type(pipeline.m.text_encoder)(
            cfg, dtype=pipeline.m.text_encoder.dtype)
        pipeline._encode_text = jax.jit(
            lambda params, ids: pipeline.m.text_encoder.apply(params, ids))
    # positional embeddings etc. are untouched — new ids only enter through
    # the embedding lookup (CLIPTextModel token_embedding, clip_text.py:107)
    return names

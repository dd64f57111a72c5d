"""CLIP text encoder: cross-framework parity against HF transformers (torch),
weights transferred through our converter — the real end-to-end check that the
tower + key mapping are correct."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upscale_a_video_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from upscale_a_video_tpu.utils.convert import CLIP_RENAMES, convert_state_dict


@pytest.fixture(scope="module")
def torch_clip():
    import transformers

    cfg = transformers.CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="gelu",
    )
    model = transformers.CLIPTextModel(cfg)
    model.eval()
    return model, cfg


@pytest.mark.slow
def test_matches_transformers(torch_clip):
    import torch

    t_model, t_cfg = torch_clip
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}

    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="gelu",
    )
    model = CLIPTextModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    converted, report = convert_state_dict(
        params["params"], sd, renames=CLIP_RENAMES, prefix="text_model.",
        strict=True,
    )
    # position_ids buffer may linger in older transformers state dicts
    assert all("position_ids" in k for k in report["unused"]), report["unused"]

    ids = np.array([[1, 5, 9, 42, 7, 3, 2, 0]], dtype=np.int64)
    with torch.no_grad():
        want = t_model(torch.from_numpy(ids)).last_hidden_state.numpy()
    got = np.asarray(model.apply({"params": converted}, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=2e-4)

"""Training-free latent propagation vs a direct torch simulation of the
reference loop (propagation_module.py:194-281, learnable=False)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from upscale_a_video_tpu.models.propagation import propagate_latents


# ---- torch reference reimplementation (from the published formulas) ----

def t_flow_warp(x, flow, interp_mode="bilinear"):
    n, c, h, w = x.shape
    grid_y, grid_x = torch.meshgrid(torch.arange(h).float(), torch.arange(w).float(),
                                    indexing="ij")
    grid = torch.stack((grid_x, grid_y), 2)
    vgrid = grid + flow
    vx = 2.0 * vgrid[..., 0] / max(w - 1, 1) - 1.0
    vy = 2.0 * vgrid[..., 1] / max(h - 1, 1) - 1.0
    return F.grid_sample(x, torch.stack((vx, vy), dim=3), mode=interp_mode,
                         padding_mode="zeros", align_corners=True)


def t_length_sq(x):
    return torch.sum(torch.square(x), dim=1, keepdim=True)


def t_fb_check(flow_fw, flow_bw, alpha1, alpha2):
    flow_bw_warped = t_flow_warp(flow_bw, flow_fw.permute(0, 2, 3, 1))
    diff = flow_fw + flow_bw_warped
    mag = t_length_sq(flow_fw) + t_length_sq(flow_bw_warped)
    return (t_length_sq(diff) < alpha1 * mag + alpha2).float()


def torch_propagation(x, flows_f, flows_b, interpolation="nearest", fuse_scale=0.5,
                      alpha1=0.001, alpha2=0.05):
    """x: (b,c,t,h,w); flows: (b,2,t-1,hf,wf)."""
    b, c, t, h, w = x.shape
    w_f = flows_f.shape[-1]
    s = 1.0 * w / w_f
    flows_f = F.interpolate(flows_f, (t - 1, h, w), mode="area") * s
    flows_b = F.interpolate(flows_b, (t - 1, h, w), mode="area") * s

    feats = {"input": [x[:, :, i] for i in range(t)]}
    modules = ["backward_prop", "forward_prop"]
    cache_list = ["input"] + modules

    for p_i, module_name in enumerate(modules):
        feats[module_name] = []
        if "backward" in module_name:
            frame_idx = list(range(t))[::-1]
            flow_idx = frame_idx
            flows_prop, flows_check = flows_f, flows_b
        else:
            frame_idx = list(range(t))
            flow_idx = list(range(-1, t - 1))
            flows_prop, flows_check = flows_b, flows_f

        for i, idx in enumerate(frame_idx):
            feat_current = feats[cache_list[p_i]][idx]
            if i == 0:
                feat_prop = feat_current
            else:
                flow_prop = flows_prop[:, :, flow_idx[i]]
                flow_check = flows_check[:, :, flow_idx[i]]
                mask = t_fb_check(flow_prop, flow_check, alpha1, alpha2)
                feat_warped = t_flow_warp(feat_prop, flow_prop.permute(0, 2, 3, 1),
                                          interpolation)
                feat_warped = feat_warped * fuse_scale + feat_current * (1 - fuse_scale)
                feat_prop = mask * feat_warped + (1 - mask) * feat_current
            feats[module_name].append(feat_prop)

        if "backward" in module_name:
            feats[module_name] = feats[module_name][::-1]

    return torch.stack(feats["forward_prop"], dim=2)


def _to_jax_x(x_bcthw):
    return jnp.asarray(x_bcthw.transpose(0, 2, 3, 4, 1))  # b t h w c


def _to_jax_flow(f_b2thw):
    return jnp.asarray(f_b2thw.transpose(0, 2, 3, 4, 1))  # b t h w 2


def test_matches_torch_reference_nearest():
    rng = np.random.RandomState(0)
    b, c, t, h, w = 1, 4, 5, 16, 16
    x = rng.randn(b, c, t, h, w).astype(np.float32)
    flows_f = (rng.randn(b, 2, t - 1, h * 2, w * 2) * 4).astype(np.float32)
    flows_b = (rng.randn(b, 2, t - 1, h * 2, w * 2) * 4).astype(np.float32)

    want = torch_propagation(torch.from_numpy(x), torch.from_numpy(flows_f),
                             torch.from_numpy(flows_b)).numpy()
    got = np.asarray(
        propagate_latents(_to_jax_x(x), _to_jax_flow(flows_f), _to_jax_flow(flows_b))
    ).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_matches_torch_reference_bilinear():
    rng = np.random.RandomState(1)
    b, c, t, h, w = 1, 3, 4, 12, 10
    x = rng.randn(b, c, t, h, w).astype(np.float32)
    flows_f = (rng.randn(b, 2, t - 1, h, w) * 2).astype(np.float32)
    flows_b = (rng.randn(b, 2, t - 1, h, w) * 2).astype(np.float32)

    want = torch_propagation(torch.from_numpy(x), torch.from_numpy(flows_f),
                             torch.from_numpy(flows_b),
                             interpolation="bilinear").numpy()
    got = np.asarray(
        propagate_latents(_to_jax_x(x), _to_jax_flow(flows_f), _to_jax_flow(flows_b),
                          interpolation="bilinear")
    ).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_consistent_flows_propagate():
    # zero flow, consistent → mask=1 everywhere → pure 0.5 blends; just check
    # shape & finiteness plus first-frame anchoring of the forward pass
    rng = np.random.RandomState(2)
    x = rng.randn(1, 6, 8, 8, 4).astype(np.float32)
    zeros = np.zeros((1, 5, 8, 8, 2), dtype=np.float32)
    out = np.asarray(propagate_latents(jnp.asarray(x), jnp.asarray(zeros),
                                       jnp.asarray(zeros)))
    assert out.shape == x.shape
    assert np.isfinite(out).all()

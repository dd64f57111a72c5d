"""Pure-torch ``deform_conv2d`` (modulated DCNv2) matching torchvision's
kernel semantics: per-tap bilinear sampling at (base + dilation·tap + offset),
zero outside the input, optional sigmoid-free mask multiply, then the weighted
channel reduction. Used by the reference's learnable propagator
(propagation_module.py:370) and WarpModule (temporal_module.py:616)."""

import torch
import torch.nn.functional as F


def _bilinear_sample(x, yq, xq):
    """x: (B, C, H, W); yq/xq: (B, P) absolute pixel coords (unnormalized).
    Returns (B, C, P) with zeros outside."""
    b, c, h, w = x.shape
    x0 = torch.floor(xq)
    y0 = torch.floor(yq)
    x1, y1 = x0 + 1, y0 + 1
    wx1 = xq - x0
    wy1 = yq - y0
    wx0, wy0 = 1 - wx1, 1 - wy1

    def gather(yy, xx):
        valid = (xx >= 0) & (xx <= w - 1) & (yy >= 0) & (yy <= h - 1)
        xi = xx.clamp(0, w - 1).long()
        yi = yy.clamp(0, h - 1).long()
        idx = (yi * w + xi).unsqueeze(1).expand(b, c, -1)
        vals = x.reshape(b, c, h * w).gather(2, idx)
        return vals * valid.unsqueeze(1)

    return (gather(y0, x0) * (wy0 * wx0).unsqueeze(1)
            + gather(y0, x1) * (wy0 * wx1).unsqueeze(1)
            + gather(y1, x0) * (wy1 * wx0).unsqueeze(1)
            + gather(y1, x1) * (wy1 * wx1).unsqueeze(1))


def deform_conv2d(input, offset, weight, bias=None, stride=(1, 1),
                  padding=(0, 0), dilation=(1, 1), mask=None):
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    b, c_in, h, w = input.shape
    c_out, c_in_g, kh, kw = weight.shape
    groups = c_in // c_in_g
    h_out = (h + 2 * padding[0] - dilation[0] * (kh - 1) - 1) // stride[0] + 1
    w_out = (w + 2 * padding[1] - dilation[1] * (kw - 1) - 1) // stride[1] + 1
    n_offset_grps = offset.shape[1] // (2 * kh * kw)
    assert n_offset_grps >= 1

    ys = torch.arange(h_out, device=input.device) * stride[0] - padding[0]
    xs = torch.arange(w_out, device=input.device) * stride[1] - padding[1]
    base_y = ys.view(-1, 1).expand(h_out, w_out).reshape(-1).float()
    base_x = xs.view(1, -1).expand(h_out, w_out).reshape(-1).float()

    offset = offset.reshape(b, n_offset_grps, kh * kw, 2, h_out * w_out)
    if mask is not None:
        mask = mask.reshape(b, n_offset_grps, kh * kw, h_out * w_out)

    ch_per_ogrp = c_in // n_offset_grps
    cols = []
    for og in range(n_offset_grps):
        x_g = input[:, og * ch_per_ogrp:(og + 1) * ch_per_ogrp]
        taps = []
        for ki in range(kh):
            for kj in range(kw):
                k = ki * kw + kj
                dy = offset[:, og, k, 0]
                dx = offset[:, og, k, 1]
                yq = base_y.unsqueeze(0) + ki * dilation[0] + dy
                xq = base_x.unsqueeze(0) + kj * dilation[1] + dx
                taps.append(_bilinear_sample(x_g, yq, xq))
        col = torch.stack(taps, dim=2)  # (B, C/og, K, P)
        if mask is not None:
            col = col * mask[:, og].unsqueeze(1)
        cols.append(col)
    col = torch.cat(cols, dim=1)  # (B, C_in, K, P)

    col = col.reshape(b, groups, c_in_g * kh * kw, h_out * w_out)
    wr = weight.reshape(groups, c_out // groups, c_in_g * kh * kw)
    out = torch.einsum("bgkp,gok->bgop", col, wr)
    out = out.reshape(b, c_out, h_out, w_out)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out

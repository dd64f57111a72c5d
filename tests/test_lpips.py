"""LPIPS: flax backbone + distance vs a torch reimplementation of the lpips
package (random weights — validates architecture, converter key schema, and
the metric math; the released weights are an external asset)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from upscale_a_video_tpu.utils.lpips import (  # noqa: E402
    LPIPS, convert_lpips_state)


class TorchAlexFeats(tnn.Module):
    """torchvision AlexNet.features, taps at each relu (lpips slices)."""

    def __init__(self):
        super().__init__()
        self.convs = tnn.ModuleList([
            tnn.Conv2d(3, 64, 11, 4, 2),
            tnn.Conv2d(64, 192, 5, 1, 2),
            tnn.Conv2d(192, 384, 3, 1, 1),
            tnn.Conv2d(384, 256, 3, 1, 1),
            tnn.Conv2d(256, 256, 3, 1, 1),
        ])

    def forward(self, x):
        taps = []
        for i, conv in enumerate(self.convs):
            x = F.relu(conv(x))
            taps.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, 3, 2)
        return taps


def torch_lpips(net, lins, a, b):
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    fa = net((a - shift) / scale)
    fb = net((b - shift) / scale)
    total = 0.0
    for xa, xb, w in zip(fa, fb, lins):
        na = xa / torch.sqrt((xa * xa).sum(1, keepdim=True) + 1e-10)
        nb = xb / torch.sqrt((xb * xb).sum(1, keepdim=True) + 1e-10)
        d = ((na - nb) ** 2 * w.view(1, -1, 1, 1)).sum(1)
        total = total + d.mean(dim=(1, 2))
    return total


def test_lpips_alex_parity():
    torch.manual_seed(0)
    net = TorchAlexFeats().eval()
    chans = (64, 192, 384, 256, 256)
    lins = [torch.rand(c) * 0.1 for c in chans]

    # build an lpips-package-style state dict
    slice_keys = ["slice1.0", "slice2.3", "slice3.6", "slice4.8", "slice5.10"]
    sd = {}
    for key, conv in zip(slice_keys, net.convs):
        sd[f"net.{key}.weight"] = conv.weight.detach().numpy()
        sd[f"net.{key}.bias"] = conv.bias.detach().numpy()
    for i, w in enumerate(lins):
        sd[f"lin{i}.model.1.weight"] = w.view(1, -1, 1, 1).numpy()

    params = convert_lpips_state(sd, net="alex")
    model = LPIPS(net="alex")

    rng = np.random.RandomState(3)
    a = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        want = torch_lpips(net, lins, torch.from_numpy(a),
                           torch.from_numpy(b)).numpy()

    got = model.apply(params, jnp.asarray(a.transpose(0, 2, 3, 1)),
                      jnp.asarray(b.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_lpips_vgg_builds():
    """VGG16 variant: tap shapes/channels and converter key schema."""
    model = LPIPS(net="vgg")
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x, x)
    out = model.apply(params, x, x)
    assert out.shape == (1,)
    assert float(out[0]) == 0.0
    # backbone has 13 convs; lins match the 5 tap channel counts
    assert len(params["params"]["backbone"]) == 13
    for i, c in enumerate((64, 128, 256, 512, 512)):
        assert params["params"][f"lin{i}"].shape == (c,)


@pytest.mark.slow
def test_lpips_properties():
    """d(x, x) == 0; d symmetric-ish; d > 0 for different inputs."""
    model = LPIPS(net="alex")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, x)
    # force positive lin weights (converter guarantees this for real ckpts)
    params = jax.tree.map(jnp.abs, params)
    assert float(model.apply(params, x, x)[0]) == 0.0
    dxy = float(model.apply(params, x, y)[0])
    dyx = float(model.apply(params, y, x)[0])
    assert dxy > 0
    np.testing.assert_allclose(dxy, dyx, rtol=1e-5)

"""Backbone tests: torch-semantics parity, masked-batch exactness, topology.

The three claims the extraction layer rests on (SURVEY.md section 7):
1. our conv/BN/pool/SE primitives reproduce torch.nn inference numerics,
2. a zero-padded *batch* of differently-sized images produces features
   exactly equal to native per-image extraction (the reference's batch-1
   loop, reference network.py:246-269),
3. the features-children topology matches torchvision's truncation indices
   (reference network.py:185-186).
"""

import numpy as np
import jax.numpy as jnp
import jax
import pytest
import torch
import torch.nn as nn

from shoeprint_image_retrieval_tpu.models import layers as L
from shoeprint_image_retrieval_tpu.models.densenet import densenet201
from shoeprint_image_retrieval_tpu.models.efficientnet import (
    efficientnet_v1,
    efficientnet_v2,
    make_divisible,
)
from shoeprint_image_retrieval_tpu.models.vgg import vgg

torch.manual_seed(0)


def _full_valid(x):
    return jnp.asarray([[x.shape[-2], x.shape[-1]]] * x.shape[0], jnp.int32)


def test_conv2d_matches_torch():
    tconv = nn.Conv2d(5, 7, 3, stride=2, padding=1, bias=True)
    x = torch.randn(2, 5, 13, 17)
    want = tconv(x).detach().numpy()
    xj = jnp.asarray(x.numpy())
    got, valid = L.conv2d(
        xj, jnp.asarray(tconv.weight.detach().numpy()),
        jnp.asarray(tconv.bias.detach().numpy()),
        _full_valid(xj), stride=2, padding=1,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    assert valid[0].tolist() == [7, 9]


def test_depthwise_conv_matches_torch():
    tconv = nn.Conv2d(6, 6, 5, padding=2, groups=6, bias=False)
    x = torch.randn(1, 6, 11, 12)
    want = tconv(x).detach().numpy()
    xj = jnp.asarray(x.numpy())
    got, _ = L.conv2d(xj, jnp.asarray(tconv.weight.detach().numpy()), None,
                      _full_valid(xj), stride=1, padding=2, groups=6)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_batchnorm_matches_torch_eval():
    bn = nn.BatchNorm2d(4, eps=1e-3).eval()
    with torch.no_grad():
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.uniform_(-1, 1)
        bn.running_mean.uniform_(-1, 1)
        bn.running_var.uniform_(0.5, 2.0)
    x = torch.randn(2, 4, 6, 6)
    want = bn(x).detach().numpy()
    p = {k: jnp.asarray(getattr(bn, k).detach().numpy())
         for k in ("weight", "bias", "running_mean", "running_var")}
    xj = jnp.asarray(x.numpy())
    got = L.batchnorm(xj, p, _full_valid(xj), 1e-3)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_pools_match_torch():
    x = torch.randn(1, 3, 9, 11).abs()  # post-ReLU regime
    xj = jnp.asarray(x.numpy())
    for tmod, ours, kwargs in [
        (nn.MaxPool2d(2, 2), L.max_pool, dict(kernel=2, stride=2)),
        (nn.MaxPool2d(3, 2, 1), L.max_pool, dict(kernel=3, stride=2, padding=1)),
        (nn.AvgPool2d(2, 2), L.avg_pool, dict(kernel=2, stride=2)),
    ]:
        want = tmod(x).numpy()
        got, _ = ours(xj, _full_valid(xj), **kwargs)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_squeeze_excitation_matches_torch():
    cin, sq = 8, 2
    fc1 = nn.Conv2d(cin, sq, 1)
    fc2 = nn.Conv2d(sq, cin, 1)
    x = torch.randn(2, cin, 7, 9)
    s = torch.nn.functional.adaptive_avg_pool2d(x, 1)
    s = fc2(torch.nn.functional.silu(fc1(s)))
    want = (x * torch.sigmoid(s)).detach().numpy()

    p = {
        "fc1": {"weight": jnp.asarray(fc1.weight.detach().numpy()),
                "bias": jnp.asarray(fc1.bias.detach().numpy())},
        "fc2": {"weight": jnp.asarray(fc2.weight.detach().numpy()),
                "bias": jnp.asarray(fc2.bias.detach().numpy())},
    }
    xj = jnp.asarray(x.numpy())
    got = L.squeeze_excitation(xj, p, _full_valid(xj))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@pytest.mark.parametrize(
    "features,block",
    [
        (efficientnet_v2("S"), 4),
        (efficientnet_v1("B1"), 3),
        (vgg("VGG16"), 10),
        (densenet201(), 6),
    ],
    ids=["v2s", "b1", "vgg16", "densenet"],
)
def test_masked_batch_equals_native(features, block):
    """Padded batched extraction == per-image native extraction, exactly."""
    feats = features.truncate(block)
    params = feats.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    sizes = [(37, 49), (48, 48), (33, 41)]
    imgs = [rng.normal(size=(3, h, w)).astype(np.float32) for h, w in sizes]

    batch = np.zeros((3, 3, 48, 49), np.float32)
    valid = np.zeros((3, 2), np.int32)
    for i, im in enumerate(imgs):
        batch[i, :, : im.shape[1], : im.shape[2]] = im
        valid[i] = im.shape[1:]

    yb, vb = feats.apply(params, jnp.asarray(batch), jnp.asarray(valid))
    yb = np.asarray(yb)
    vb = np.asarray(vb)

    for i, im in enumerate(imgs):
        yn, vn = feats.apply(
            params, jnp.asarray(im)[None], jnp.asarray([im.shape[1:]], jnp.int32)
        )
        yn = np.asarray(yn)[0]
        hv, wv = int(vn[0, 0]), int(vn[0, 1])
        assert (vb[i] == (hv, wv)).all()
        np.testing.assert_allclose(
            yb[i, :, :hv, :wv], yn[:, :hv, :wv], rtol=1e-5, atol=1e-5
        )
        # and exactly zero outside the valid region
        assert np.all(yb[i, :, hv:, :] == 0) and np.all(yb[i, :, :, wv:] == 0)


def test_make_divisible_matches_torchvision_rule():
    assert make_divisible(32 * 1.0) == 32
    assert make_divisible(32 * 1.6) == 48   # B5 stem
    assert make_divisible(32 * 2.0) == 64   # B7 stem
    assert make_divisible(16 * 1.0) == 16
    assert make_divisible(24 * 1.1) == 24   # B2: 26.4 -> 24 (>= 0.9*26.4)


def test_topology_channel_counts():
    m = efficientnet_v2("M")
    assert len(m.children) == 9  # stem + 7 stages + head
    assert list(m.out_channels) == [24, 24, 48, 80, 160, 176, 304, 512, 1280]
    # reference default: block 6 keeps stem+stages1-5 -> 176 channels
    assert m.truncate(6).out_channels[-1] == 176

    s = efficientnet_v2("S")
    assert len(s.children) == 8
    assert s.out_channels[-2] == 256

    b0 = efficientnet_v1("B0")
    assert list(b0.out_channels) == [32, 16, 24, 40, 80, 112, 192, 320, 1280]

    assert len(vgg("VGG16").children) == 31
    assert len(vgg("VGG19").children) == 37
    assert len(vgg("VGG19_BN", batch_norm=True).children) == 53

    d = densenet201()
    assert len(d.children) == 12
    assert list(d.out_channels) == [64, 64, 64, 64, 256, 128, 512, 256, 1792, 896, 1920, 1920]


def test_stride_and_output_sizes():
    """EffNetV2-M truncated at block 6 has output stride 16 (SURVEY.md 2.2)."""
    m = efficientnet_v2("M").truncate(6)
    params = m.init(jax.random.PRNGKey(1))
    x = jnp.zeros((1, 3, 64, 96), jnp.float32)
    y, valid = m.apply(params, x, jnp.asarray([[64, 96]], jnp.int32))
    assert y.shape[1] == 176
    assert valid[0].tolist() == [4, 6]  # 64/16, 96/16


def test_summary_helpers():
    """output_size / describe (the reference's printmodel & get_output_size,
    network.py:16-48, without its CUDA dependence)."""
    from shoeprint_image_retrieval_tpu.models.summary import describe, output_size

    m = efficientnet_v2("M").truncate(6)
    c, h, w = output_size(m, (64, 96))
    assert (c, h, w) == (176, 4, 6)  # stride 16, 176 channels
    text = describe(m)
    assert "ConvBNAct" in text and "Stage" in text and text.count("\n") == 6

"""Weight-converter tests: torchvision-style state dicts map onto our trees.

Without torchvision in the image, state dicts are synthesized with
torchvision's exact key layout (verified against its published module
structure); the converter must consume every key, fill every leaf, and fail
loudly on topology mismatches.
"""

import numpy as np
import jax
import pytest

from shoeprint_image_retrieval_tpu.models.convert import _Taker, convert
from shoeprint_image_retrieval_tpu.models.densenet import densenet201
from shoeprint_image_retrieval_tpu.models.efficientnet import (
    ConvBNAct,
    MBConv,
    Stage,
    efficientnet_v2,
)
from shoeprint_image_retrieval_tpu.models.vgg import vgg


def _tree_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, prefix + (k,))
    else:
        yield prefix, tree


def _synth_sd_from_tree(features):
    """Build a torchvision-keyed state dict whose shapes mirror our init."""
    params = features.init(jax.random.PRNGKey(0))
    sd = {}

    def cna(prefix, p):
        sd[f"{prefix}.0.weight"] = np.asarray(p["conv"]["weight"])
        for k in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{prefix}.1.{k}"] = np.asarray(p["bn"][k])

    from shoeprint_image_retrieval_tpu.models.densenet import (
        Conv0, DenseBlock, Norm, Pool0, ReLU0, Transition,
    )
    from shoeprint_image_retrieval_tpu.models.efficientnet import FusedMBConv
    from shoeprint_image_retrieval_tpu.models.vgg import BatchNorm, Conv, MaxPool, ReLU

    dense_names = [
        "conv0", "norm0", "relu0", "pool0",
        "denseblock1", "transition1", "denseblock2", "transition2",
        "denseblock3", "transition3", "denseblock4", "norm5",
    ]
    is_dense = any(isinstance(c, (DenseBlock, Conv0)) for c in features.children)

    for i, child in enumerate(features.children):
        p = params[str(i)]
        prefix = f"features.{dense_names[i]}" if is_dense else f"features.{i}"
        if isinstance(child, ConvBNAct):
            cna(prefix, p)
        elif isinstance(child, Stage):
            for j, blk in enumerate(child.blocks):
                bp = p[str(j)]
                idx = 0
                if isinstance(blk, MBConv):
                    if blk.expand is not None:
                        cna(f"{prefix}.{j}.block.{idx}", bp["expand"]); idx += 1
                    cna(f"{prefix}.{j}.block.{idx}", bp["dw"]); idx += 1
                    for fc in ("fc1", "fc2"):
                        sd[f"{prefix}.{j}.block.{idx}.{fc}.weight"] = np.asarray(bp["se"][fc]["weight"])
                        sd[f"{prefix}.{j}.block.{idx}.{fc}.bias"] = np.asarray(bp["se"][fc]["bias"])
                    idx += 1
                    cna(f"{prefix}.{j}.block.{idx}", bp["project"])
                elif isinstance(blk, FusedMBConv):
                    if blk.expand is not None:
                        cna(f"{prefix}.{j}.block.0", bp["expand"])
                        cna(f"{prefix}.{j}.block.1", bp["project"])
                    else:
                        cna(f"{prefix}.{j}.block.0", bp["project"])
        elif isinstance(child, Conv):
            sd[f"{prefix}.weight"] = np.asarray(p["weight"])
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])
        elif isinstance(child, (BatchNorm, Norm)):
            for k in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{prefix}.{k}"] = np.asarray(p[k])
        elif isinstance(child, (ReLU, MaxPool, ReLU0, Pool0)):
            pass
        elif isinstance(child, Conv0):
            sd[f"{prefix}.weight"] = np.asarray(p["weight"])
        elif isinstance(child, DenseBlock):
            for j in range(len(child.layers)):
                lp = p[str(j)]
                for nm in ("norm1", "norm2"):
                    for k in ("weight", "bias", "running_mean", "running_var"):
                        sd[f"{prefix}.denselayer{j+1}.{nm}.{k}"] = np.asarray(lp[nm][k])
                for cv in ("conv1", "conv2"):
                    sd[f"{prefix}.denselayer{j+1}.{cv}.weight"] = np.asarray(lp[cv]["weight"])
        elif isinstance(child, Transition):
            for k in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{prefix}.norm.{k}"] = np.asarray(p["norm"][k])
            sd[f"{prefix}.conv.weight"] = np.asarray(p["conv"]["weight"])
    return params, sd


@pytest.mark.parametrize(
    "features",
    [efficientnet_v2("S").truncate(3), vgg("VGG19_BN", batch_norm=True).truncate(8),
     densenet201().truncate(6)],
    ids=["v2s", "vgg19bn", "densenet"],
)
def test_roundtrip_exact(features):
    want, sd = _synth_sd_from_tree(features)
    got = convert(features, sd, truncated=False)
    want_paths = dict(_tree_paths(want))
    got_paths = dict(_tree_paths(got))
    assert set(want_paths) == set(got_paths)
    for path, val in want_paths.items():
        np.testing.assert_array_equal(np.asarray(got_paths[path]), np.asarray(val))


def test_missing_key_raises():
    features = efficientnet_v2("S").truncate(2)
    _, sd = _synth_sd_from_tree(features)
    del sd["features.0.0.weight"]
    with pytest.raises(KeyError):
        convert(features, sd)


def test_unconsumed_key_raises_unless_truncated():
    features = efficientnet_v2("S").truncate(2)
    _, sd = _synth_sd_from_tree(features)
    sd["features.9.0.weight"] = np.zeros((4, 4, 1, 1), np.float32)
    with pytest.raises(ValueError):
        convert(features, sd, truncated=False)
    convert(features, sd, truncated=True)  # ok

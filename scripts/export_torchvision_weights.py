#!/usr/bin/env python3
"""Export torchvision checkpoints for this framework (run where torchvision
and network access exist; this build environment has neither).

For each reference model string (reference network.py:121-182) this downloads
the exact weights the reference uses and saves a ``.npz`` state dict that
``models/convert.py`` maps onto the JAX trees:

    python scripts/export_torchvision_weights.py EfficientNetV2_M VGG16 ...
    # or with no args: all 13
    # then copy the .npz files into <repo>/weights/

The weights tags match the reference exactly (VGG16 uses
IMAGENET1K_FEATURES, EfficientNet_B1 uses IMAGENET1K_V2, everything else
IMAGENET1K_V1).
"""

import sys

CTORS = {
    "VGG19": ("vgg19", "IMAGENET1K_V1"),
    "VGG16": ("vgg16", "IMAGENET1K_FEATURES"),
    "VGG19_BN": ("vgg19_bn", "IMAGENET1K_V1"),
    "EfficientNet_B1": ("efficientnet_b1", "IMAGENET1K_V2"),
    "EfficientNet_B2": ("efficientnet_b2", "IMAGENET1K_V1"),
    "EfficientNet_B3": ("efficientnet_b3", "IMAGENET1K_V1"),
    "EfficientNet_B4": ("efficientnet_b4", "IMAGENET1K_V1"),
    "EfficientNet_B5": ("efficientnet_b5", "IMAGENET1K_V1"),
    "EfficientNet_B7": ("efficientnet_b7", "IMAGENET1K_V1"),
    "EfficientNetV2_S": ("efficientnet_v2_s", "IMAGENET1K_V1"),
    "EfficientNetV2_M": ("efficientnet_v2_m", "IMAGENET1K_V1"),
    "EfficientNetV2_L": ("efficientnet_v2_l", "IMAGENET1K_V1"),
}


def main() -> None:
    import numpy as np
    import torchvision.models as tvm

    names = sys.argv[1:] or list(CTORS)
    if any(n == "DenseNet_201" for n in names) or not sys.argv[1:]:
        CTORS["DenseNet_201"] = ("densenet201", "IMAGENET1K_V1")
    for name in names:
        ctor, weights = CTORS[name]
        print(f"downloading {name} ({ctor}, {weights})...")
        model = getattr(tvm, ctor)(weights=weights)
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        out = f"{name}.npz"
        np.savez(out, **sd)
        print(f"  wrote {out} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()

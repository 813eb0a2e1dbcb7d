"""ResNet-50 and VGG-16 feature backbones in flax.

The reference's localization model zoo includes truncated resnet50/vgg16 feature
extractors with optional dilation (reference: object-localization/networks.py:
13-83, `ResNet50Bottom`, `vgg16Bottom`), and the self-training model offers a
`dino_resnet50` DeepLab backbone with replace_stride_with_dilation
(reference: semantic-segmentation/model/model.py:8-39). These flax modules cover
both: forward returns every stage's feature map so callers can truncate at any
layer; a torchvision-layout state-dict converter allows loading locally stored
pretrained weights (no network egress in this environment).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import numpy as np


class Bottleneck(nn.Module):
    features: int            # bottleneck width; output is 4x
    strides: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        pad = self.dilation
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, name="down_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, name="down_bn")(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """Returns {'stem', 'layer1'..'layer4'} feature maps (NHWC).

    replace_stride_with_dilation mirrors torchvision: a True entry converts that
    layer's stride-2 into dilation (output_stride 8 = [False, True, True],
    reference: model/model.py:10-17).
    """
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = {}
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        feats["stem"] = y

        blocks_per_layer = (3, 4, 6, 3)
        widths = (64, 128, 256, 512)
        dilation = 1
        for li, (n_blocks, width) in enumerate(zip(blocks_per_layer, widths)):
            stride = 1 if li == 0 else 2
            if li > 0 and self.replace_stride_with_dilation[li - 1]:
                dilation *= stride
                stride = 1
            for bi in range(n_blocks):
                y = Bottleneck(width,
                               strides=stride if bi == 0 else 1,
                               dilation=dilation,
                               downsample=(bi == 0),
                               name=f"layer{li + 1}_{bi}")(y, train)
            feats[f"layer{li + 1}"] = y
        return feats


class VGG16Features(nn.Module):
    """VGG-16 convolutional trunk; returns the feature map after each of the five
    conv stages. The reference truncates at features[:-1] (up to conv5_3+ReLU,
    before the last max-pool) — that is `stage5` here
    (reference: object-localization/networks.py:71-83)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        feats = {}
        y = x
        for si, (width, n_convs) in enumerate(cfg):
            for ci in range(n_convs):
                y = nn.Conv(width, (3, 3), padding="SAME",
                            name=f"conv{si + 1}_{ci + 1}")(y)
                y = nn.relu(y)
            feats[f"stage{si + 1}"] = y
            if si < len(cfg) - 1:
                y = nn.max_pool(y, (2, 2), strides=(2, 2))
        return feats


def resnet50_feature_extractor(layer: str = "layer4",
                               dilate_last: bool = False):
    """(model, apply_fn) returning the requested truncated feature map — the
    `ResNet50Bottom` analogue (reference: networks.py:13-37). `dilate_last`
    keeps layer4 at stride 16 with dilation 2, the zoo's 'dilated' variants."""
    rswd = (False, False, True) if dilate_last else (False, False, False)
    model = ResNet50(replace_stride_with_dilation=rswd)

    def apply_fn(params, x, train: bool = False):
        return model.apply(params, x, train=train)[layer]
    return model, apply_fn


def convert_torchvision_resnet50(state_dict: dict) -> dict:
    """Map a torchvision resnet50 state dict onto the flax ResNet50 tree."""
    def t(x):
        return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x,
                          np.float32)

    def conv(w):
        return {"kernel": t(w).transpose(2, 3, 1, 0)}

    def bn(prefix):
        return ({"scale": t(sd[prefix + ".weight"]), "bias": t(sd[prefix + ".bias"])},
                {"mean": t(sd[prefix + ".running_mean"]),
                 "var": t(sd[prefix + ".running_var"])})

    sd = state_dict
    params: dict = {"conv1": conv(sd["conv1.weight"])}
    stats: dict = {}
    p, s = bn("bn1")
    params["bn1"], stats["bn1"] = p, s
    blocks_per_layer = (3, 4, 6, 3)
    for li, n_blocks in enumerate(blocks_per_layer, start=1):
        for bi in range(n_blocks):
            src = f"layer{li}.{bi}"
            dst = f"layer{li}_{bi}"
            bp: dict = {}
            bs: dict = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = conv(sd[f"{src}.conv{ci}.weight"])
                p, s = bn(f"{src}.bn{ci}")
                bp[f"bn{ci}"], bs[f"bn{ci}"] = p, s
            if f"{src}.downsample.0.weight" in sd:
                bp["down_conv"] = conv(sd[f"{src}.downsample.0.weight"])
                p, s = bn(f"{src}.downsample.1")
                bp["down_bn"], bs["down_bn"] = p, s
            params[dst] = bp
            stats[dst] = bs
    return {"params": params, "batch_stats": stats}

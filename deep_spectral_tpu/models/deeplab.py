"""DeepLabV3/V3+ segmentation heads over a DINO ViT backbone, in flax.

Re-implements the reference's self-training model
(reference: semantic-segmentation/model/model.py): a frozen-ish DINO backbone
exposed through intermediate layers — layer 0 of the last five as 'low_level'
and the final layer as 'out' (model.py:68-77) — feeding a DeepLabV3+ head (ASPP
+ low-level projection, model.py:80-113), with the logits bilinearly upsampled
to the input resolution (model.py:121-126).

TPU notes: NHWC; BatchNorm statistics are computed over the (possibly sharded)
global batch under jit, so data-parallel training gets synchronized BN for free
(the reference needs torch SyncBatchNorm, train.py:78-79).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .vit import ViTConfig, VisionTransformer
from ..ops.resize import resize_bilinear, resize_bilinear_mm


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    dilation: int = 1
    use_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        """`mask` ((B, H, W, 1), bucket-padded eval): zeroing the output at
        padded positions makes the NEXT conv's zero-padding semantics at the
        valid-region border identical to an unpadded forward's, so padding is
        exactly inert through arbitrarily deep conv stacks."""
        pad = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=[(pad, pad), (pad, pad)], use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        x = nn.relu(x) if self.use_relu else x
        return x if mask is None else x * mask


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (torchvision semantics): 1x1 conv, three
    dilated 3x3 convs, a global-pooling branch, concat -> 1x1 project + dropout."""
    out_features: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        branches = [ConvBNReLU(self.out_features, kernel=1)(x, train, mask)]
        for rate in self.atrous_rates:
            branches.append(
                ConvBNReLU(self.out_features, kernel=3, dilation=rate)(x, train,
                                                                       mask))
        # Global pooling branch (masked mean over the valid region only).
        if mask is None:
            g = jnp.mean(x, axis=(1, 2), keepdims=True)
        else:
            g = jnp.sum(x * mask, axis=(1, 2), keepdims=True) / \
                jnp.maximum(jnp.sum(mask, axis=(1, 2), keepdims=True), 1.0)
        g = ConvBNReLU(self.out_features, kernel=1)(g, train)
        g = jnp.broadcast_to(g, x.shape[:3] + (self.out_features,))
        if mask is not None:
            g = g * mask
        branches.append(g)
        y = jnp.concatenate(branches, axis=-1)
        y = ConvBNReLU(self.out_features, kernel=1)(y, train, mask)
        y = nn.Dropout(0.5, deterministic=not train)(y)
        return y


class DeepLabHeadV3Plus(nn.Module):
    """(reference: semantic-segmentation/model/model.py:80-113)."""
    num_classes: int
    aspp_rates: Sequence[int] = (12, 24, 36)

    @nn.compact
    def __call__(self, low_level, out, train: bool = False, mask=None):
        ll = ConvBNReLU(48, kernel=1)(low_level, train, mask)
        y = ASPP(256, self.aspp_rates)(out, train, mask)
        y = resize_bilinear(y, ll.shape[1:3])
        y = jnp.concatenate([ll, y], axis=-1)  # 48 + 256 = 304
        y = ConvBNReLU(256, kernel=3)(y, train, mask)
        return nn.Conv(self.num_classes, (1, 1))(y)


class DeepLabHead(nn.Module):
    """Plain DeepLabV3 head (ASPP -> 3x3 -> classifier)."""
    num_classes: int
    aspp_rates: Sequence[int] = (12, 24, 36)

    @nn.compact
    def __call__(self, low_level, out, train: bool = False, mask=None):
        y = ASPP(256, self.aspp_rates)(out, train, mask)
        y = ConvBNReLU(256, kernel=3)(y, train, mask)
        return nn.Conv(self.num_classes, (1, 1))(y)


class DeepLabViT(nn.Module):
    """DINO ViT backbone + DeepLab head; logits at input resolution.

    The reference adds +1 class for background (model/__init__.py:11-13); pass
    `num_classes` already including background.
    """
    vit_cfg: ViTConfig
    num_classes: int
    head: str = "deeplabv3plus"
    compute_dtype: Any = jnp.float32
    # 'einsum' is fastest at training crop sizes (T <= ~1k tokens); 'flash'
    # (fully differentiable Pallas kernels) pays off for large-crop training.
    attention_impl: str = "einsum"
    remat: bool = False  # jax.checkpoint the backbone blocks (large batches)

    @nn.compact
    def __call__(self, x, train: bool = False, token_mask=None,
                 spatial_mask=None, pos_embed_override=None,
                 return_grid: bool = False):
        """spatial_mask ((B, hp, wp) bool, optional): valid-patch mask for
        bucket-padded evaluation — derives the attention token mask, zeroes
        padded feature cells and threads through the head's convs so padding
        is exactly inert. pos_embed_override: see VisionTransformer.
        return_grid: return patch-grid logits (B, hp, wp, C) without the final
        bilinear upsample (the bucketed eval edge-replicates the grid first)."""
        B, H, W, _ = x.shape
        P = self.vit_cfg.patch_size
        hp, wp = H // P, W // P
        vit = VisionTransformer(self.vit_cfg, self.compute_dtype,
                                self.attention_impl, self.remat,
                                name="backbone")
        if spatial_mask is not None and token_mask is None:
            token_mask = spatial_mask.reshape(B, hp * wp)
        outs = vit(x, n_intermediates=5, token_mask=token_mask,
                   pos_embed_override=pos_embed_override)
        inters = outs["intermediates"]
        # layer -5 -> low_level, final layer -> out (model.py:75-77), CLS dropped.
        low = inters[0][:, 1:, :].reshape(B, hp, wp, -1)
        out = inters[-1][:, 1:, :].reshape(B, hp, wp, -1)
        m = None
        if spatial_mask is not None:
            m = spatial_mask.astype(low.dtype)[..., None]  # (B, hp, wp, 1)
            low = low * m
            out = out * m
        head_cls = DeepLabHeadV3Plus if self.head == "deeplabv3plus" else DeepLabHead
        logits = head_cls(self.num_classes, name="head")(low, out, train, m)
        if return_grid:
            return logits
        if train:
            # Matmul-form upsample: same math, but no layout-transpose copies
            # under autodiff (3.3 ms/step of the b96 train step — see
            # ops/resize.resize_bilinear_mm). Eval keeps the torch-bit-exact
            # gather kernel.
            return resize_bilinear_mm(logits, (H, W))
        return resize_bilinear(logits, (H, W))


class DeepLabResNet(nn.Module):
    """ResNet-50 backbone (dilated, output stride 8/16) + DeepLab head — the
    reference's `get_deeplab_resnet` (semantic-segmentation/model/model.py:8-39):
    layer1 -> 'low_level', layer4 -> 'out'."""
    num_classes: int
    head: str = "deeplabv3plus"
    output_stride: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False, token_mask=None):
        del token_mask  # conv backbone needs no token mask
        from .resnet import ResNet50
        H, W = x.shape[1:3]
        if self.output_stride == 8:
            rswd, rates = (False, True, True), (12, 24, 36)
        else:
            rswd, rates = (False, False, True), (6, 12, 18)
        feats = ResNet50(replace_stride_with_dilation=rswd,
                         name="backbone")(x, train)
        head_cls = DeepLabHeadV3Plus if self.head == "deeplabv3plus" else DeepLabHead
        logits = head_cls(self.num_classes, rates, name="head")(
            feats["layer1"], feats["layer4"], train)
        if train:
            return resize_bilinear_mm(logits, (H, W))
        return resize_bilinear(logits, (H, W))


def backbone_param_labels(params, unfrozen_backbone_layers: int, depth: int):
    """Label each param 'train' or 'freeze': head always trains; backbone blocks
    train only in the last `unfrozen_backbone_layers` (reference:
    semantic-segmentation/train.py:48-52; -1 trains all, 0 freezes the backbone)."""
    def label(path_tuple):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path_tuple]
        if "backbone" not in names:
            return "train"
        if unfrozen_backbone_layers < 0:
            return "train"
        for n in names:
            if isinstance(n, str) and n.startswith("blocks_"):
                idx = int(n.split("_")[1])
                if depth - idx <= unfrozen_backbone_layers:
                    return "train"
                return "freeze"
            if isinstance(n, str) and n.startswith("layer") and "_" in n:
                # ResNet stages layer1..layer4: train the last N stages.
                stage = int(n.split("_")[0][5:])
                return "train" if 4 - stage < unfrozen_backbone_layers else "freeze"
        # non-block backbone params (patch embed, pos embed, final norm)
        return "train" if unfrozen_backbone_layers < 0 else "freeze"
    return jax.tree_util.tree_map_with_path(lambda path, _: label(path), params)

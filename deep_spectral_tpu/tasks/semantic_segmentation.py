"""Unsupervised semantic segmentation: clustering eval + DeepLab self-training.

Covers the reference's `semantic-segmentation/` subproject:
  * `evaluate_segments` — dataset-wide Hungarian/majority-vote matching of
    cluster ids to VOC classes and mIoU (reference: eval.py:87-159,
    eval_utils.py) — the pixel scan is one fused confusion-matrix pass.
  * `VOCSegmentationWithPseudolabels` — VOC-layout images + GT + pseudolabel
    segmaps paired positionally, pseudolabels upsampled nearest to image size
    (reference: dataset/voc.py).
  * self-training — DeepLabV3+ over a DINO backbone trained with cross-entropy
    against pseudolabels (reference: train.py), as a pjit-sharded optax loop:
    AdamW + linear decay (config/train.yaml:42-57), backbone freezing
    (train.py:48-52), gradient accumulation, optional EMA, NaN guard
    (train.py:213-216), orbax checkpointing of the full train state
    (replacing torch checkpoint-latest/best, train.py:141-167).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from pathlib import Path
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..models.deeplab import DeepLabViT, backbone_param_labels
from ..models.vit import get_model_config
from ..ops import metrics as M
from ..ops.resize import resize_bilinear, resize_nearest
from ..utils.image_io import IMAGENET_MEAN, IMAGENET_STD, load_image_rgb
from ..utils.serialization import load_segmap_png

VOC_NUM_CLASSES = 21  # 20 + background (reference: model/__init__.py:11-13)


# ------------------------------------------------------------------- datasets

def upsample_pseudolabel(segmap: np.ndarray, image_hw: tuple[int, int]) -> np.ndarray:
    """Nearest-upsample a patch-level pseudolabel to image resolution, handling
    the x8/x16/x32 grids (reference: dataset/voc.py:12-19).

    Pure numpy with cv2 INTER_NEAREST index semantics (src = floor(dst*in/out),
    identical to ops.resize.resize_nearest) — this runs inside dataset
    __getitem__ on the producer threads, where a JAX dispatch would cost a
    remote-device round-trip (~100 ms) PER IMAGE on a tunneled TPU.

    The index product is computed in float32, NOT float64: the device path
    multiplies in f32 (jnp x32 default), and f64-vs-f32 rounding disagrees on
    1-2 rows for some real grid/image pairs (e.g. 8 -> 282)."""
    H_in, W_in = segmap.shape
    H_out, W_out = image_hw
    iy = np.floor(np.arange(H_out, dtype=np.float32)
                  * np.float32(H_in / H_out)).astype(np.int64)
    ix = np.floor(np.arange(W_out, dtype=np.float32)
                  * np.float32(W_in / W_out)).astype(np.int64)
    iy = np.minimum(iy, H_in - 1)
    ix = np.minimum(ix, W_in - 1)
    return segmap.astype(np.int32)[iy[:, None], ix[None, :]]


class VOCSegmentationWithPseudolabels:
    """VOC2012-layout dataset with pseudolabel segmaps.

    root/
      JPEGImages/<id>.jpg
      SegmentationClass/<id>.png      (GT, for val)
      ImageSets/Segmentation/val.txt
    segments_dir/<id or positional>.png  (pseudolabels)

    Semantics preserved from the reference: custom 'train' split = all
    JPEGImages minus val stems (voc.py:78-87); segment files paired to image
    files by SORTED POSITION, not by id (voc.py:112-131); optional label_map
    remapping (the Hungarian matching) applied to the pseudolabel.
    """

    def __init__(self, root: str, image_set: str, segments_dir: str,
                 label_map: Optional[dict] = None):
        root = Path(root)
        self.root = root
        images_dir = root / "JPEGImages"
        val_stems = set()
        val_file = root / "ImageSets" / "Segmentation" / "val.txt"
        if val_file.is_file():
            val_stems = set(val_file.read_text().split())
        all_images = sorted(images_dir.glob("*.jpg"))
        if image_set == "val":
            self.images = [p for p in all_images if p.stem in val_stems]
        elif image_set == "train":
            self.images = [p for p in all_images if p.stem not in val_stems]
        else:
            self.images = all_images
        self.targets = [root / "SegmentationClass" / f"{p.stem}.png"
                        for p in self.images]
        # Segment files cover the WHOLE image folder and pair to sorted images
        # by position, then the split subset is selected
        # (reference: dataset/voc.py:112-131 `_prepare_segments_dir`).
        seg_files = sorted(Path(segments_dir).iterdir())
        assert len(seg_files) == len(all_images), \
            f"{len(seg_files)} segmaps vs {len(all_images)} images in folder"
        split_stems = {p.stem for p in self.images}
        self.segments = [s for img, s in zip(all_images, seg_files)
                         if img.stem in split_stems]
        assert len(self.segments) == len(self.images)
        self.label_map = label_map

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i: int):
        image = load_image_rgb(self.images[i])
        seg = load_segmap_png(self.segments[i]).astype(np.int64)
        if seg.shape != image.shape[:2]:
            seg = upsample_pseudolabel(seg, image.shape[:2])
        if self.label_map is not None:
            lut = np.arange(max(int(seg.max()) + 1,
                                max(self.label_map) + 1), dtype=np.int64)
            for k, v in self.label_map.items():
                lut[k] = v
            seg = lut[seg]
        target = None
        if self.targets[i].is_file():
            target = np.asarray(load_segmap_png(self.targets[i]), np.int64)
        return image, seg, target, self.images[i].stem


# ------------------------------------------------------------- transforms

def normalize_image(img_u8: np.ndarray) -> np.ndarray:
    return ((img_u8.astype(np.float32) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD


def train_augment(rng: np.random.Generator, image: np.ndarray, seg: np.ndarray,
                  resize_size: int = 256, crop_size: int = 224) -> tuple:
    """Smallest-max-size resize + random crop + hflip + ColorJitter(brightness
    0.4, contrast 0.4, saturation 0.2, hue 0.1, p=0.8) + ToGray(p=0.2) +
    GaussianBlur(p=0.1) — the reference's consumed albumentations stack
    (dataset/__init__.py:10-26; the train loop only uses one view)."""
    from PIL import Image as PILImage
    H, W = image.shape[:2]
    scale = resize_size / min(H, W)
    newH, newW = max(int(round(H * scale)), crop_size), max(int(round(W * scale)), crop_size)
    image = np.array(PILImage.fromarray(image).resize((newW, newH), PILImage.BICUBIC))
    seg = np.array(PILImage.fromarray(seg.astype(np.uint8)).resize(
        (newW, newH), PILImage.NEAREST)).astype(np.int64)
    y0 = int(rng.integers(0, newH - crop_size + 1))
    x0 = int(rng.integers(0, newW - crop_size + 1))
    image = image[y0:y0 + crop_size, x0:x0 + crop_size]
    seg = seg[y0:y0 + crop_size, x0:x0 + crop_size]
    if rng.random() < 0.5:
        image, seg = image[:, ::-1], seg[:, ::-1]
    if rng.random() < 0.8:  # ColorJitter(0.4, 0.4, 0.2, 0.1, p=0.8)
        img = image.astype(np.float32)
        img = img * (1 + rng.uniform(-0.4, 0.4))                     # brightness
        mean = img.mean()
        img = (img - mean) * (1 + rng.uniform(-0.4, 0.4)) + mean     # contrast
        gray = img.mean(-1, keepdims=True)
        img = (img - gray) * (1 + rng.uniform(-0.2, 0.2)) + gray     # saturation
        img = _hue_shift(np.clip(img, 0, 255), rng.uniform(-0.1, 0.1))  # hue
        image = np.clip(img, 0, 255).astype(np.uint8)
    if rng.random() < 0.2:  # ToGray(p=0.2)
        gray = image.astype(np.float32) @ np.array([0.299, 0.587, 0.114],
                                                   np.float32)
        image = np.repeat(np.clip(gray, 0, 255).astype(np.uint8)[..., None],
                          3, axis=-1)
    if rng.random() < 0.1:  # GaussianBlur(p=0.1), cv2-default kernel 3..7
        ksize = int(rng.choice([3, 5, 7]))
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8  # cv2 default sigma
        image = _gaussian_blur(image, ksize, sigma)
    return normalize_image(np.ascontiguousarray(image)), np.ascontiguousarray(seg)


def _hue_shift(img: np.ndarray, factor: float) -> np.ndarray:
    """Rotate hue by `factor` turns (ColorJitter hue semantics): RGB->HSV,
    H += factor, ->RGB. `img` float32 in [0, 255]."""
    if abs(factor) < 1e-8:
        return img
    x = img / 255.0
    mx, mn = x.max(-1), x.min(-1)
    v = mx
    s = np.where(mx > 0, (mx - mn) / np.maximum(mx, 1e-12), 0.0)
    c = mx - mn
    safe_c = np.maximum(c, 1e-12)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    h = np.where(mx == r, ((g - b) / safe_c) % 6,
                 np.where(mx == g, (b - r) / safe_c + 2, (r - g) / safe_c + 4)) / 6.0
    h = np.where(c > 0, h, 0.0)
    h = (h + factor) % 1.0
    # HSV -> RGB, vectorized
    i = np.floor(h * 6).astype(np.int32) % 6
    f = h * 6 - np.floor(h * 6)
    p, q, t = v * (1 - s), v * (1 - s * f), v * (1 - s * (1 - f))
    lut = np.stack([np.stack([v, t, p], -1), np.stack([q, v, p], -1),
                    np.stack([p, v, t], -1), np.stack([p, q, v], -1),
                    np.stack([t, p, v], -1), np.stack([v, p, q], -1)], 0)
    out = np.take_along_axis(lut, i[None, ..., None], axis=0)[0]
    return out * 255.0


def _gaussian_blur(img_u8: np.ndarray, ksize: int, sigma: float) -> np.ndarray:
    """Separable Gaussian blur with reflect padding (cv2.GaussianBlur-style)."""
    r = ksize // 2
    xs = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    k /= k.sum()
    img = img_u8.astype(np.float32)
    img = np.pad(img, ((r, r), (r, r), (0, 0)), mode="reflect")
    img = np.apply_along_axis(lambda m: np.convolve(m, k, mode="valid"), 0, img)
    img = np.apply_along_axis(lambda m: np.convolve(m, k, mode="valid"), 1, img)
    return np.clip(img, 0, 255).astype(np.uint8)


# ------------------------------------------------------- cluster-matching eval

def evaluate_segments(dataset, n_clusters: int = 21,
                      num_classes: int = VOC_NUM_CLASSES,
                      ignore_index: int = 255):
    """Dataset-wide eval of pseudolabel segmaps vs GT with Hungarian (when
    n_clusters == n_classes) or majority-vote matching
    (reference: eval.py:87-159). Returns (miou, per_class_jaccard, match)."""
    preds_all, gts_all = [], []
    for i in range(len(dataset)):
        _, seg, target, _ = dataset[i]
        if target is None:
            continue
        valid = target != ignore_index
        preds_all.append(seg[valid])
        gts_all.append(target[valid])
    flat_preds = np.concatenate(preds_all)
    flat_targets = np.concatenate(gts_all)
    if n_clusters == num_classes:
        match = M.hungarian_match(flat_preds, flat_targets, n_clusters, num_classes)
    else:
        match = M.majority_vote(flat_preds, flat_targets, n_clusters, num_classes)
    remapped = M.apply_label_map(flat_preds, match)
    jac, miou = M.per_class_jaccard(jnp.asarray(remapped),
                                    jnp.asarray(flat_targets), num_classes)
    return float(miou), np.asarray(jac), match


def visualize_overlays(dataset, match, output_dir, max_images: int = 40):
    """Render pseudolabel/GT overlay images (the reference's label2rgb
    visualization of 40 images, eval.py:57-84), as PNG files."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    cmap = matplotlib.colormaps["tab20"].resampled(21)
    lut = None
    if match is not None:
        lut = np.arange(max(m[0] for m in match) + 1)
        for pred_c, gt_c in match:
            lut[pred_c] = gt_c
    n = min(len(dataset), max_images)
    for i in range(n):
        image, seg, target, stem = dataset[i]
        if lut is not None:
            seg = lut[np.clip(seg, 0, len(lut) - 1)]
        ncols = 3 if target is not None else 2
        fig, axes = plt.subplots(1, ncols, figsize=(5 * ncols, 5))
        axes[0].imshow(image)
        axes[0].set_title(stem)
        overlay = cmap(seg % 21)[..., :3]
        blend = 0.55 * image / 255.0 + 0.45 * overlay
        blend[seg == 0] = (image / 255.0)[seg == 0]
        axes[1].imshow(blend)
        axes[1].set_title("pred")
        if target is not None:
            gt_overlay = cmap(np.clip(target, 0, 20) % 21)[..., :3]
            gt_blend = 0.55 * image / 255.0 + 0.45 * gt_overlay
            gt_blend[target == 0] = (image / 255.0)[target == 0]
            axes[2].imshow(gt_blend)
            axes[2].set_title("gt")
        for ax in axes:
            ax.axis("off")
        fig.savefig(out / f"{stem}.png", bbox_inches="tight", dpi=80)
        plt.close(fig)
    print(f"Wrote {n} overlays to {out}")


def supports_bucketed_eval(state: "TrainState") -> bool:
    """Bucketed (shape-padded) evaluation needs per-image interpolated ViT
    position embeddings; ResNet backbones take the per-image path."""
    try:
        return "pos_embed" in state.params["backbone"]
    except (KeyError, TypeError):
        return False


def _state_patch_size(state: "TrainState") -> Optional[int]:
    """Patch size read off the ViT patch-embed kernel (P, P, 3, D) in the
    train state — so eval paths can't silently use a wrong default."""
    try:
        return int(state.params["backbone"]["patch_embed"]["kernel"].shape[0])
    except (KeyError, TypeError, AttributeError):
        return None


def generate_predictions(state: "TrainState", dataset, output_dir,
                         max_images: Optional[int] = None,
                         bucketed: Optional[bool] = None, batch_size: int = 8,
                         patch_size: Optional[int] = None):
    """Dump model predictions (and GT when present) as PNGs — the reference's
    `generate` job (train.py:351-388). bucketed=None (default) auto-selects:
    ViT backbones batch through padded shape buckets (O(buckets) compiles
    instead of one per distinct image shape; pixel-exact, see
    bucketed_predictions), ResNet backbones take the per-image path."""
    out = Path(output_dir)
    (out / "pred").mkdir(parents=True, exist_ok=True)
    (out / "gt").mkdir(parents=True, exist_ok=True)
    from ..utils.serialization import save_segmap_png
    n = len(dataset) if max_images is None else min(len(dataset), max_images)
    if bucketed is None:
        bucketed = supports_bucketed_eval(state)
    if patch_size is None:
        patch_size = _state_patch_size(state) or 16

    def save(i, pred, item):
        _, _, target, stem = item
        save_segmap_png(pred.astype(np.uint8), out / "pred" / f"{stem}.png")
        if target is not None:
            save_segmap_png(np.asarray(target, np.uint8), out / "gt" / f"{stem}.png")

    if bucketed:
        for i, pred, item in bucketed_predictions(state, dataset,
                                                  list(range(n)),
                                                  patch_size=patch_size,
                                                  batch_size=batch_size,
                                                  yield_items=True):
            save(i, pred, item)
    else:
        for i in range(n):
            item = dataset[i]
            x = normalize_image(item[0])[None]
            P = patch_size
            H, W = x.shape[1:3]
            pred = np.asarray(eval_step(state, jnp.asarray(
                x[:, : (H // P) * P, : (W // P) * P])))[0]
            save(i, pred, item)
    print(f"Wrote {n} predictions to {out}")


# ------------------------------------------------------------- train state

class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)


@dataclasses.dataclass
class TrainConfig:
    """Mirrors config/train.yaml's knobs."""
    backbone: str = "dino_vits16"
    num_classes: int = VOC_NUM_CLASSES
    lr: float = 5e-3
    weight_decay: float = 1e-8
    max_train_steps: int = 5000
    warmup_steps: int = 0
    unfrozen_backbone_layers: int = 1
    gradient_accumulation_steps: int = 1
    clip_grad_norm: Optional[float] = None
    use_ema: bool = False
    ema_decay: float = 0.999
    crop_size: int = 224
    resize_size: int = 256
    batch_size: int = 16
    # Host-side augmentation workers feeding the device (the reference's
    # DataLoader num_workers=8, train.py via config loader_batch_size). With 1
    # worker the producer thread bottlenecks the TPU at realistic batch sizes
    # (PIL decode + augment ~ tens of ms per image, single-threaded).
    num_workers: int = 4
    seed: int = 1
    remat: bool = False  # rematerialize backbone activations (big batches)
    # 'fp32' or 'bf16': bf16 backbone/head compute with fp32 params, norms and
    # loss — the TPU analogue of the reference's fp16 Accelerator (train.py:29).
    precision: str = "fp32"


def _backbone_patch_size(cfg: TrainConfig) -> int:
    """Patch size of the configured ViT backbone (16 for ResNet, whose eval
    path crops to 16-multiples like the reference's default downsample)."""
    if isinstance(cfg.backbone, str) and "resnet" in cfg.backbone:
        return 16
    vit_cfg = cfg.backbone if not isinstance(cfg.backbone, str) \
        else get_model_config(cfg.backbone)
    return vit_cfg.patch_size


def build_model(cfg: TrainConfig):
    if cfg.precision not in ("fp32", "bf16"):
        raise ValueError(f"precision must be 'fp32' or 'bf16', got {cfg.precision!r}")
    dtype = jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32
    if isinstance(cfg.backbone, str) and "resnet" in cfg.backbone:
        from ..models.deeplab import DeepLabResNet
        return DeepLabResNet(cfg.num_classes)
    vit_cfg = cfg.backbone if not isinstance(cfg.backbone, str) \
        else get_model_config(cfg.backbone)
    return DeepLabViT(vit_cfg, cfg.num_classes, compute_dtype=dtype,
                      remat=cfg.remat)


def create_train_state(cfg: TrainConfig, model: DeepLabViT,
                       backbone_params: Optional[dict] = None) -> TrainState:
    # Eager flax init through a remote backend costs ~45-50 s of per-op RPCs
    # (r5d measurement on the ViT init); run it on the host CPU backend and
    # ship the finished pytree to the default device in one bulk transfer.
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    default = jax.devices()[0]
    with jax.default_device(cpu if cpu is not None else default):
        rng = jax.random.PRNGKey(cfg.seed)
        dummy = jnp.zeros((1, cfg.crop_size, cfg.crop_size, 3), jnp.float32)
        variables = model.init(rng, dummy, train=False)
    if cpu is not None and default.platform != "cpu":
        variables = jax.device_put(variables, default)
    params = variables["params"]
    if backbone_params is not None:
        params = dict(params)
        params["backbone"] = backbone_params["params"]
        params = FrozenDict(params) if isinstance(variables["params"], FrozenDict) else params
    batch_stats = variables.get("batch_stats", {})

    schedule = optax.warmup_linear_schedule(
        0.0, cfg.lr, cfg.warmup_steps, cfg.max_train_steps) \
        if cfg.warmup_steps else optax.linear_schedule(
            cfg.lr, 0.0, cfg.max_train_steps)
    steps = []
    if cfg.clip_grad_norm:
        steps.append(optax.clip_by_global_norm(cfg.clip_grad_norm))
    steps.append(optax.adamw(schedule, weight_decay=cfg.weight_decay))
    tx = optax.chain(*steps)
    depth = model.vit_cfg.depth if hasattr(model, "vit_cfg") else 4
    labels = backbone_param_labels(params, cfg.unfrozen_backbone_layers, depth)
    tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    opt_state = tx.init(params)
    # EMA starts as a COPY of params — aliasing them would donate the same
    # buffer twice in the donated train_step.
    ema = jax.tree.map(jnp.array, params) if cfg.use_ema else None
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state,
                      ema_params=ema, tx=tx, apply_fn=model.apply)


@partial(jax.jit, static_argnames=("use_ema", "ema_decay"), donate_argnums=(0,))
def train_step(state: TrainState, images: jax.Array, labels: jax.Array,
               rng: jax.Array, use_ema: bool = False, ema_decay: float = 0.999):
    """One optimization step: CE vs pseudolabels (reference: train.py:204-228).
    Shard `images`/`labels` over the mesh's data axis for DP; BN stats reduce
    across the global batch automatically."""

    def loss_fn(params):
        logits, mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            images, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        # One-hot CE instead of optax's integer-label version: the latter's
        # take_along_axis lowers to a per-pixel scalar gather on TPU that
        # profiled at 24.5 ms/step = 59% of the ENTIRE b32 train step
        # (scripts/profile_train_step.py); the one-hot multiply-sum is a
        # vectorized sub-ms fusion with identical math.
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype)
        ce = -jnp.sum(onehot * logp, axis=-1)
        return jnp.mean(ce), (mutated["batch_stats"], logits)

    (loss, (new_bs, logits)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    # NaN guard: on a non-finite loss the grads are non-finite too, so EVERY
    # branch of the update (params, Adam moments, BN stats, EMA) is poisoned —
    # revert all of them, not just params (reference exits on NaN,
    # train.py:213-216; we keep training on the last good state instead).
    ok = jnp.isfinite(loss)

    def revert(new, old):
        return jax.tree.map(lambda n, o: jnp.where(ok, n, o), new, old)

    new_params = revert(new_params, state.params)
    new_opt = revert(new_opt, state.opt_state)
    new_bs = revert(new_bs, state.batch_stats)
    ema = state.ema_params
    if use_ema and ema is not None:
        new_ema = jax.tree.map(lambda e, p: ema_decay * e + (1 - ema_decay) * p,
                               ema, new_params)
        ema = revert(new_ema, ema)
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    new_state = state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_bs, opt_state=new_opt,
                              ema_params=ema)
    return new_state, {"loss": loss, "acc": acc}


@jax.jit
def eval_step(state: TrainState, images: jax.Array) -> jax.Array:
    logits = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        images, train=False)
    return jnp.argmax(logits, axis=-1)


# ------------------------------------------------- bucket-padded evaluation
#
# The reference evaluates val images one at a time at native resolution
# (train.py:278-348, batch-size-1). Under XLA that costs one compilation per
# distinct image shape — 40-300 s each over a remote-compile link. The
# bucketed path pads images into <= 2 shape buckets (landscape/portrait
# elementwise-max) and keeps padding EXACTLY inert:
#   * per-image pos embeds are interpolated to the image's own grid on the
#     host and placed at the valid token positions (pos_embed_override);
#   * attention is token-masked; head convs re-zero padded cells after every
#     conv (see ConvBNReLU), so zero-padding at the valid border behaves like
#     an unpadded forward's conv padding;
#   * grid logits are edge-replicated into the padded cells before the final
#     bilinear upsample, reproducing the unpadded resize's edge clamp.
# tests/test_train_e2e.py asserts pixel-exact agreement with per-image eval.

@partial(jax.jit, static_argnames=("patch_size",))
def eval_step_bucketed(state: TrainState, images: jax.Array, vhw: jax.Array,
                       pos: jax.Array, patch_size: int = 16) -> jax.Array:
    """images: (B, Hb, Wb, 3) zero-padded batch; vhw: (B, 2) valid pixel dims
    (multiples of patch_size); pos: (B, 1+hp*wp, D) per-image pos embeds.
    Returns (B, Hb, Wb) int predictions (valid within each image's region)."""
    B, Hb, Wb, _ = images.shape
    P = patch_size
    hp, wp = Hb // P, Wb // P
    vh, vw = vhw[:, 0] // P, vhw[:, 1] // P
    gm = (jnp.arange(hp)[None, :, None] < vh[:, None, None]) & \
         (jnp.arange(wp)[None, None, :] < vw[:, None, None])  # (B, hp, wp)
    grid = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        images, train=False, spatial_mask=gm, pos_embed_override=pos,
        return_grid=True)  # (B, hp, wp, C)
    # Edge-replicate each image's valid grid into its padding.
    ii = jnp.minimum(jnp.arange(hp)[None, :], vh[:, None] - 1)  # (B, hp)
    jj = jnp.minimum(jnp.arange(wp)[None, :], vw[:, None] - 1)  # (B, wp)
    rep = grid[jnp.arange(B)[:, None, None], ii[:, :, None], jj[:, None, :]]
    logits = resize_bilinear(rep, (Hb, Wb))
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def _eval_buckets(shapes):
    """<= 2 bucket shapes: elementwise max over landscape / portrait groups
    (every image fits its orientation's bucket by construction)."""
    buckets = []
    for grp in ([s for s in shapes if s[1] >= s[0]],
                [s for s in shapes if s[1] < s[0]]):
        if grp:
            buckets.append((max(h for h, _ in grp), max(w for _, w in grp)))
    return sorted(set(buckets))


def _pos_for_bucket(pos_embed: np.ndarray, vh: int, vw: int, hp: int, wp: int,
                    cache: dict) -> np.ndarray:
    """Interpolate stored pos embeds to the image's own (vh, vw) grid — exactly
    what an unpadded forward computes — and embed at the bucket's valid token
    positions (padding gets zeros; those tokens are attention-masked and their
    features zeroed). Runs on the CPU backend (tiny op; avoids remote compiles)."""
    key = (vh, vw, hp, wp)
    if key not in cache:
        from ..models.vit import interpolate_pos_embed
        grid = int(round((pos_embed.shape[1] - 1) ** 0.5))
        with jax.default_device(jax.devices("cpu")[0]):
            native = np.asarray(interpolate_pos_embed(
                jnp.asarray(pos_embed), grid, vh, vw))[0]  # (1+vh*vw, D)
        D = native.shape[-1]
        full = np.zeros((1 + hp * wp, D), np.float32)
        full[0] = native[0]
        patch = np.zeros((hp, wp, D), np.float32)
        patch[:vh, :vw] = native[1:].reshape(vh, vw, D)
        full[1:] = patch.reshape(-1, D)
        cache[key] = full
    return cache[key]


def bucketed_predictions(state: TrainState, dataset, indices,
                         patch_size: Optional[int] = None, batch_size: int = 8,
                         yield_items: bool = False):
    """Yield (dataset_index, pred (H, W) int32) for each index — or
    (index, pred, dataset_item) with yield_items=True so callers that need
    the target/stem don't pay a second full decode per image — computed
    through <= 2 padded shape buckets (O(buckets) compiled programs instead
    of one per image shape). Requires a ViT backbone (pos_embed in params).

    The shape pass reads only PIL headers when the dataset exposes image
    paths (`.images`); each image is fully decoded exactly once, during
    batch assembly."""
    P = patch_size if patch_size is not None else (_state_patch_size(state) or 16)
    backbone = state.params["backbone"]
    if "pos_embed" not in backbone:
        raise ValueError("bucketed evaluation requires a ViT backbone")
    pos_embed = np.asarray(backbone["pos_embed"], np.float32)
    shapes = {}
    paths = getattr(dataset, "images", None)
    if paths is not None:
        from PIL import Image as PILImage
        for i in indices:
            with PILImage.open(paths[i]) as im:
                Wd, Hd = im.size
            shapes[i] = ((Hd // P) * P, (Wd // P) * P)
    else:
        for i in indices:
            image, _, _, _ = dataset[i]
            shapes[i] = ((image.shape[0] // P) * P, (image.shape[1] // P) * P)
    buckets = _eval_buckets(list(shapes.values()))
    assign: dict = {b: [] for b in buckets}
    for i, s in shapes.items():
        fits = [b for b in buckets if b[0] >= s[0] and b[1] >= s[1]]
        assign[min(fits, key=lambda b: b[0] * b[1])].append(i)
    pos_cache: dict = {}
    for (Hb, Wb), idxs in assign.items():
        if not idxs:
            continue
        hp, wp = Hb // P, Wb // P
        for c0 in range(0, len(idxs), batch_size):
            chunk = idxs[c0:c0 + batch_size]
            n_real = len(chunk)
            padded_chunk = chunk + [chunk[-1]] * (batch_size - n_real)
            ims = np.zeros((batch_size, Hb, Wb, 3), np.float32)
            vhw = np.zeros((batch_size, 2), np.int32)
            pos = np.zeros((batch_size, 1 + hp * wp, pos_embed.shape[-1]),
                           np.float32)
            items = {}
            for bi, i in enumerate(padded_chunk):
                item = items.get(i)
                if item is None:
                    item = dataset[i]
                    if bi < n_real:
                        items[i] = item
                image = item[0]
                H, W = shapes[i]
                ims[bi, :H, :W] = normalize_image(image[:H, :W])
                vhw[bi] = (H, W)
                pos[bi] = _pos_for_bucket(pos_embed, H // P, W // P, hp, wp,
                                          pos_cache)
            preds = np.asarray(eval_step_bucketed(
                state, jnp.asarray(ims), jnp.asarray(vhw), jnp.asarray(pos),
                patch_size=P))
            for bi, i in enumerate(chunk[:n_real]):
                H, W = shapes[i]
                if yield_items:
                    yield i, preds[bi, :H, :W], items[i]
                else:
                    yield i, preds[bi, :H, :W]


def evaluate_model(state: TrainState, dataset, num_classes: int = VOC_NUM_CLASSES,
                   ignore_index: int = 255, max_images: Optional[int] = None,
                   bucketed: Optional[bool] = None, batch_size: int = 8,
                   patch_size: Optional[int] = None):
    """Flat-pixel mIoU of model predictions vs GT, assuming the matching was
    already applied as the dataset label_map (reference: train.py:278-348,
    batch-size-1 semantics).

    bucketed=None (default) auto-selects: ViT backbones batch the val set
    through <= 2 padded shape buckets (O(buckets) compiled programs instead
    of one per image shape — the difference between seconds and hours on a
    remote-compile TPU for ~1400 distinct VOC shapes; pixel-exact vs the
    per-image path — see `bucketed_predictions`), ResNet backbones take the
    per-image path."""
    P = patch_size if patch_size is not None else (_state_patch_size(state) or 16)
    if bucketed is None:
        bucketed = supports_bucketed_eval(state)
    n = len(dataset) if max_images is None else min(len(dataset), max_images)
    preds_all, gts_all = [], []

    def accumulate(i, pred, target):
        Hp, Wp = pred.shape
        target_c = target[:Hp, :Wp]
        valid = target_c != ignore_index
        preds_all.append(pred[valid])
        gts_all.append(target_c[valid])

    if bucketed:
        tpaths = getattr(dataset, "targets", None)
        if tpaths is not None:
            indices = [i for i in range(n) if tpaths[i].is_file()]
        else:
            indices = [i for i in range(n) if dataset[i][2] is not None]
        for i, pred, item in bucketed_predictions(
                state, dataset, indices, patch_size=P, batch_size=batch_size,
                yield_items=True):
            accumulate(i, pred, item[2])
    else:
        for i in range(n):
            image, _, target, _ = dataset[i]
            if target is None:
                continue
            x = normalize_image(image)[None]
            # Crop to a multiple of the patch size for the ViT.
            H, W = x.shape[1:3]
            Hp, Wp = (H // P) * P, (W // P) * P
            pred = np.asarray(eval_step(state, jnp.asarray(x[:, :Hp, :Wp])))[0]
            accumulate(i, pred, target)
    flat_preds = np.concatenate(preds_all)
    flat_targets = np.concatenate(gts_all)
    jac, miou = M.per_class_jaccard(jnp.asarray(flat_preds),
                                    jnp.asarray(flat_targets), num_classes)
    return float(miou), np.asarray(jac)


# ----------------------------------------------------------- checkpointing

def _ckpt_tree(state: TrainState) -> dict:
    """Full resumable train state — model, BN stats, optimizer, optional EMA,
    step (the reference checkpoints model/EMA/optimizer/scheduler/epoch,
    train.py:143-152 / util.py:258-307; the optax schedule is part of
    opt_state so no separate scheduler entry is needed)."""
    tree = {"params": jax.tree.map(np.asarray, state.params),
            "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
            "opt_state": jax.tree.map(np.asarray, state.opt_state),
            "step": int(state.step)}
    if state.ema_params is not None:
        tree["ema_params"] = jax.tree.map(np.asarray, state.ema_params)
    return tree


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int,
                    keep_best: bool = False):
    """Orbax checkpoint of the full train state (reference torch checkpoints:
    train.py:141-156)."""
    import orbax.checkpoint as ocp
    path = Path(ckpt_dir).absolute() / ("best" if keep_best else f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _ckpt_tree(state), force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(ckpt_dir_or_path: str, state: TrainState) -> TrainState:
    import orbax.checkpoint as ocp
    path = Path(ckpt_dir_or_path).absolute()
    if not (path / "_CHECKPOINT_METADATA").exists():
        steps = sorted(path.glob("step_*"), key=lambda p: int(p.name.split("_")[1]))
        path = steps[-1] if steps else path / "best"
    ckptr = ocp.StandardCheckpointer()
    template = _ckpt_tree(state)
    # EMA presence may differ between the checkpoint and the current config
    # (e.g. resuming a use_ema run from a no-EMA checkpoint). Reconcile by
    # inspecting the checkpoint's saved tree keys from its metadata — a
    # deterministic check, instead of parsing orbax exception messages whose
    # wording changes across versions (ADVICE r2).
    try:
        saved_keys = set(ckptr.metadata(path).item_metadata.tree.keys())
    except Exception:
        saved_keys = None  # metadata unreadable: restore with the template as-is
    drop_ema = False
    if saved_keys is not None:
        if "ema_params" in template and "ema_params" not in saved_keys:
            template = {k: v for k, v in template.items() if k != "ema_params"}
            print("warning: checkpoint has no EMA state — EMA params keep "
                  "their current (re-initialized) values")
        elif "ema_params" not in template and "ema_params" in saved_keys:
            template = dict(template)
            template["ema_params"] = jax.tree.map(np.asarray, state.params)
            drop_ema = True
            print("warning: checkpoint contains EMA state but the current "
                  "config does not use EMA — ignoring it")
    restored = ckptr.restore(path, template)
    if drop_ema:
        restored.pop("ema_params", None)
    new = state.replace(
        params=jax.tree.map(jnp.asarray, restored["params"]),
        batch_stats=jax.tree.map(jnp.asarray, restored["batch_stats"]),
        opt_state=jax.tree.map(jnp.asarray, restored["opt_state"]),
        step=jnp.asarray(restored["step"], jnp.int32))
    if state.ema_params is not None and "ema_params" in restored:
        new = new.replace(ema_params=jax.tree.map(jnp.asarray,
                                                  restored["ema_params"]))
    return new


# ----------------------------------------------------------------- train loop

def train(cfg: TrainConfig, dataset_train, dataset_val=None,
          ckpt_dir: Optional[str] = None, eval_every: int = 1000,
          log_every: int = 50, max_steps: Optional[int] = None,
          backbone_params: Optional[dict] = None,
          metrics_path: Optional[str] = None,
          mesh=None, resume: Optional[str] = None):
    """Self-training loop (reference: train.py:136-254). Returns final state and
    the best validation mIoU.

    With `mesh` (a jax.sharding.Mesh), batches are sharded over the mesh's
    first axis and the state is replicated — data-parallel training with
    batch-global BN, replacing the reference's accelerate/DDP+SyncBatchNorm
    (train.py:78-82)."""
    from ..utils.logging import MetricWriter
    model = build_model(cfg)
    state = create_train_state(cfg, model, backbone_params)
    start_step = 0
    if resume:
        # Resume model/step from an orbax checkpoint (the reference's
        # resume_from_checkpoint, util.py:258-307). The loop continues from
        # the restored step so only the REMAINING steps run (the optax
        # schedule count is already advanced inside opt_state).
        state = restore_checkpoint(resume, state)
        start_step = int(state.step)
        print(f"Resumed from {resume} at step {start_step}")
    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        axis = mesh.axis_names[0]
        batch_sharding = NamedSharding(mesh, P(axis))
        state = jax.device_put(state, NamedSharding(mesh, P()))
        assert cfg.batch_size % mesh.shape[axis] == 0, \
            f"batch {cfg.batch_size} not divisible by mesh axis {axis}"
    rng = np.random.default_rng(cfg.seed)
    jrng = jax.random.PRNGKey(cfg.seed)
    steps = max_steps or cfg.max_train_steps
    best_miou = -1.0
    writer = MetricWriter(metrics_path) if metrics_path else None

    # Prefetching batch producers: dataset read + augmentation run in
    # cfg.num_workers threads ahead of the device (the reference's DataLoader
    # num_workers=8 analogue; PIL decode/resize release the GIL, so threads
    # overlap). Each worker shuffles with its own seeded rng; batch order is
    # deterministic per worker but interleaving across workers is not (same
    # property as a multi-worker DataLoader under prefetching).
    import queue
    import threading
    n_workers = max(int(getattr(cfg, "num_workers", 1)), 1)
    batch_q: "queue.Queue" = queue.Queue(maxsize=max(2, n_workers))
    stop = threading.Event()

    def producer(wid: int):
        rng_w = np.random.default_rng(cfg.seed + 7919 * wid)
        order = rng_w.permutation(len(dataset_train))
        cursor = 0
        while not stop.is_set():
            ims, segs = [], []
            for _ in range(cfg.batch_size):
                if cursor >= len(order):
                    order = rng_w.permutation(len(dataset_train))
                    cursor = 0
                image, seg, _, _ = dataset_train[int(order[cursor])]
                cursor += 1
                im, sg = train_augment(rng_w, image, seg, cfg.resize_size,
                                       cfg.crop_size)
                ims.append(im)
                segs.append(sg)
            batch = (np.stack(ims), np.stack(segs))
            while not stop.is_set():
                try:
                    batch_q.put(batch, timeout=0.25)
                    break
                except queue.Full:
                    continue

    threads = [threading.Thread(target=producer, args=(w,), daemon=True)
               for w in range(n_workers)]
    for t in threads:
        t.start()

    for step in range(start_step, steps):
        ims_np, segs_np = batch_q.get()
        jrng, sub = jax.random.split(jrng)
        images_b = jnp.asarray(ims_np)
        labels_b = jnp.asarray(segs_np)
        if batch_sharding is not None:
            images_b = jax.device_put(images_b, batch_sharding)
            labels_b = jax.device_put(labels_b, batch_sharding)
        state, logs = train_step(state, images_b, labels_b, sub,
                                 use_ema=cfg.use_ema, ema_decay=cfg.ema_decay)
        if log_every and step % log_every == 0:
            print(f"step {step}: loss={float(logs['loss']):.4f} "
                  f"acc={float(logs['acc']):.4f}")
        if writer is not None and step % max(log_every, 1) == 0:
            writer.log(step, loss=float(logs["loss"]), acc=float(logs["acc"]))
        if dataset_val is not None and eval_every and (step + 1) % eval_every == 0:
            # Bucketed eval (auto for ViT backbones): O(buckets) compiled
            # programs instead of one per distinct val-image shape
            # (reference eval: train.py:278-348).
            miou, _ = evaluate_model(state, dataset_val, cfg.num_classes,
                                     patch_size=_backbone_patch_size(cfg))
            print(f"step {step}: val mIoU={miou:.4f}")
            if writer is not None:
                writer.log(step, val_miou=miou)
            if miou > best_miou:
                best_miou = miou
                if ckpt_dir:
                    save_checkpoint(ckpt_dir, state, step + 1, keep_best=True)
        if ckpt_dir and (step + 1) % max(eval_every, 1000) == 0:
            save_checkpoint(ckpt_dir, state, step + 1)
    stop.set()
    for t in threads:
        t.join(timeout=2.0)
    if writer is not None:
        writer.close()
    return state, best_miou

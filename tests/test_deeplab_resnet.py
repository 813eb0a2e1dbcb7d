"""DeepLab-ResNet variant + on-the-fly localization methods."""
import numpy as np
import jax
import jax.numpy as jnp

from deep_spectral_tpu.tasks import semantic_segmentation as SS
from deep_spectral_tpu.tasks import localization as L
from deep_spectral_tpu.models import ViTConfig, VisionTransformer, init_vit_params


def test_deeplab_resnet_forward_and_freeze():
    cfg = SS.TrainConfig(backbone="resnet50", num_classes=3, crop_size=32,
                         batch_size=2, unfrozen_backbone_layers=1)
    model = SS.build_model(cfg)
    state = SS.create_train_state(cfg, model)
    x = jnp.zeros((1, 64, 64, 3))
    logits = state.apply_fn({"params": state.params,
                             "batch_stats": state.batch_stats}, x, train=False)
    assert logits.shape == (1, 64, 64, 3)
    # freeze labels: layer4 trains, layers 1-3 + stem freeze
    from deep_spectral_tpu.models.deeplab import backbone_param_labels
    labels = backbone_param_labels(state.params, 1, 4)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    got = {"/".join(str(getattr(p, "key", p)) for p in path): v
           for path, v in flat}
    assert any(k.startswith("backbone/layer4_") and v == "train"
               for k, v in got.items())
    assert all(v == "freeze" for k, v in got.items()
               if k.startswith("backbone/layer1_"))
    assert all(v == "train" for k, v in got.items() if k.startswith("head/"))


def test_discover_box_methods(rng):
    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, img_size=32)
    model, params = init_vit_params(cfg)
    image = (rng.random((80, 96, 3)) * 255).astype(np.uint8)
    for method in ["eigenseg", "lost", "dino_seg"]:
        box = L.discover_box(image, model, params, method=method, patch_size=8)
        x0, y0, x1, y1 = box
        assert 0 <= x0 < x1 <= 96 and 0 <= y0 < y1 <= 80, (method, box)

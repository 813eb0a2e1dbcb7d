from .vit import (  # noqa: F401
    ViTConfig,
    VisionTransformer,
    VIT_CONFIGS,
    get_model_config,
    init_vit_params,
    vit_forward,
)
from .convert import convert_dino_torch_checkpoint  # noqa: F401

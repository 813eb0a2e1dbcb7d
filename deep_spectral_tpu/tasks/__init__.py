from . import localization, object_segmentation, semantic_segmentation  # noqa: F401

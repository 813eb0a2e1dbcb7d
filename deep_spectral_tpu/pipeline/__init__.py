from .extract import (  # noqa: F401
    extract_features,
    extract_eigs,
    extract_multi_region_segmentations,
    extract_single_region_segmentations,
    extract_bboxes,
    extract_bbox_features,
    extract_bbox_clusters,
    extract_semantic_segmentations,
    extract_crf_segmentations,
    vis_segmentations,
)

from .affinity import (  # noqa: F401
    feature_affinity,
    knn_affinity,
    rw_affinity,
    degree_vector,
)
from .eigen import (  # noqa: F401
    laplacian_eigs,
    affinity_eigs,
    affinity_svd_eigs,
    sign_fix,
    spectral_decompose,
)
from .kmeans import kmeans, pca, KMeansResult  # noqa: F401
from .morphology import (  # noqa: F401
    binary_erode,
    binary_dilate,
    erode_or_dilate_mask,
    label_components,
    largest_component,
    largest_component_bbox,
    mask_bbox,
    get_border_fraction,
    infer_background_swap,
)
from . import metrics, resize  # noqa: F401

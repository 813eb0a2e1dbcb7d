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

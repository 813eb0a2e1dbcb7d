"""Native C++ connected-component labeler vs scipy.ndimage oracle."""
import numpy as np
import pytest
import scipy.ndimage as ndi

from deep_spectral_tpu.utils import native_cc


@pytest.fixture(scope="module", autouse=True)
def require_native():
    assert native_cc._build_lib() is not None, "g++ build of cc_label failed"


@pytest.mark.parametrize("connectivity", [1, 2])
def test_cc_label_matches_scipy(connectivity):
    rng = np.random.default_rng(0)
    for trial in range(5):
        m = rng.random((60, 80)) < 0.45
        labels, num = native_cc.cc_label(m, connectivity)
        structure = np.ones((3, 3)) if connectivity == 2 else None
        ref, ref_num = ndi.label(m, structure=structure)
        assert num == ref_num
        np.testing.assert_array_equal(labels, ref)  # scipy-compatible numbering


def test_largest_component_matches_scipy():
    rng = np.random.default_rng(1)
    m = rng.random((100, 120)) < 0.4
    ours = native_cc.largest_component(m, connectivity=2)
    ref_labels, n = ndi.label(m, structure=np.ones((3, 3)))
    sizes = np.bincount(ref_labels.ravel())[1:]
    ref = ref_labels == (np.argmax(sizes) + 1)
    assert ours.sum() == ref.sum()


def test_empty_mask():
    m = np.zeros((10, 10), bool)
    labels, num = native_cc.cc_label(m)
    assert num == 0 and labels.max() == 0
    assert native_cc.largest_component(m).sum() == 0


def test_label_bboxes():
    labels = np.zeros((10, 12), np.int32)
    labels[1:4, 2:5] = 1
    labels[6:9, 7:11] = 2
    boxes = native_cc.label_bboxes(labels, 2)
    np.testing.assert_array_equal(boxes[0], [2, 1, 5, 4])
    np.testing.assert_array_equal(boxes[1], [7, 6, 11, 9])


def test_large_mask_performance():
    """2000x2000 mask labels in well under a second."""
    import time
    rng = np.random.default_rng(2)
    m = rng.random((2000, 2000)) < 0.5
    t0 = time.perf_counter()
    labels, num = native_cc.cc_label(m, 2)
    dt = time.perf_counter() - t0
    # Generous bound: absorbs CI load spikes; native time is ~50ms.
    assert dt < 5.0, f"too slow: {dt}s"
    assert num > 0

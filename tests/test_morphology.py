"""Morphology + connected components vs scipy.ndimage oracles."""
import numpy as np
import jax.numpy as jnp
import scipy.ndimage as ndi

from deep_spectral_tpu.ops import (
    binary_erode, binary_dilate, erode_or_dilate_mask, label_components,
    largest_component, largest_component_bbox, mask_bbox,
    get_border_fraction, infer_background_swap,
)


def _random_mask(rng, h=20, w=24, p=0.45):
    return rng.random((h, w)) < p


def _labels_equivalent(a, b):
    """Two labelings define the same partition (labels may differ)."""
    a, b = np.asarray(a), np.asarray(b)
    if not np.array_equal(a > 0, b > 0):
        return False
    pairs = set(zip(a[a > 0].tolist(), b[b > 0].tolist()))
    return (len({p[0] for p in pairs}) == len(pairs)
            and len({p[1] for p in pairs}) == len(pairs))


def test_erosion_matches_scipy(rng):
    m = _random_mask(rng)
    ours = np.asarray(binary_erode(jnp.asarray(m)))
    # skimage pads with 1 for erosion (border-preserving); scipy's border_value=1
    # reproduces that.
    ref = ndi.binary_erosion(m, structure=ndi.generate_binary_structure(2, 1),
                             border_value=1)
    np.testing.assert_array_equal(ours, ref)


def test_dilation_matches_scipy(rng):
    m = _random_mask(rng, p=0.2)
    ours = np.asarray(binary_dilate(jnp.asarray(m)))
    ref = ndi.binary_dilation(m, structure=ndi.generate_binary_structure(2, 1),
                              border_value=0)
    np.testing.assert_array_equal(ours, ref)


def test_erode_guard_never_empties():
    m = np.zeros((10, 10), bool)
    m[4, 4] = True  # single pixel would vanish after one erosion
    out = np.asarray(erode_or_dilate_mask(jnp.asarray(m), r=3, erode=True))
    assert out.sum() > 0
    np.testing.assert_array_equal(out, m)


def test_label_components_4conn_matches_scipy(rng):
    m = _random_mask(rng)
    ours = label_components(jnp.asarray(m), connectivity=1)
    ref, _ = ndi.label(m)  # scipy default structure = 4-connectivity
    assert _labels_equivalent(ours, ref)


def test_label_components_8conn_matches_scipy(rng):
    m = _random_mask(rng)
    ours = label_components(jnp.asarray(m), connectivity=2)
    ref, _ = ndi.label(m, structure=np.ones((3, 3)))
    assert _labels_equivalent(ours, ref)


def test_largest_component_matches_scipy(rng):
    for seed in range(5):
        m = _random_mask(np.random.default_rng(seed), p=0.4)
        ours = np.asarray(largest_component(jnp.asarray(m)))
        labels, n = ndi.label(m, structure=np.ones((3, 3)))
        if n == 0:
            assert ours.sum() == 0
            continue
        sizes = np.bincount(labels.ravel())[1:]
        ref = labels == (np.argmax(sizes) + 1)
        # Ties in component size may pick a different component; compare sizes.
        assert ours.sum() == ref.sum()
        if sizes.max() != sorted(sizes)[-2] if len(sizes) > 1 else True:
            np.testing.assert_array_equal(ours, ref)


def test_mask_bbox():
    m = np.zeros((10, 12), bool)
    m[2:5, 3:9] = True
    box = np.asarray(mask_bbox(jnp.asarray(m)))
    np.testing.assert_array_equal(box, [3, 2, 9, 5])  # xmin, ymin, xmax(+1), ymax(+1)
    assert np.asarray(mask_bbox(jnp.zeros((4, 4), bool))).tolist() == [0, 0, 0, 0]


def test_largest_component_bbox():
    m = np.zeros((12, 12), bool)
    m[1:3, 1:3] = True      # small blob (4 px)
    m[5:11, 5:10] = True    # big blob (30 px)
    box = np.asarray(largest_component_bbox(jnp.asarray(m)))
    np.testing.assert_array_equal(box, [5, 5, 10, 11])


def test_border_fraction_and_bg_swap():
    seg = np.ones((8, 10), np.int32) * 2   # border-dominant segment = 2
    seg[3:5, 3:7] = 1
    seg[0, 0] = 0
    counts, frac = get_border_fraction(jnp.asarray(seg), 4)
    assert counts.sum() == 2 * (8 + 10)
    assert int(np.argmax(np.asarray(frac))) == 2
    out = np.asarray(infer_background_swap(jnp.asarray(seg), 4))
    # segment 2 -> 0, old 0 -> 2
    assert out[4, 1] == 0 and seg[4, 1] == 2
    assert out[0, 0] == 2 and seg[0, 0] == 0
    assert out[3, 3] == 1

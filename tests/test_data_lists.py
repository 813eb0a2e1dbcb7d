"""Vendored VOC image lists (reference: extract/data/VOC*/lists/images.txt).

Positional pairing (reference: semantic-segmentation/dataset/voc.py:112-131)
makes exact list membership AND order load-bearing; these tests pin the
vendored copies byte-for-byte via checksum and the order property the
pairing relies on.
"""
import pytest

from deep_spectral_tpu.data import (VOC_LIST_LENGTHS, VOC_LIST_SHA256,
                                    voc_image_list, voc_list_path)


@pytest.mark.parametrize("dataset", ["VOC2007", "VOC2012"])
def test_vendored_list_verified(dataset):
    names = voc_image_list(dataset)  # verify=True checks the sha256
    assert len(names) == VOC_LIST_LENGTHS[dataset]
    assert all(n.endswith(".jpg") for n in names)
    assert len(set(names)) == len(names), "duplicate entries"
    # The reference pairs segment files to image files by SORTED position;
    # the vendored list must already be in sorted order for a pipeline run
    # over it to reproduce the reference pairing.
    assert names == sorted(names)


def test_corrupt_list_rejected(tmp_path, monkeypatch):
    import deep_spectral_tpu.data as data_mod
    bad = tmp_path / "VOC2007" / "lists"
    bad.mkdir(parents=True)
    (bad / "images.txt").write_text("tampered.jpg\n")
    monkeypatch.setattr(data_mod, "_DATA_DIR", tmp_path)
    with pytest.raises(ValueError, match="corrupt"):
        data_mod.voc_image_list("VOC2007")


def test_known_reference_entries():
    """Spot-pin first/last entries (byte-identical to the reference lists)."""
    v12 = voc_image_list("VOC2012")
    assert v12[0] == "2007_000027.jpg"
    v07 = voc_image_list("VOC2007")
    assert len(v07) == 5011
    assert voc_list_path("VOC2007").is_file()
    assert set(VOC_LIST_SHA256) == {"VOC2007", "VOC2012"}

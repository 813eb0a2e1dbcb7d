"""Interactive viewer server (pipeline/vis_server.py — the streamlit-app
equivalent, reference: extract/extract.py:738-834): endpoint behavior over a
tiny synthetic output tree, id-keyed (never positional) pairing, and the
no-traversal guarantee."""
import json
import threading
import urllib.error
import urllib.request
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from deep_spectral_tpu.pipeline.vis_server import PALETTE, make_vis_server
from deep_spectral_tpu.utils.serialization import save_pth


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("vis")
    (root / "images").mkdir()
    (root / "segs").mkdir()
    (root / "eigs").mkdir()
    rng = np.random.default_rng(0)
    # Image a: 96x64 (W x H) -> P=16 grid 4x6 = 24 tokens.
    Image.fromarray(rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)).save(
        root / "images" / "a.jpg")
    Image.fromarray(rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)).save(
        root / "images" / "b.jpg")
    # Unsorted list (b first): pairing must be by id, not position.
    (root / "images.txt").write_text("b.jpg\na.jpg\n")
    seg = np.zeros((4, 6), np.uint8)
    seg[1:3, 2:5] = 1
    seg[3, 0] = 2
    Image.fromarray(seg).save(root / "segs" / "a.png")
    # b: the binary {0,255} convention used by single-region segmaps.
    segb = np.zeros((4, 6), np.uint8)
    segb[0, :3] = 255
    Image.fromarray(segb).save(root / "segs" / "b.png")
    save_pth({"eigenvalues": np.zeros(3, np.float32),
              "eigenvectors": rng.standard_normal((3, 24)).astype(np.float32)},
             root / "eigs" / "a.pth")
    save_pth([{"id": "a", "bboxes_original_resolution": [[5, 6, 40, 30]]}],
             root / "bboxes.pth")

    srv = make_vis_server(
        images_list=str(root / "images.txt"),
        images_root=str(root / "images"),
        segmentations_dir=str(root / "segs"),
        bbox_file=str(root / "bboxes.pth"),
        eigs_dir=str(root / "eigs"),
        port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def test_page_and_index(server):
    status, ctype, body = _get(server + "/")
    assert status == 200 and "text/html" in ctype
    assert b"api/index" in body

    status, ctype, body = _get(server + "/api/index")
    assert status == 200 and "application/json" in ctype
    items = json.loads(body)["items"]
    # List order preserved; ids resolved from filenames.
    assert [it["id"] for it in items] == ["b", "a"]
    by_id = {it["id"]: it for it in items}
    assert by_id["a"]["has_seg"] and by_id["a"]["has_eigs"]
    assert by_id["b"]["has_seg"] and not by_id["b"]["has_eigs"]
    # Boxes keyed by id (b has none even though it is first in the list).
    assert by_id["a"]["boxes"] == [[5, 6, 40, 30]]
    assert by_id["b"]["boxes"] is None


def test_image_endpoint(server):
    status, ctype, body = _get(server + "/image/a")
    assert status == 200 and ctype == "image/jpeg" and body[:2] == b"\xff\xd8"


def test_seg_overlay_png(server):
    import io
    status, ctype, body = _get(server + "/seg/a")
    assert status == 200 and ctype == "image/png"
    rgba = np.asarray(Image.open(io.BytesIO(body)))
    assert rgba.shape == (4, 6, 4)
    assert rgba[0, 0, 3] == 0  # background transparent
    assert rgba[1, 2, 3] == 255
    assert tuple(rgba[1, 2, :3]) == tuple(PALETTE[1])
    # Binary {0,255} segmap renders as label 1, not palette[255 % 21].
    status, _, body = _get(server + "/seg/b")
    rgba = np.asarray(Image.open(io.BytesIO(body)))
    assert tuple(rgba[0, 0, :3]) == tuple(PALETTE[1])


def test_eig_heatmap_native_resolution(server):
    import io
    status, ctype, body = _get(server + "/eig/a/1")
    assert status == 200 and ctype == "image/png"
    im = Image.open(io.BytesIO(body))
    assert im.size == (6, 4)  # (W_lr, H_lr): patch-native, client upsamples


@pytest.mark.parametrize("path", [
    "/image/zzz", "/seg/zzz", "/eig/a/9", "/eig/zzz/0",
    "/image/%2e%2e%2fimages.txt", "/other", "/api/nope",
])
def test_unknown_is_404_never_traversal(server, path):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(server + path)
    assert exc.value.code == 404

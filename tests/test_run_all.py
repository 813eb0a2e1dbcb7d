"""End-to-end run_all driver test on a 2-image synthetic set (CPU)."""
import numpy as np
from pathlib import Path
from PIL import Image

from deep_spectral_tpu.pipeline.run_all import run_all
from deep_spectral_tpu.utils.serialization import load_segmap_png


def test_run_all(tmp_path, capsys):
    images = tmp_path / "images"
    images.mkdir()
    rng = np.random.default_rng(3)
    names = []
    for i in range(2):
        img = (rng.random((96, 128, 3)) * 110).astype(np.uint8)
        img[30:70, 40:90] = [210, 60, 60]
        name = f"r{i}.jpg"
        Image.fromarray(img).save(images / name, quality=95)
        names.append(name)
    (tmp_path / "lists").mkdir()
    (tmp_path / "lists" / "images.txt").write_text("\n".join(names))

    dirs = run_all(
        images_list=str(tmp_path / "lists" / "images.txt"),
        images_root=str(images),
        output_root=str(tmp_path / "out"),
        num_clusters=2, crf_num_classes=3, non_adaptive_num_segments=2,
        feature_batch_size=2, batch_size=2, K=4,
    )
    # Every stage produced outputs in the canonical layout.
    for key in ["features", "eigs", "multi", "single", "semantic", "crf",
                "crf_single"]:
        assert Path(dirs[key]).exists(), key
        if Path(dirs[key]).is_dir():
            assert len(list(Path(dirs[key]).iterdir())) == 2, key
    assert Path(dirs["bbox_clusters"]).is_file()
    crf = load_segmap_png(sorted(Path(dirs["crf"]).iterdir())[0])
    assert crf.shape == (96, 128)
    out = capsys.readouterr().out
    assert "extract_features" in out and "items/s" in out  # StageTimer summary

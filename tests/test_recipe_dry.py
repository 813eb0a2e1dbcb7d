"""Real-weight CorLoc recipe, dry-verified (VERDICT r2 #10).

The README's one-command VOC07 CorLoc parity recipe must run unmodified the
day a real DINO checkpoint lands — this exercises the exact CLI path
(run_all --stop_after extract_eigs with the auto solver, then the
localization CLI over the precomputed eigs) on a synthetic VOC07-layout
smoke set, so the only missing input is the weights file itself.
Reference: object-localization/main.py:135-419 (CorLoc printout at :415-418).
"""
import numpy as np
from pathlib import Path
from PIL import Image


def _write_voc07_layout(root: Path, n: int = 3):
    (root / "JPEGImages").mkdir(parents=True)
    (root / "Annotations").mkdir()
    (root / "ImageSets" / "Main").mkdir(parents=True)
    (root / "lists").mkdir()
    rng = np.random.default_rng(11)
    ids = []
    for i in range(n):
        name = f"{i:06d}"
        H, W = 96, 128
        img = (rng.random((H, W, 3)) * 100).astype(np.uint8)
        y0, x0 = 32, 48
        img[y0:y0 + 32, x0:x0 + 48] = [225, 70, 60]  # bright blob = the object
        Image.fromarray(img).save(root / "JPEGImages" / f"{name}.jpg",
                                  quality=95)
        (root / "Annotations" / f"{name}.xml").write_text(f"""
<annotation><size><width>{W}</width><height>{H}</height></size>
<object><name>blob</name><truncated>0</truncated><difficult>0</difficult>
<bndbox><xmin>{x0 + 1}</xmin><ymin>{y0 + 1}</ymin><xmax>{x0 + 48}</xmax><ymax>{y0 + 32}</ymax></bndbox>
</object></annotation>""")
        ids.append(name)
    (root / "ImageSets" / "Main" / "trainval.txt").write_text("\n".join(ids))
    (root / "lists" / "images.txt").write_text(
        "\n".join(f"{i}.jpg" for i in ids))
    return ids


def test_corloc_recipe_cli_end_to_end(tmp_path, capsys):
    """README recipe step 2, verbatim module entry points: run_all to eigs
    (auto solver), then `tasks.cli localization --eigenseg
    --precomputed_eigs_dir ...` — must produce results.txt/preds.pkl/gt.pkl
    without any code path requiring real weights."""
    from deep_spectral_tpu.pipeline.run_all import run_all
    from deep_spectral_tpu.tasks.cli import main as tasks_main

    voc = tmp_path / "VOC2007"
    _write_voc07_layout(voc)
    dirs = run_all(
        images_list=str(voc / "lists" / "images.txt"),
        images_root=str(voc / "JPEGImages"),
        output_root=str(tmp_path / "out"),
        model_name="dino_vits16", K=5, feature_batch_size=2, batch_size=2,
        stop_after="extract_eigs",
    )
    eigs_dir = Path(dirs["eigs"])
    assert len(list(eigs_dir.iterdir())) == 3
    # Recipe stops at eigs: no downstream stage ran.
    assert not Path(dirs["multi"]).exists()

    out_dir = tmp_path / "loc_out"
    tasks_main([
        "localization",
        "--eigenseg",
        "--precomputed_eigs_dir", str(eigs_dir),
        "--dataset", "VOC07",
        "--set", "trainval",
        "--dataset_root", str(voc),
        "--output_dir", str(out_dir),
    ])
    assert (out_dir / "results.txt").is_file()
    assert (out_dir / "preds.pkl").is_file()
    assert (out_dir / "gt.pkl").is_file()
    text = (out_dir / "results.txt").read_text()
    assert "corloc" in text.lower()
    # Random-weight features don't guarantee meaningful Fiedler masks; the
    # dry run only proves the recipe executes end-to-end and reports a score.
    score = float(text.strip().split(",")[1])  # "corloc,<score>,<n>"
    assert 0.0 <= score <= 100.0


def test_real_weight_parity_script_dry_run():
    """VERDICT r3 #8: scripts/real_weight_parity.sh is the one-command parity
    run (features -> eigs -> eigenseg CorLoc -> delta vs the paper's 62.7).
    --dry-run exercises every command verbatim on a synthetic VOC07 layout,
    so the only missing input the day a checkpoint lands is the weights
    file itself."""
    import os
    import subprocess
    script = Path(__file__).resolve().parent.parent / "scripts" / "real_weight_parity.sh"
    assert script.is_file()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the subprocess off the TPU
    out = subprocess.run(["bash", str(script), "--dry-run"], env=env,
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "CorLoc:" in out.stdout and "delta" in out.stdout
    assert "parity target" in out.stdout

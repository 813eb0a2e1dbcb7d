#!/bin/bash
# One-command real-weight CorLoc parity run (VERDICT r3 #8).
#
# Given a real DINO checkpoint (DSS_TPU_DINO_CKPT_DIR/dino_vits16.pth) and a
# VOC2007 trainval layout, runs the full parity recipe — features -> eigs
# (auto solver) -> eigenseg localization — and prints the CorLoc delta vs
# the paper's 62.7 (BASELINE.md: parity target within 0.5 pts; reference
# object-localization/main.py:415-418 prints the same score).
#
# Usage:
#   DSS_TPU_DINO_CKPT_DIR=/path/to/ckpts \
#     scripts/real_weight_parity.sh /path/to/VOCdevkit/VOC2007 [output_root]
#
# Dry-run (no weights needed, synthetic smoke layout; proves the command
# path end-to-end): scripts/real_weight_parity.sh --dry-run
set -eu
cd "$(dirname "$0")/.."

PAPER_CORLOC=62.7
MODEL=dino_vits16

if [ "${1:-}" = "--dry-run" ]; then
    # Build the same synthetic VOC07 layout the dry-run test uses, and skip
    # the checkpoint requirement (random weights; score is meaningless but
    # every command below is exercised verbatim).
    VOC_ROOT=$(mktemp -d)/VOC2007
    python - "$VOC_ROOT" <<'EOF'
import sys
from pathlib import Path
sys.path.insert(0, "tests")
from test_recipe_dry import _write_voc07_layout
_write_voc07_layout(Path(sys.argv[1]))
EOF
    OUT_ROOT=$(mktemp -d)
    echo "dry-run: synthetic VOC07 layout at $VOC_ROOT"
else
    VOC_ROOT=${1:?usage: real_weight_parity.sh <VOC2007 root>|--dry-run [output_root]}
    OUT_ROOT=${2:-./outputs/real_weight_parity}
    CKPT=${DSS_TPU_DINO_CKPT_DIR:?set DSS_TPU_DINO_CKPT_DIR to the checkpoint dir}/$MODEL.pth
    [ -f "$CKPT" ] || { echo "missing checkpoint: $CKPT"; exit 1; }
    # Real VOC2007 has no lists/images.txt; derive it from the trainval split.
    if [ ! -f "$VOC_ROOT/lists/images.txt" ]; then
        mkdir -p "$VOC_ROOT/lists"
        sed 's/$/.jpg/' "$VOC_ROOT/ImageSets/Main/trainval.txt" \
            > "$VOC_ROOT/lists/images.txt"
    fi
fi

echo "--- [1/2] features + eigs (auto solver) ---"
python -m deep_spectral_tpu.pipeline.run_all \
    --images_list "$VOC_ROOT/lists/images.txt" \
    --images_root "$VOC_ROOT/JPEGImages" \
    --output_root "$OUT_ROOT" \
    --model_name $MODEL --K 5 \
    --stop_after extract_eigs

echo "--- [2/2] eigenseg CorLoc on VOC07 trainval ---"
python -m deep_spectral_tpu.tasks.cli localization \
    --eigenseg \
    --precomputed_eigs_dir "$OUT_ROOT/eigs/laplacian" \
    --dataset VOC07 --set trainval \
    --dataset_root "$VOC_ROOT" \
    --output_dir "$OUT_ROOT/localization"

python - "$OUT_ROOT/localization/results.txt" "$PAPER_CORLOC" <<'EOF'
import sys
line = open(sys.argv[1]).read().strip()       # "corloc,<score>,<n>"
score, paper = float(line.split(",")[1]), float(sys.argv[2])
print(f"CorLoc: {score:.2f}  (paper {paper:.1f}, delta {score - paper:+.2f}; "
      f"parity target |delta| <= 0.5 — BASELINE.md)")
EOF

#!/usr/bin/env python
"""Generate `lists/images.txt` for a VOC-layout dataset.

The reference ships precomputed VOC2007/VOC2012 image lists
(extract/data/VOC*/lists/images.txt); this derives the same lists from a local
VOC root so no data files need to be vendored.

Usage:
    python scripts/make_voc_lists.py /path/to/VOC2012 [--image_set trainval]
"""
import argparse
from pathlib import Path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("voc_root", help="VOC root containing JPEGImages/")
    p.add_argument("--image_set", default=None,
                   help="optional ImageSets/Main split to restrict to "
                        "(e.g. trainval); default: every JPEG")
    p.add_argument("--output", default=None,
                   help="output file (default <root>/lists/images.txt)")
    a = p.parse_args()

    root = Path(a.voc_root)
    images = sorted(p.name for p in (root / "JPEGImages").glob("*.jpg"))
    if a.image_set:
        ids = set((root / "ImageSets" / "Main" / f"{a.image_set}.txt")
                  .read_text().split())
        images = [n for n in images if Path(n).stem in ids]
    out = Path(a.output) if a.output else root / "lists" / "images.txt"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text("\n".join(images) + "\n")
    print(f"Wrote {len(images)} names to {out}")


if __name__ == "__main__":
    main()

"""Render attention heatmaps from a visualization export.

Consumes the ``attention_fold<k>.npz`` written by
``inference.py --save4visualization true`` (reference train_test.py:
1121-1177 dumps the same per-patch head-max/kv-mean attention values; the
reference leaves rendering to offline scripts — this is that script).

Usage:
    python tools/attention_heatmap.py CKPTDIR/attention_fold1.npz out_dir/
    python tools/attention_heatmap.py export.npz out/ --coords patches.csv \
        --upsample 16 --keys att1_tea10 att2_tea10

Grid mode lays patches on the model's own sqrt(N) x sqrt(N) attention grid;
--coords (CSV: wsi_id,x,y in patch units, bag order) restores true slide
geometry.  Writes one PNG per (slide, attention map) + summary.csv
(prediction, probability, per-map attention entropy).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from disentangled_multimodal_learning_tpu.utils.heatmap import render_export


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("npz", help="attention export npz")
    ap.add_argument("out_dir", help="output directory for PNGs + summary.csv")
    ap.add_argument("--coords", default=None,
                    help="patch-coordinate CSV (wsi_id,x,y)")
    ap.add_argument("--upsample", type=int, default=8,
                    help="pixels per patch (default 8)")
    ap.add_argument("--keys", nargs="*", default=None,
                    help="subset of attention keys (default: all)")
    args = ap.parse_args()
    files = render_export(args.npz, args.out_dir, coords_csv=args.coords,
                          upsample=args.upsample, keys=args.keys)
    print(f"wrote {len(files)} files to {args.out_dir}")
    for f in files[:10]:
        print(" ", f)
    if len(files) > 10:
        print(f"  ... {len(files) - 10} more")


if __name__ == "__main__":
    main()

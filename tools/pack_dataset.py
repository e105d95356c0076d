"""Pack a cohort's per-WSI .npy feature dirs into .dmltpack shards.

The datasets auto-detect ``<dataDir>/<COHORT>/feats{10,20}.dmltpack`` and
serve bags from the memory-mapped shard instead of per-file .npy reads
(data/packing.py, native/dmlt_io.cpp).

Usage:
    python tools/pack_dataset.py --data-dir ./data --cohort TCGA [IvYGAP ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from disentangled_multimodal_learning_tpu.data.packing import pack_bags


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="./data")
    ap.add_argument("--cohort", nargs="+", default=["TCGA"])
    ap.add_argument("--scales", nargs="+", default=["feats10", "feats20"])
    args = ap.parse_args()

    for cohort in args.cohort:
        root = os.path.join(args.data_dir, cohort)
        for subdir in args.scales:
            src = os.path.join(root, subdir)
            if not os.path.isdir(src):
                print(f"[pack] skip {src} (not a directory)")
                continue
            out = os.path.join(root, f"{subdir}.dmltpack")
            t0 = time.time()
            n = pack_bags(src, out)
            mb = os.path.getsize(out) / 1e6
            print(f"[pack] {out}: {n} bags, {mb:.1f} MB "
                  f"({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    main()

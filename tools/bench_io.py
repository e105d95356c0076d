"""Host-side bag-IO throughput: per-file .npy loads vs the packed mmap shard.

Generates a synthetic cohort of [rows, feat_dim] f32 bags, then times the
threaded per-file loader (native/dmlt_io.cpp dmlt_load_batch) against the
packed reader (dmlt_pack_batch) on identical warm-cache batch gathers.

Usage:  python tools/bench_io.py [--bags 64] [--rows 2500] [--dim 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from disentangled_multimodal_learning_tpu.data import native_io
from disentangled_multimodal_learning_tpu.data.packing import (PackFile,
                                                               pack_bags)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bags", type=int, default=64)
    ap.add_argument("--rows", type=int, default=2500)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="dmlt_io_bench_")
    try:
        rng = np.random.default_rng(0)
        names = [f"W{i:04d}" for i in range(args.bags)]
        for n in names:
            np.save(os.path.join(root, f"{n}.npy"),
                    rng.normal(size=(args.rows, args.dim)).astype(np.float32))
        pack_path = os.path.join(root, "feats.dmltpack")
        t0 = time.perf_counter()
        pack_bags(root, pack_path)
        pack_s = time.perf_counter() - t0
        pf = PackFile(pack_path)

        batches = [names[i:i + args.batch]
                   for i in range(0, args.bags, args.batch)]
        bytes_per_batch = args.batch * args.rows * args.dim * 4

        def time_epochs(fn):
            best = None
            for _ in range(args.reps):
                t0 = time.perf_counter()
                for b in batches:
                    fn(b)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return best

        npy_t = time_epochs(lambda b: native_io.load_bag_batch(
            [os.path.join(root, f"{n}.npy") for n in b], args.rows, args.dim))
        pack_t = time_epochs(
            lambda b: pf.get_batch(b, args.rows, args.dim))

        gb = args.bags * args.rows * args.dim * 4 / 1e9
        out = {
            "bags": args.bags, "rows": args.rows, "dim": args.dim,
            "native": native_io.native_available(), "pack_native": pf.native,
            "npy_GBps": round(gb / npy_t, 2),
            "pack_GBps": round(gb / pack_t, 2),
            "npy_ms_per_batch": round(npy_t / len(batches) * 1e3, 2),
            "pack_ms_per_batch": round(pack_t / len(batches) * 1e3, 2),
            "speedup": round(npy_t / pack_t, 2),
            "pack_write_s": round(pack_s, 2),
            "_bytes_per_batch_MB": round(bytes_per_batch / 1e6, 1),
        }
        print(json.dumps(out))
        pf.close()
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Bucketed padding for variable-length WSI bags.

The reference sidesteps variable bag sizes by padding every bag offline to a
single ``fixdim`` (the "fixdim0" feature dirs, reference
config/config_mine_surv.yaml:7-12) — every bag pays the cost of the longest.
Here variable-length bags are grouped into a small set of PERFECT-SQUARE
buckets: each bag is zero-padded to the smallest bucket that holds it
(truncated to the largest bucket if longer, exactly the fixdim truncation
rule), and every batch contains bags of one bucket only.  XLA compiles one
executable per bucket shape — the whole fwd/bwd graph stays compiled, and
short bags stop paying 2500-token attention.

Padding semantics match the reference exactly: zero feature rows participate
in attention unmasked, just as the offline fixdim zero-padding does.
"""

from __future__ import annotations

import math

import numpy as np

DEFAULT_BUCKETS = (400, 900, 1600, 2500)


def validate_buckets(buckets) -> tuple:
    out = tuple(sorted(int(b) for b in buckets))
    if not out:
        raise ValueError("buckets must be non-empty")
    for b in out:
        side = math.isqrt(b)
        if side * side != b:
            raise ValueError(
                f"bucket {b} must be a perfect square: the deformable 2D "
                "attention reshapes the bag onto a sqrt(N) x sqrt(N) grid")
    return out


class BucketedBagLoader:
    """Groups a variable-length dataset into per-bucket static-shape batches.

    The dataset must expose ``bag_len(i) -> int`` and
    ``batch(indices, pad_to=L) -> Batch``.  Within an epoch, samples are
    shuffled within their bucket and the bucket-batches are shuffled with
    each other, so training order stays randomized while every batch keeps
    one static shape.  ``drop_last=False`` pads the final short batch of
    each bucket by repeating its last sample (``batch.pad`` records the
    count, stripped by the Evaluator) — no sample is ever dropped.
    """

    def __init__(self, dataset, batch_size: int, buckets=DEFAULT_BUCKETS,
                 shuffle: bool = True, drop_last: bool = True, seed: int = 0):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.buckets = validate_buckets(buckets)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self._epoch = 0
        self._lens = np.array([dataset.bag_len(i)
                               for i in range(len(dataset))])
        self._assign = np.array([self.bucket_of(l) for l in self._lens])

    def bucket_of(self, length: int) -> int:
        for b in self.buckets:
            if length <= b:
                return b
        return self.buckets[-1]  # longer bags truncate (fixdim rule)

    def set_epoch(self, epoch: int):
        self._epoch = int(epoch)

    def _bucket_indices(self):
        return {b: np.nonzero(self._assign == b)[0] for b in self.buckets}

    def __len__(self):
        bs = self.batch_size
        total, carry = 0, 0
        for bi, b in enumerate(self.buckets):
            n = int((self._assign == b).sum()) + carry
            carry = 0
            if not self.drop_last:
                total += (n + bs - 1) // bs
            elif 0 < n < bs and bi + 1 < len(self.buckets):
                carry = n  # promoted to the next-larger bucket
            elif 0 < n < bs:
                total += 1  # largest bucket: pad the short batch
            else:
                total += n // bs
        return total

    def __iter__(self):
        rng = np.random.default_rng(self.seed * 100_003 + self._epoch)
        bs = self.batch_size
        plan = []  # (bucket, indices, pad)
        buckets_idx = self._bucket_indices()
        carry = np.zeros(0, dtype=np.int64)
        for bi, b in enumerate(self.buckets):
            idx = np.concatenate([carry, buckets_idx[b]])
            carry = np.zeros(0, dtype=np.int64)
            if len(idx) == 0:
                continue
            if self.shuffle:
                rng.shuffle(idx)
            if self.drop_last and len(idx) < bs:
                # a bucket whose population can never fill a batch would be
                # PERMANENTLY excluded (assignment is static, unlike the
                # unbucketed loader's per-epoch random tail): promote its
                # samples to the next-larger bucket (padding further is
                # always valid) or, at the largest bucket, pad the short
                # batch like drop_last=False does
                if bi + 1 < len(self.buckets):
                    carry = idx
                    continue
                pad = bs - len(idx)
                sel = np.concatenate([idx, np.repeat(idx[-1], pad)])
                plan.append((b, sel, pad))
                continue
            stop = (len(idx) // bs) * bs if self.drop_last else len(idx)
            for start in range(0, stop, bs):
                sel = idx[start: start + bs]
                pad = bs - len(sel)
                if pad:
                    sel = np.concatenate([sel, np.repeat(sel[-1], pad)])
                plan.append((b, sel, pad))
        if self.shuffle:
            rng.shuffle(plan)
        for b, sel, pad in plan:
            batch = self.dataset.batch(sel, pad_to=b)
            batch.pad = pad
            batch.indices = sel  # stable per-sample keys (see loader.py)
            yield batch

"""Host-side batcher feeding the jitted train/eval steps.

Replaces the reference's torch DataLoader + DistributedSampler
(reference main.py:111-125,326-341).  On TPU there is a single controller:
the loader produces GLOBAL batches (batch_size x data-mesh-size samples) which
the train step shards over the ``data`` mesh axis — the JAX analogue of
per-rank DistributedSampler shards.
"""

from __future__ import annotations

import numpy as np


class BagLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0, pad_final: bool = False):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.pad_final = pad_final
        self._epoch = 0

    def set_epoch(self, epoch: int):
        """Reshuffle per epoch (reference DistributedSampler.set_epoch,
        train_test.py:48-49)."""
        self._epoch = int(epoch)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last and not self.pad_final:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 100_003 + self._epoch)
            rng.shuffle(order)
        bs = self.batch_size
        stop = (n // bs) * bs if (self.drop_last and not self.pad_final) else n
        for start in range(0, stop, bs):
            idx = order[start: start + bs]
            pad = 0
            if len(idx) < bs:
                if not self.pad_final:
                    break
                pad = bs - len(idx)
                idx = np.concatenate([idx, np.repeat(idx[-1], pad)])
            batch = self.dataset.batch(idx)
            batch.pad = pad  # number of duplicated trailing samples
            yield batch


class PrefetchLoader:
    """Background-thread prefetch wrapper: overlaps host-side batch assembly
    (native IO, numpy stacking) with device compute.  The reference gets this
    from torch DataLoader workers (reference main.py:118-125, workers=8)."""

    def __init__(self, loader: BagLoader, depth: int = 2):
        self.loader = loader
        self.depth = depth

    def set_epoch(self, epoch: int):
        self.loader.set_epoch(epoch)

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        _END = object()

        def producer():
            try:
                for batch in self.loader:
                    q.put(batch)
            finally:
                q.put(_END)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            yield item
        t.join()

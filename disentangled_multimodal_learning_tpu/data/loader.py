"""Host-side batcher feeding the jitted train/eval steps.

Replaces the reference's torch DataLoader + DistributedSampler
(reference main.py:111-125,326-341).  On TPU there is a single controller:
the loader produces GLOBAL batches (batch_size x data-mesh-size samples) which
the train step shards over the ``data`` mesh axis — the JAX analogue of
per-rank DistributedSampler shards.

Partial final batch (torch DataLoader drop_last=False): instead of yielding a
short batch (a new XLA shape => recompile), the final batch is PADDED to full
size by repeating the last sample and ``batch.pad`` records the duplicate
count; the Evaluator strips the padded rows before computing metrics, so
eval covers exactly the reference's sample set.  Training loops use
drop_last=True (as the reference's DistributedSampler effectively does);
training with drop_last=False would slightly overweight the final sample.
"""

from __future__ import annotations

import numpy as np


class BagLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0, pad_final: bool = True):
        # pad_final is kept for API compatibility; drop_last=False always
        # pads (see module docstring) so no sample is ever silently dropped.
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
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 100_003 + self._epoch)
            rng.shuffle(order)
        bs = self.batch_size
        stop = (n // bs) * bs if self.drop_last else n
        for start in range(0, stop, bs):
            idx = order[start: start + bs]
            pad = bs - len(idx)
            if pad:
                idx = np.concatenate([idx, np.repeat(idx[-1], pad)])
            batch = self.dataset.batch(idx)
            batch.pad = pad  # number of duplicated trailing samples
            batch.indices = idx  # dataset rows (stable per-sample keys,
            # e.g. for the distillation teacher-output cache)
            yield batch


class PrefetchLoader:
    """Background-thread prefetch wrapper: overlaps host-side batch assembly
    (native IO, numpy stacking) with device compute.  The reference gets this
    from torch DataLoader workers (reference main.py:118-125, workers=8).

    The producer thread is stoppable: if the consumer abandons the generator
    early (e.g. ``next(iter(loader))`` to grab one init sample), generator
    close sets the stop event and joins the thread instead of leaving it
    blocked on a full queue holding batch memory for the process lifetime."""

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
        stop = threading.Event()
        _END = object()

        def producer():
            try:
                for batch in self.loader:
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            finally:
                # blocking-with-stop put: the queue may be full of unconsumed
                # batches; a put_nowait here would drop _END and deadlock the
                # consumer's q.get()
                while not stop.is_set():
                    try:
                        q.put(_END, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                yield item
        finally:
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5)

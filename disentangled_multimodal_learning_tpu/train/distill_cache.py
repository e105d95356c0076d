"""Teacher-output cache for distillation training.

The distillation teacher is FROZEN and applied deterministically (reference
train_test.py:585-588 wraps it in eval + no_grad), so its boundary tensors
for a given sample — two ``[C]`` logit blocks and two ``[256]`` feature
blocks, ~1 KB — are identical every time that sample is revisited.  The
reference recomputes the full teacher forward every step anyway; this cache
computes each sample's boundary once (first epoch) and replays it from a
device-resident store afterwards, making steady-state distillation run at
student-only speed (measured: tools/exp_distill_cache.py).

The store lives ON DEVICE (``jnp`` arrays scatter-updated with ``.at[]``)
because on a tunneled chip a per-batch host readback would cost more than
the teacher forward it saves (CLAUDE.md: ~28 ms HTTP roundtrip).

Cache validity: sample content is immutable for a run; bag padding is
static per sample (fixdim, or the static bucket assignment of
data/bucketing.py incl. its small-bucket promotion, which depends only on
static populations), so a cached boundary is bit-identical to a recompute.
A loader that does not expose ``batch.indices`` disables replay — every
batch recomputes (exactly today's cost), never a wrong value.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BOUNDARY_KEYS = ("tea_lt10", "tea_lt20", "tea_ft10", "tea_ft20")


class TeacherBoundaryCache:
    """Per-sample device store filled lazily by the first sight of each
    sample; ``boundary(arrays, indices)`` returns the dict of boundary
    tensors for the batch, from cache when every row has been seen."""

    def __init__(self, boundary_fn, teacher_vars, n_samples: int):
        self.fn = jax.jit(boundary_fn)
        self.tvars = teacher_vars
        self.n = int(n_samples)
        self.seen = np.zeros(self.n, dtype=bool)
        self.store: dict | None = None
        self.hits = 0
        self.misses = 0

    def boundary(self, arrays: dict, indices) -> dict:
        if indices is None or self.n == 0:
            # no stable keys / unknown dataset size: always recompute
            self.misses += 1
            return dict(zip(BOUNDARY_KEYS, self.fn(self.tvars, arrays)))
        idx = np.asarray(indices)
        if self.store is not None and bool(self.seen[idx].all()):
            self.hits += 1
            j = jnp.asarray(idx)
            return {k: self.store[k][j] for k in BOUNDARY_KEYS}
        self.misses += 1
        out = dict(zip(BOUNDARY_KEYS, self.fn(self.tvars, arrays)))
        if self.store is None:
            self.store = {k: jnp.zeros((self.n,) + v.shape[1:], v.dtype)
                          for k, v in out.items()}
        j = jnp.asarray(idx)
        for k, v in out.items():
            # duplicate rows (padded final batch) carry identical values,
            # so last-write-wins scatter is exact
            self.store[k] = self.store[k].at[j].set(v)
        self.seen[idx] = True
        return out


def loader_dataset_size(loader) -> int | None:
    """Best-effort sample count of the dataset behind a (possibly wrapped)
    loader; None disables the cache."""
    for obj in (loader, getattr(loader, "loader", None)):
        ds = getattr(obj, "dataset", None)
        if ds is not None:
            try:
                return len(ds)
            except TypeError:
                return None
    return None

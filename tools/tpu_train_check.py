"""On-chip training sanity: 200 real train steps per flagship mode on
synthetic-separable data through the FULL production path (kn layout + v7
transposed CPB Pallas kernel + its hand-written backward); asserts the loss
drops >50%.

Measured 2026-08-17 on v5e (r3): teacher 93.5%, student 98.9%,
deformpathomic 99.2%, multiscale 95.5% loss drop.  The CPU test suite proves the
same property on the XLA "nk" path (tests/test_learnability.py); this
script is its real-chip counterpart for the Pallas path.

Usage: python tools/tpu_train_check.py [mode ...]   (default: teacher)
       python tools/tpu_train_check.py all          (all four flagships)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax
jax.config.update("jax_default_prng_impl", "rbg")
from disentangled_multimodal_learning_tpu.config import Config
from disentangled_multimodal_learning_tpu.data import BagLoader, SyntheticBagDataset
from disentangled_multimodal_learning_tpu.models.factory import define_net
from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
from disentangled_multimodal_learning_tpu.train.steps import batch_to_arrays, make_train_step
from disentangled_multimodal_learning_tpu.train.trainers import init_model_state

B, FIX = 4, 2500
FLAGSHIPS = ["teacher", "student", "deformpathomic", "multiscale"]


def check(mode: str, overrides=None) -> float:
    kw = dict(mode=mode, task_type="diag2021", label_dim=4, fixdim=FIX,
              batch_size=B, remat=False, checkpoints="#", debug=True, lr=2e-4,
              multiscale_attention=True)
    if mode in ("teacher", "deformpathomic"):
        kw.update(gradient_modulate=True)
    overrides = dict(overrides or {})
    # check_epochs=N: horizon override (25 epochs x 8 steps = 200 steps
    # default; 125 -> the 1000-step divisor-1 long-horizon check, PERF.md)
    n_epochs = int(overrides.pop("check_epochs", 25))
    kw.update(overrides)
    cfg = Config(**kw).validate()
    ds = SyntheticBagDataset(size=32, fixdim=FIX, label_dim=4, seed=0,
                             args=cfg)
    loader = BagLoader(ds, B, shuffle=False, seed=0)
    model = define_net(cfg)
    tx = make_optimizer(cfg, len(loader))
    state = init_model_state(model, cfg, next(iter(loader)), tx)
    step_fn = make_train_step(model, cfg, tx)

    # the tunneled chip has a large per-dispatch latency: run each EPOCH
    # (8 batches) as ONE lax.scan dispatch instead of 200 python-side steps.
    # stacked batches are ARGUMENTS, not closure captures — captured arrays
    # ship inside the serialized computation and blow the remote-compile
    # HTTP body limit (CLAUDE.md)
    batches = [batch_to_arrays(b) for b in loader]
    stacked = {k: jax.numpy.stack([a[k] for a in batches]) for k in batches[0]}
    stacked = jax.device_put(stacked)

    @jax.jit
    def epoch_fn(state, rng, stacked):
        def body(carry, arrs):
            st, key = carry
            key, k2 = jax.random.split(key)
            st, m = step_fn(st, arrs, k2, None)
            return (st, key), m["loss"]
        (state, rng), losses = jax.lax.scan(body, (state, rng), stacked)
        return state, rng, losses

    rng = jax.random.PRNGKey(0)
    losses = []
    t0 = time.time()
    for epoch in range(n_epochs):
        state, rng, ls = epoch_fn(state, rng, stacked)
        losses.append(ls)
        if epoch % 5 == 0:
            print(f"[{mode}] epoch {epoch} ({time.time() - t0:.0f}s)",
                  flush=True)
    losses = np.asarray(jax.device_get(losses)).reshape(-1)
    first = float(losses[:8].mean())
    last = float(losses[-8:].mean())
    drop = (1 - last / first) * 100.0
    print(f"TPU kn-path training [{mode}]: first8 {first:.4f} -> last8 "
          f"{last:.4f} ({drop:.1f}% drop over {len(losses)} steps)")
    assert np.isfinite(losses).all()
    assert last < 0.5 * first, f"TPU production path failed to learn ({mode})"
    return drop


if __name__ == "__main__":
    # trailing key=value tokens become Config overrides (ints when they parse)
    picks, overrides = [], {}
    for tok in sys.argv[1:]:
        if "=" in tok:
            k, v = tok.split("=", 1)
            try:
                v = int(v)
            except ValueError:
                pass
            overrides[k] = v
        else:
            picks.append(tok)
    picks = picks or ["teacher"]
    if picks == ["all"]:
        picks = FLAGSHIPS
    drops = {m: check(m, overrides) for m in picks}
    for m, d in drops.items():
        print(f"{m:16s} {d:5.1f}% loss drop")
    print("LEARNS OK")

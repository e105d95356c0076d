"""Checkpointing: (params, opt_state, batch_stats, step) with metric-stamped
names.

Improves on the reference, which saves only a bare ``state_dict`` once per
fold at the END of training (reference train_test.py:325-340) — no optimizer
state, no mid-run resume (SURVEY.md §5).  Here full train state is saved via
orbax (msgpack fallback), and the metric-stamped filename convention is kept
for workflow compatibility:

    fold_{k}_epoch_{e}_AUC_{...}_ACC_{...}_..._  /  fold_{k}_epoch_{e}_cindex_{...}_
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def metric_stamped_name(cur_fold: int, epoch: int, metrics: dict,
                        task_type: str, mode: str | None = None) -> str:
    """Reference naming (train_test.py:325-335): 1-based fold, 1-based epoch.
    A ``mode`` prefix is added (deviation from the reference) so e.g. the
    student and the distilled student of the same fold/metrics don't
    overwrite each other."""
    prefix = f"{mode}_" if mode else ""
    if task_type == "survival":
        return prefix + "fold_{:d}_epoch_{:d}_cindex_{:f}_".format(
            cur_fold + 1, epoch + 1, metrics["cindex"])
    return prefix + ("fold_{:d}_epoch_{:d}_AUC_{:f}_ACC_{:f}_Sens_{:f}_"
                     "Spec_{:f}_F1_{:f}_".format(
                         cur_fold + 1, epoch + 1, metrics["auc"],
                         metrics["acc"], metrics["sens"], metrics["spec"],
                         metrics["f1"]))


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(directory: str, name: str, state, extra: dict | None = None) -> str:
    os.makedirs(directory, exist_ok=True)
    payload = {
        "params": _to_host(state.params),
        "opt_state": _to_host(state.opt_state),
        "batch_stats": _to_host(state.batch_stats) if state.batch_stats is not None else None,
        "step": int(state.step),
        "extra": extra or {},
    }
    path = os.path.join(directory, name + ".ckpt")
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    return path


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_state(state, path: str):
    """Restore a TrainState (or params-only) from disk (pickle or orbax)."""
    payload = load_checkpoint_any(path)
    import jax.numpy as jnp

    return state.replace(
        params=payload["params"],
        opt_state=payload["opt_state"] if payload.get("opt_state") is not None
        else state.opt_state,
        batch_stats=payload.get("batch_stats"),
        step=jnp.asarray(payload.get("step", 0), jnp.int32),
    )


def load_params(path: str):
    return load_checkpoint(path)["params"]


# --------------------------------------------------------------------- orbax

def save_checkpoint_orbax(directory: str, name: str, state,
                          extra: dict | None = None) -> str:
    """Orbax backend (async-capable, TPU-idiomatic); same payload layout as
    the pickle backend.  Returns the checkpoint directory path."""
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, name + ".orbax"))
    payload = {
        "params": _to_host(state.params),
        "opt_state": _to_host(state.opt_state),
        "batch_stats": _to_host(state.batch_stats)
        if state.batch_stats is not None else None,
        "step": int(state.step),
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    # orbax's StandardCheckpointer only takes array leaves; the string-typed
    # metadata goes in a JSON sidecar next to the checkpoint directory
    with open(path + ".extra.json", "w") as f:
        json.dump(extra or {}, f)
    return path


def load_checkpoint_any(path: str) -> dict:
    """Load either backend: .orbax directories or pickle files."""
    if path.endswith(".orbax") or os.path.isdir(path):
        import json

        import orbax.checkpoint as ocp

        extra_path = path.rstrip("/") + ".extra.json"
        extra = {}
        if os.path.exists(extra_path):
            with open(extra_path) as f:
                extra = json.load(f)
        with ocp.StandardCheckpointer() as ckptr:
            payload = ckptr.restore(os.path.abspath(path))
        payload["extra"] = payload.get("extra") or extra
        return payload
    return load_checkpoint(path)

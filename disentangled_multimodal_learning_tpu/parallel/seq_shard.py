"""Sequence-axis sharding for landmark (Nystrom) attention.

The reference handles long bags purely algorithmically (Nystrom landmarks,
deformable kv-144 compression, DPC-KNN merge — SURVEY.md §2.3 "long-context
scaling"), which caps the bag length at what one device's HBM holds.  This
module adds the TPU-native scaling hook SURVEY.md prescribes: shard the
token axis N over a mesh axis and keep the landmark math exact with three
tiny collectives.

Per device (n_loc = n / n_seq tokens):

  - landmark q/k means: local segment-matmul partial sums + ``psum`` —
    each device's segment rows are zero outside its token range, so the
    psum of the [m, D] partials IS the global landmark mean;
  - attn1 = softmax_m(q_loc @ k_land^T): row softmax over the LANDMARK
    axis — fully local;
  - attn2 + its Moore-Penrose pinv: [m, m] — replicated compute (m is
    tiny: dim/2 = 64 for the production TransMIL/CMTA blocks);
  - attn3 @ v: softmax over the SHARDED token axis via global max
    (``pmax``) + global denominator (``psum``), then a psum of the local
    [m, D] partial products.

Communication per call: 2 psums of [B,H,m,D], one pmax + one psum of
[B,H,m] — O(m·D), independent of N.  Compute and HBM stay O(N/n_seq).

Golden-tested against ops/nystrom.py (sharded == unsharded, fwd and grads)
on the 8-virtual-device CPU mesh in tests/test_parallel.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pinv import moore_penrose_pinv


def make_seq_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the token axis (compose with a 'data' axis via
    :func:`make_dp_seq_mesh`)."""
    import numpy as np

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("seq",))


def make_dp_seq_mesh(dp: int, seq: int) -> Mesh:
    """2-D ``('data', 'seq')`` mesh: batch sharded over ``dp`` device groups,
    each group splitting the token axis ``seq`` ways.  Consumers that accept
    ``seq_mesh`` (TransMIL via cfg.seq_shard_devices) detect the 'data' axis
    and shard their batch dimension over it too."""
    import numpy as np

    devices = jax.devices()
    if dp * seq > len(devices):
        raise ValueError(f"need {dp * seq} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[: dp * seq]).reshape(dp, seq),
                axis_names=("data", "seq"))


def nystrom_attention_seq_sharded(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_landmarks: int,
    mesh: Mesh,
    pinv_iterations: int = 6,
    axis_name: str = "seq",
):
    """Sequence-sharded Nystrom attention; same math and same front-padding
    contract as :func:`ops.nystrom.nystrom_attention` (reference
    models/NystromAttention.py:74-157), with the token axis sharded over
    ``mesh``'s ``axis_name``.

    q, k, v: ``[B, H, N, D]`` host/global arrays (q pre-scaled).  The padded
    length must split evenly into per-device chunks that hold whole
    landmark segments: ``(N padded to a multiple of m) % (n_seq * ...)``
    constraints are validated below.
    """
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    B, H, N, D = q.shape
    m = num_landmarks
    n_seq = mesh.shape[axis_name]
    pad = (m - N % m) % m
    if pad:
        padw = ((0, 0), (0, 0), (pad, 0), (0, 0))
        q, k, v = jnp.pad(q, padw), jnp.pad(k, padw), jnp.pad(v, padw)
    n = N + pad
    l = n // m  # tokens per landmark
    if n % n_seq:
        raise ValueError(f"padded length {n} must divide over {n_seq} devices")
    if (n // n_seq) % l:
        raise ValueError(
            f"per-device chunk {n // n_seq} must hold whole landmark "
            f"segments of {l} tokens (choose num_landmarks so that "
            f"n/m divides n/n_seq)")

    seg = (jnp.arange(n, dtype=jnp.int32) // l == jnp.arange(m)[:, None])
    seg = seg.astype(q.dtype) / l                            # [m, n]

    # on a 2-D ('data', 'seq') mesh also shard the batch axis: the landmark
    # math never mixes batch rows, so dp composes with sp for free
    batch_axis = "data" if "data" in mesh.axis_names else None
    if batch_axis and B % mesh.shape[batch_axis]:
        raise ValueError(
            f"batch {B} must divide over the {mesh.shape[batch_axis]}-way "
            f"'{batch_axis}' mesh axis")
    tok = P(batch_axis, None, axis_name, None)               # shard B and N
    segp = P(None, axis_name)

    def local_fn(seg_loc, q_loc, k_loc, v_loc):
        # landmark means: local partials are exact on this device's segment
        # rows and zero elsewhere -> psum reconstructs the global mean
        q_land = jax.lax.psum(
            jnp.einsum("sn,bhnd->bhsd", seg_loc, q_loc), axis_name)
        k_land = jax.lax.psum(
            jnp.einsum("sn,bhnd->bhsd", seg_loc, k_loc), axis_name)

        # attn1: softmax over the (replicated) landmark axis — local
        sim1 = jnp.einsum("bhid,bhjd->bhij", q_loc, k_land)  # [B,H,n_loc,m]
        attn1 = jax.nn.softmax(sim1, axis=-1)

        # attn2 + pinv: [m, m], replicated compute
        sim2 = jnp.einsum("bhid,bhjd->bhij", q_land, k_land)
        attn2_inv = moore_penrose_pinv(jax.nn.softmax(sim2, axis=-1),
                                       pinv_iterations)

        # attn3 @ v: softmax over the SHARDED token axis
        sim3 = jnp.einsum("bhid,bhjd->bhij", q_land, k_loc)  # [B,H,m,n_loc]
        # softmax max-subtraction contributes zero gradient; stop_gradient
        # BEFORE the collective so the tracer never needs pmax's (missing)
        # differentiation rule
        mx = jax.lax.pmax(
            jax.lax.stop_gradient(jnp.max(sim3, axis=-1)), axis_name)
        e = jnp.exp(sim3 - mx[..., None])
        denom = jax.lax.psum(jnp.sum(e, axis=-1), axis_name)  # [B,H,m]
        attn3v = jax.lax.psum(
            jnp.einsum("bhin,bhnd->bhid", e / denom[..., None], v_loc),
            axis_name)                                        # [B,H,m,D]

        return jnp.matmul(jnp.matmul(attn1, attn2_inv), attn3v)

    out = shard_map(local_fn, mesh=mesh,
                    in_specs=(segp, tok, tok, tok),
                    out_specs=tok)(seg, q, k, v)
    return out[:, :, -N:] if pad else out

"""Packed bag shards (.dmltpack): a whole cohort's WSI feature bags in ONE
memory-mapped file.

The reference reads one pre-dumped ``.npy`` per WSI per scale (its feature
dirs, reference config/config_mine_surv.yaml:7-12, loaded by the missing
``data/dataset.py`` — see datasets.py).  At production scale that is
thousands of per-epoch file opens + numpy header parses; a packed shard
replaces them with one mmap and a memcpy per bag, with the page cache shared
across loader threads and epochs.

Format v1 (little-endian)::

    0   magic   "DMLTPCK1"
    8   u64     n_bags
    16  u64     feat_dim
    24  u64     index_off               (absolute)
    32  u64     names_off               (absolute)
    40  u64     payload_off             (absolute, informational)
    index_off: n_bags x 32-byte records
               {u64 name_off (into names blob), u64 name_len,
                u64 data_off (absolute), u64 rows}
    names_off: concatenated utf-8 names
    payload:   per-bag f32 [rows, feat_dim] blocks, 64-byte aligned

Readers: the C++ mmap reader (native/dmlt_io.cpp, via data/native_io.py)
with this module's ``NumpyPackReader`` (np.memmap) as the always-available
fallback; ``PackFile`` picks automatically.  Writer: :func:`pack_bags` /
``tools/pack_dataset.py``.
"""

from __future__ import annotations

import os
import struct

import numpy as np

MAGIC = b"DMLTPCK1"
HEADER_FMT = "<8sQQQQQ"  # magic, n_bags, feat_dim, index_off, names_off, payload_off
HEADER_SIZE = struct.calcsize(HEADER_FMT)
INDEX_REC_FMT = "<QQQQ"  # name_off, name_len, data_off, rows
INDEX_REC_SIZE = struct.calcsize(INDEX_REC_FMT)
_ALIGN = 64


def pack_bags(npy_dir: str, out_path: str, feat_dim: int | None = None) -> int:
    """Pack every ``<name>.npy`` bag under ``npy_dir`` into ``out_path``.

    Bags are stored unpadded (true row counts preserved for bucketing);
    float64 inputs are converted to float32 like the per-file loaders.
    Returns the number of bags packed.
    """
    names = sorted(fn[:-4] for fn in os.listdir(npy_dir) if fn.endswith(".npy"))
    entries = []  # (name, rows, nbytes)
    arrays = []
    for name in names:
        arr = np.load(os.path.join(npy_dir, f"{name}.npy"))
        if arr.ndim == 1:
            arr = arr[:, None]
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        if feat_dim is None:
            feat_dim = int(arr.shape[1])
        elif int(arr.shape[1]) != feat_dim:
            raise ValueError(
                f"{name}: feat_dim {arr.shape[1]} != {feat_dim}")
        arrays.append(arr)
        entries.append((name, arr.shape[0], arr.nbytes))
    if feat_dim is None:
        raise ValueError(f"no .npy bags under {npy_dir}")

    names_blob = b""
    name_offs = []
    for name, _, _ in entries:
        nb = name.encode()
        name_offs.append((len(names_blob), len(nb)))
        names_blob += nb

    index_off = HEADER_SIZE
    names_off = index_off + INDEX_REC_SIZE * len(entries)
    payload_off = names_off + len(names_blob)
    payload_off += (-payload_off) % _ALIGN

    data_offs = []
    cursor = payload_off
    for _, _, nbytes in entries:
        data_offs.append(cursor)
        cursor += nbytes + ((-nbytes) % _ALIGN)

    with open(out_path, "wb") as f:
        f.write(struct.pack(HEADER_FMT, MAGIC, len(entries), feat_dim,
                            index_off, names_off, payload_off))
        for (noff, nlen), doff, (_, rows, _) in zip(name_offs, data_offs,
                                                    entries):
            f.write(struct.pack(INDEX_REC_FMT, noff, nlen, doff, rows))
        f.write(names_blob)
        for arr, doff in zip(arrays, data_offs):
            f.write(b"\0" * (doff - f.tell()))
            f.write(arr.tobytes())
    return len(entries)


class NumpyPackReader:
    """np.memmap reader for .dmltpack — the no-toolchain fallback, with
    semantics identical to the C++ reader (zero-pad / truncate to fixdim)."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            header = f.read(HEADER_SIZE)
        magic, n_bags, feat_dim, index_off, names_off, _ = struct.unpack(
            HEADER_FMT, header)
        if magic != MAGIC:
            raise ValueError(f"{path}: not a .dmltpack file")
        self.feat_dim = int(feat_dim)
        self._mm = np.memmap(path, dtype=np.uint8, mode="r")
        idx = np.frombuffer(
            self._mm[index_off:index_off + n_bags * INDEX_REC_SIZE],
            dtype=np.uint64).reshape(n_bags, 4)
        self.index: dict[str, tuple[int, int]] = {}
        for noff, nlen, doff, rows in idx:
            name = bytes(
                self._mm[names_off + int(noff):
                         names_off + int(noff) + int(nlen)]).decode()
            self.index[name] = (int(doff), int(rows))

    def rows(self, name: str) -> int:
        return self.index.get(name, (0, -1))[1]

    def get(self, name: str, fixdim: int, feat_dim: int) -> np.ndarray:
        if feat_dim != self.feat_dim or name not in self.index:
            raise KeyError(name)
        doff, rows = self.index[name]
        out = np.zeros((fixdim, feat_dim), dtype=np.float32)
        n = min(rows, fixdim)
        nbytes = n * feat_dim * 4
        out[:n] = np.frombuffer(self._mm[doff:doff + nbytes],
                                dtype=np.float32).reshape(n, feat_dim)
        return out

    def get_batch(self, names, fixdim: int, feat_dim: int) -> np.ndarray:
        return np.stack([self.get(n, fixdim, feat_dim) for n in names])

    def close(self):
        self._mm = None


class PackFile:
    """Unified .dmltpack reader: C++ mmap reader when the native library is
    available (data/native_io.py), NumpyPackReader otherwise."""

    def __init__(self, path: str):
        from . import native_io

        self.path = path
        self._handle = native_io.pack_open(path)  # None -> fallback
        self._np = NumpyPackReader(path) if self._handle is None else None
        self.feat_dim = (self._np.feat_dim if self._np is not None
                         else native_io.pack_feat_dim(self._handle))

    @property
    def native(self) -> bool:
        return self._handle is not None

    def rows(self, name: str) -> int:
        if self._np is not None:
            return self._np.rows(name)
        from . import native_io

        return native_io.pack_rows(self._handle, name)

    def get(self, name: str, fixdim: int, feat_dim: int) -> np.ndarray:
        if self._np is not None:
            return self._np.get(name, fixdim, feat_dim)
        from . import native_io

        out = native_io.pack_get(self._handle, name, fixdim, feat_dim)
        if out is None:
            raise KeyError(name)
        return out

    def get_batch(self, names, fixdim: int, feat_dim: int,
                  n_threads: int = 8) -> np.ndarray:
        if self._np is not None:
            return self._np.get_batch(names, fixdim, feat_dim)
        from . import native_io

        out = native_io.pack_batch(self._handle, list(names), fixdim,
                                   feat_dim, n_threads)
        if out is None:  # e.g. a missing name: fall back per-bag for the error
            return np.stack([self.get(n, fixdim, feat_dim) for n in names])
        return out

    def close(self):
        if self._np is not None:
            self._np.close()
        elif self._handle is not None:
            from . import native_io

            native_io.pack_close(self._handle)
            self._handle = None

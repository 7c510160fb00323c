"""Deterministic vectorized hashes.

- ``fnv1a64``: FNV-1a 64-bit over the UTF-8 bytes of an Arrow string array,
  vectorized with numpy over the array's raw buffers.  Used for partition
  routing (``partition = fnv1a64(conv_id) % P``) — the Ray-native analogue of
  the reference's writer-side partitioner (reference:
  miru-writer-deployable/.../MiruPartitioner.java:106-165, which routes by
  tenant/writer cursor; we route by conversation hash so a conversation's
  turns land in one partition and docId order is stable).
- ``splitmix64``: counter-based RNG used by the deterministic fixture
  generator (chunk-invariant: the value for row *i* never depends on how the
  generation was batched).

Both are version-pinned pure arithmetic — stable across processes, library
versions and cluster sizes, which is what makes builds resumable and
parallelism-invariant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def _string_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Return (offsets:int64[n+1], data:uint8) for a string/large_string array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    typ = arr.type
    if pa.types.is_large_string(typ) or pa.types.is_large_binary(typ):
        odtype = np.int64
    elif pa.types.is_string(typ) or pa.types.is_binary(typ):
        odtype = np.int32
    else:
        raise TypeError(f"expected string-like array, got {typ}")
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=odtype)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    return offsets.astype(np.int64, copy=False), data


def fnv1a64(arr: pa.Array | pa.ChunkedArray | list[str]) -> np.ndarray:
    """Vectorized FNV-1a 64-bit hash of each element of a string array."""
    if isinstance(arr, (list, tuple)):
        arr = pa.array(arr, type=pa.string())
    offsets, data = _string_buffers(arr)
    n = len(offsets) - 1
    starts = offsets[:-1]
    lens = offsets[1:] - starts
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return h
    maxlen = int(lens.max()) if n else 0
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            sel = lens > j
            b = data[starts[sel] + j].astype(np.uint64)
            h[sel] = (h[sel] ^ b) * _FNV_PRIME
    return h


def fnv1a64_str(s: str) -> int:
    """Scalar reference implementation (oracle side)."""
    h = 14695981039346656037
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def splitmix64(x: np.ndarray | int) -> np.ndarray:
    """Counter-based splitmix64; input uint64 array (or int), output uint64."""
    z = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = z + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def u64_to_unit(x: np.ndarray) -> np.ndarray:
    """uint64 → float64 in [0, 1)."""
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)

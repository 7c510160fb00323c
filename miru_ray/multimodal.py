"""Multimodal column plumbing: opaque binary payloads + actor-pool stages.

The engine treats image/audio/video payloads as opaque ``binary`` columns
with typed metadata (media_type, width/height or sample_rate, byte length).
The Ray-side plumbing — schema, batch sizing, actor signature, output
layout — is real and tested; the actual codec calls are STUBBED because
image/audio libraries are not available in this environment:

* ``DecodeStage`` — callable class for ``map_batches(DecodeStage,
  concurrency=N, batch_size=SMALL)``: ``__init__`` is where a real build
  would load the codec / model ONCE per actor; ``__call__`` decodes a
  batch. With ``backend="fake"`` it produces a deterministic feature
  vector from the payload bytes (so tests can assert end-to-end shape and
  determinism); with ``backend="real"`` it raises ``NotImplementedError``
  at the clearly marked point where e.g. PIL/libsndfile would be called.
* ``feature_extract_ds`` — the pipeline: read → decode (actor pool, small
  batches because payloads are large) → feature table.

Batch-size note: payload batches must be sized by BYTES, not rows — a
64-row batch of 4 MB images is 256 MB of heap per task. ``batch_size``
here defaults small; at scale set ``DataContext.target_max_block_size``
accordingly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import splitmix64

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image/png", "audio/wav", ...
        ("payload", pa.large_binary()),
        ("width", pa.int32()),       # images; -1 otherwise
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),  # audio; -1 otherwise
    ]
)

FEATURE_DIM = 16


def synth_media_table(n: int, seed: int = 7) -> pa.Table:
    """Deterministic synthetic media rows (opaque byte payloads) for tests."""
    ids = np.arange(n, dtype=np.int64)
    rng = splitmix64(ids.astype(np.uint64) + np.uint64(seed))
    sizes = 64 + (rng % np.uint64(192)).astype(np.int64)
    payloads = []
    for i in range(n):
        stream = splitmix64(
            np.arange(sizes[i], dtype=np.uint64) * np.uint64(2654435761) + rng[i]
        )
        payloads.append((stream & np.uint64(0xFF)).astype(np.uint8).tobytes())
    kinds = np.where(ids % 2 == 0, "image/png", "audio/wav")
    return pa.table(
        {
            "media_id": pa.array(ids),
            "media_type": pa.array(kinds.tolist(), type=pa.string()),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "width": pa.array(np.where(ids % 2 == 0, 32, -1).astype(np.int32)),
            "height": pa.array(np.where(ids % 2 == 0, 32, -1).astype(np.int32)),
            "sample_rate": pa.array(np.where(ids % 2 == 1, 16000, -1).astype(np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class DecodeStage:
    """Actor-pool decode / feature-extract stage.

    Real deployments load the codec + model in ``__init__`` (once per
    actor); ``__call__`` must stay vectorized over the batch."""

    def __init__(self, backend: str = "fake", feature_dim: int = FEATURE_DIM):
        self.backend = backend
        self.feature_dim = feature_dim
        if backend == "real":
            # a real build would do e.g.:  self.codec = PIL.Image / soundfile
            # and load the feature model here, once per actor.
            raise NotImplementedError(
                "no image/audio libraries in this environment; use backend='fake'"
            )

    def _fake_features(self, payload: pa.LargeBinaryArray) -> np.ndarray:
        """Deterministic stand-in: FEATURE_DIM rolling-hash moments of the
        payload bytes (vectorized over the flat buffer)."""
        buf = np.frombuffer(payload.buffers()[2], dtype=np.uint8) if payload.buffers()[2] else np.empty(0, np.uint8)
        offs = np.frombuffer(payload.buffers()[1], dtype=np.int64)
        offs = offs[payload.offset : payload.offset + len(payload) + 1]
        out = np.zeros((len(payload), self.feature_dim), dtype=np.float32)
        h = splitmix64(buf.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        for j in range(self.feature_dim):
            hj = splitmix64(h + np.uint64(j))
            sums = np.add.reduceat(hj.astype(np.float64), offs[:-1]) if len(buf) else np.zeros(len(payload))
            lens = np.maximum(offs[1:] - offs[:-1], 1)
            out[:, j] = ((sums / lens) / float(1 << 64)).astype(np.float32)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["payload"].combine_chunks() if isinstance(batch["payload"], pa.ChunkedArray) else batch["payload"]
        feats = self._fake_features(payload)
        n_bytes = pa.array(
            (np.frombuffer(payload.buffers()[1], dtype=np.int64)[payload.offset + 1 : payload.offset + len(payload) + 1]
             - np.frombuffer(payload.buffers()[1], dtype=np.int64)[payload.offset : payload.offset + len(payload)]),
            type=pa.int64(),
        )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "n_bytes": n_bytes,
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1)), self.feature_dim
                ),
            }
        )


def feature_extract_ds(media_table: pa.Table, concurrency: int = 2, batch_size: int = 32):
    """The multimodal pipeline over an in-memory media table (tests) — at
    scale this would be ``read_parquet`` of payload shards instead."""
    import ray.data as rd

    ds = rd.from_arrow(media_table)
    return ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"backend": "fake"},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )

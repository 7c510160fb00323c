"""Multimodal columns: opaque binary payloads + actor-pool decode stages.

The engine treats image/audio/video payloads as opaque ``binary`` columns
with typed metadata (media_type, width/height or sample_rate, byte
length). Three decode backends:

* ``backend="numpy"`` (default) — a REAL decoder for the formats
  decodable without external libraries: uncompressed 24-bit BMP
  (BITMAPINFOHEADER parse, bottom-up padded pixel rows) and 16-bit PCM
  WAV (RIFF chunk walk, int16 samples), with real feature extraction
  (per-channel moments for images; RMS / zero-crossing / FFT spectral
  centroid for audio). Decode is per payload (as in every codec), the
  per-payload work is vectorized numpy.
* ``backend="fake"`` — deterministic hash-moment features from the raw
  bytes (shape/determinism tests; works for any payload).
* ``backend="real"`` — the clearly marked seam where PIL / libsndfile
  would load in ``__init__`` (once per actor); raises
  ``NotImplementedError`` here because compressed codecs (JPEG/PNG/MP3)
  need libraries this environment does not ship.

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


# ---------------------------------------------------- pure-numpy codecs


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (BITMAPINFOHEADER, bottom-up rows padded to 4 bytes)."""
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    header = np.zeros(54, dtype=np.uint8)
    header[0:2] = [0x42, 0x4D]  # 'BM'
    header[2:6] = np.array([54 + img_size], dtype="<u4").view(np.uint8)
    header[10:14] = np.array([54], dtype="<u4").view(np.uint8)
    header[14:18] = np.array([40], dtype="<u4").view(np.uint8)
    header[18:22] = np.array([w], dtype="<i4").view(np.uint8)
    header[22:26] = np.array([h], dtype="<i4").view(np.uint8)
    header[26:28] = np.array([1], dtype="<u2").view(np.uint8)
    header[28:30] = np.array([24], dtype="<u2").view(np.uint8)
    header[34:38] = np.array([img_size], dtype="<u4").view(np.uint8)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    bgr = pixels[::-1, :, ::-1]  # bottom-up, BGR
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header.tobytes() + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP to an (h, w, 3) uint8 RGB array."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    if len(buf) < 54 or buf[0] != 0x42 or buf[1] != 0x4D:
        raise ValueError("not a BMP payload")
    off = int(buf[10:14].view("<u4")[0])
    w = int(buf[18:22].view("<i4")[0])
    h = int(buf[22:26].view("<i4")[0])
    bpp = int(buf[28:30].view("<u2")[0])
    if bpp != 24 or int(buf[30:34].view("<u4")[0]) != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compressed)")
    row_bytes = (w * 3 + 3) & ~3
    rows = buf[off : off + row_bytes * abs(h)].reshape(abs(h), row_bytes)
    bgr = rows[:, : w * 3].reshape(abs(h), w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if h > 0 else rgb  # bottom-up unless height negative


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 mono PCM samples as a canonical RIFF/WAVE file."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    hdr = np.zeros(44, dtype=np.uint8)
    hdr[0:4] = np.frombuffer(b"RIFF", np.uint8)
    hdr[4:8] = np.array([36 + len(data)], dtype="<u4").view(np.uint8)
    hdr[8:12] = np.frombuffer(b"WAVE", np.uint8)
    hdr[12:16] = np.frombuffer(b"fmt ", np.uint8)
    hdr[16:20] = np.array([16], dtype="<u4").view(np.uint8)
    hdr[20:22] = np.array([1], dtype="<u2").view(np.uint8)   # PCM
    hdr[22:24] = np.array([1], dtype="<u2").view(np.uint8)   # mono
    hdr[24:28] = np.array([sample_rate], dtype="<u4").view(np.uint8)
    hdr[28:32] = np.array([sample_rate * 2], dtype="<u4").view(np.uint8)
    hdr[32:34] = np.array([2], dtype="<u2").view(np.uint8)
    hdr[34:36] = np.array([16], dtype="<u2").view(np.uint8)
    hdr[36:40] = np.frombuffer(b"data", np.uint8)
    hdr[40:44] = np.array([len(data)], dtype="<u4").view(np.uint8)
    return hdr.tobytes() + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a 16-bit PCM WAV to (samples:int16 [n, channels-interleaved],
    sample_rate) by walking the RIFF chunks."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    if len(buf) < 44 or bytes(buf[0:4]) != b"RIFF" or bytes(buf[8:12]) != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sr, bits = 12, None, None
    data = None
    while pos + 8 <= len(buf):
        cid = bytes(buf[pos : pos + 4])
        size = int(buf[pos + 4 : pos + 8].view("<u4")[0])
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = int(body[0:2].view("<u2")[0])
            if fmt != 1:
                raise ValueError(f"unsupported WAV format {fmt} (not PCM)")
            sr = int(body[4:8].view("<u4")[0])
            bits = int(body[14:16].view("<u2")[0])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if sr is None or data is None or bits != 16:
        raise ValueError("unsupported WAV (need PCM16 fmt + data chunks)")
    return data.view("<i2").astype(np.int16), sr


def image_features(rgb: np.ndarray, dim: int) -> np.ndarray:
    """Real image features: per-channel mean/std (scaled), aspect, and a
    coarse grayscale histogram — all vectorized."""
    out = np.zeros(dim, dtype=np.float32)
    flat = rgb.reshape(-1, 3).astype(np.float64)
    out[0:3] = flat.mean(axis=0) / 255.0
    out[3:6] = flat.std(axis=0) / 255.0
    h, w, _ = rgb.shape
    out[6] = h / max(1, w)
    gray = flat.mean(axis=1)
    hist, _ = np.histogram(gray, bins=min(8, dim - 7), range=(0, 255))
    out[7 : 7 + len(hist)] = hist / max(1, gray.size)
    return out


def audio_features(samples: np.ndarray, sr: int, dim: int) -> np.ndarray:
    """Real audio features: RMS, zero-crossing rate, spectral centroid +
    coarse log-spectrum — numpy FFT, no libraries."""
    out = np.zeros(dim, dtype=np.float32)
    x = samples.astype(np.float64) / 32768.0
    if len(x) == 0:
        return out
    out[0] = np.sqrt((x**2).mean())
    out[1] = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(len(x), d=1.0 / sr)
    denom = spec.sum()
    out[2] = float((freqs * spec).sum() / denom / (sr / 2)) if denom > 0 else 0.0
    nb = min(dim - 3, 8)
    if nb > 0 and len(spec) >= nb:
        bands = np.array_split(spec, nb)
        e = np.array([float((b**2).sum()) for b in bands])
        tot = e.sum()
        out[3 : 3 + nb] = (e / tot) if tot > 0 else 0.0
    return out


class DecodeStage:
    """Actor-pool decode / feature-extract stage.

    Real deployments load the codec + model in ``__init__`` (once per
    actor); ``__call__`` decodes the batch. ``backend="numpy"`` performs
    REAL decoding of uncompressed BMP / PCM16 WAV payloads."""

    def __init__(self, backend: str = "numpy", feature_dim: int = FEATURE_DIM):
        self.backend = backend
        self.feature_dim = feature_dim
        if backend == "real":
            # the seam where PIL / libsndfile + the feature model would
            # load, once per actor — compressed codecs need libraries this
            # environment does not ship.
            raise NotImplementedError(
                "no compressed-codec libraries in this environment; "
                "use backend='numpy' (BMP/WAV) or backend='fake'"
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

    def _numpy_features(self, payload: pa.LargeBinaryArray, media_type) -> np.ndarray:
        out = np.zeros((len(payload), self.feature_dim), dtype=np.float32)
        types = media_type.to_pylist()
        for i in range(len(payload)):
            raw = payload[i].as_py()
            mt = types[i]
            if mt.startswith("image/bmp"):
                out[i] = image_features(decode_bmp(raw), self.feature_dim)
            elif mt.startswith("audio/wav"):
                samples, sr = decode_wav(raw)
                out[i] = audio_features(samples, sr, self.feature_dim)
            else:
                raise ValueError(f"backend='numpy' cannot decode {mt!r}")
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["payload"].combine_chunks() if isinstance(batch["payload"], pa.ChunkedArray) else batch["payload"]
        if self.backend == "numpy":
            mt = batch["media_type"].combine_chunks() if isinstance(batch["media_type"], pa.ChunkedArray) else batch["media_type"]
            feats = self._numpy_features(payload, mt)
        else:
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


def synth_real_media_table(n: int, seed: int = 11) -> pa.Table:
    """Deterministic REAL media rows: alternating uncompressed 24-bit BMP
    images and 16-bit PCM WAV clips (decodable by the numpy backend)."""
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)
    payloads, kinds, widths, heights, srs = [], [], [], [], []
    for i in range(n):
        if i % 2 == 0:
            w, h = int(rng.integers(4, 24)), int(rng.integers(4, 24))
            pixels = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(encode_bmp(pixels))
            kinds.append("image/bmp")
            widths.append(w); heights.append(h); srs.append(-1)
        else:
            sr = 8000
            t = np.arange(int(rng.integers(200, 1000)))
            freq = float(rng.integers(100, 1000))
            samples = (np.sin(2 * np.pi * freq * t / sr) * 12000).astype(np.int16)
            payloads.append(encode_wav(samples, sr))
            kinds.append("audio/wav")
            widths.append(-1); heights.append(-1); srs.append(sr)
    return pa.table(
        {
            "media_id": pa.array(ids),
            "media_type": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "width": pa.array(np.asarray(widths, dtype=np.int32)),
            "height": pa.array(np.asarray(heights, dtype=np.int32)),
            "sample_rate": pa.array(np.asarray(srs, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


# ------------------------------------------------- resize + frame sampling


def resize_bilinear(rgb: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Pure-numpy bilinear resize of an (H, W, C) uint8 image — vectorized
    gather of the four neighbor grids + two lerps (no per-pixel loop).
    Uses the align-corners=False pixel-center convention."""
    h, w, c = rgb.shape
    ys = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    img = rgb.astype(np.float64)
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


class ResizeStage:
    """Actor-pool stage: BMP payload → bilinear-resized BMP payload (fixed
    target box). Non-image rows pass through untouched; output keeps
    MEDIA_SCHEMA so resize composes with DecodeStage in either order."""

    def __init__(self, out_h: int, out_w: int):
        self.out_h = out_h
        self.out_w = out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["media_type"].to_pylist()
        payloads = batch["payload"].to_pylist()
        widths = batch["width"].to_numpy(zero_copy_only=False).copy()
        heights = batch["height"].to_numpy(zero_copy_only=False).copy()
        out = []
        for i, (k, p) in enumerate(zip(kinds, payloads)):
            if k == "image/bmp" and p:
                rgb = resize_bilinear(decode_bmp(p), self.out_h, self.out_w)
                out.append(encode_bmp(rgb))
                heights[i], widths[i] = self.out_h, self.out_w
            else:
                out.append(p)
        # replace in place so extra columns (e.g. FrameSampleStage's
        # frame_idx) ride through the stage untouched
        t = batch
        for name, col in (
            ("payload", pa.array(out, type=pa.large_binary())),
            ("width", pa.array(widths.astype(np.int32))),
            ("height", pa.array(heights.astype(np.int32))),
        ):
            t = t.set_column(t.schema.get_field_index(name), name, col)
        return t


def resample_linear(samples: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Pure-numpy linear-interpolation resample of int16 PCM (np.interp over
    the continuous-time sample positions). A real sinc/polyphase resampler
    plugs in behind the same signature."""
    if sr_in == sr_out or len(samples) == 0:
        return samples.astype(np.int16, copy=False)
    n_out = max(1, int(round(len(samples) * sr_out / sr_in)))
    t_out = np.arange(n_out, dtype=np.float64) * (sr_in / sr_out)
    out = np.interp(t_out, np.arange(len(samples), dtype=np.float64),
                    samples.astype(np.float64))
    return np.clip(np.rint(out), -32768, 32767).astype(np.int16)


class ResampleStage:
    """Actor-pool stage: WAV payload → linear-resampled WAV at a fixed
    target rate. Non-audio rows pass through untouched (same in-place
    column replacement as ResizeStage, so extra columns survive)."""

    def __init__(self, target_rate: int):
        self.target_rate = target_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["media_type"].to_pylist()
        payloads = batch["payload"].to_pylist()
        rates = batch["sample_rate"].to_numpy(zero_copy_only=False).copy()
        out = []
        for i, (k, p) in enumerate(zip(kinds, payloads)):
            if k == "audio/wav" and p:
                samples, sr = decode_wav(p)
                out.append(encode_wav(resample_linear(samples, sr, self.target_rate),
                                      self.target_rate))
                rates[i] = self.target_rate
            else:
                out.append(p)
        t = batch
        for name, col in (
            ("payload", pa.array(out, type=pa.large_binary())),
            ("sample_rate", pa.array(rates.astype(np.int32))),
        ):
            t = t.set_column(t.schema.get_field_index(name), name, col)
        return t


# A "video" here is the trivial deterministic container the sandbox can
# decode: magic + frame count + frame byte offsets, then concatenated BMP
# frames. The container exists to make the FRAME-SAMPLING PLUMBING real
# (one video row → k image rows via a flat-map batch stage); a real codec
# (mp4/h264) plugs into _video_frames behind the same seam as
# DecodeStage's backend="real".
_VID_MAGIC = b"MRV1"


def encode_video(frames: list[np.ndarray]) -> bytes:
    blobs = [encode_bmp(f) for f in frames]
    offs = np.zeros(len(blobs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in blobs], out=offs[1:])
    head = _VID_MAGIC + np.int64(len(blobs)).tobytes() + offs.tobytes()
    return head + b"".join(blobs)


def _video_frames(payload: bytes) -> list[bytes]:
    assert payload[:4] == _VID_MAGIC, "not an MRV1 container"
    n = int(np.frombuffer(payload, np.int64, 1, 4)[0])
    offs = np.frombuffer(payload, np.int64, n + 1, 12)
    base = 12 + 8 * (n + 1)
    return [bytes(payload[base + offs[i] : base + offs[i + 1]]) for i in range(n)]


class FrameSampleStage:
    """Flat-map batch stage: one video row → one image row per sampled
    frame (``every_k``-th, always including frame 0). Output rows are BMP
    images in MEDIA_SCHEMA + a frame_idx column, so the sampled frames feed
    straight into ResizeStage / DecodeStage."""

    def __init__(self, every_k: int = 2):
        self.every_k = max(1, every_k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds = batch["media_id"].to_pylist(), batch["media_type"].to_pylist()
        payloads = batch["payload"].to_pylist()
        o_id, o_fi, o_pay, o_w, o_h = [], [], [], [], []
        for mid, k, p in zip(ids, kinds, payloads):
            if k != "video/mrv1" or not p:
                continue
            frames = _video_frames(p)
            for fi in range(0, len(frames), self.every_k):
                rgb_dims = np.frombuffer(frames[fi], np.int32, 2, 18)  # BMP w,h
                o_id.append(mid)
                o_fi.append(fi)
                o_pay.append(frames[fi])
                o_w.append(int(rgb_dims[0]))
                o_h.append(int(abs(rgb_dims[1])))
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.int64()),
                "frame_idx": pa.array(o_fi, pa.int32()),
                "media_type": pa.array(["image/bmp"] * len(o_id), pa.string()),
                "payload": pa.array(o_pay, pa.large_binary()),
                "width": pa.array(o_w, pa.int32()),
                "height": pa.array(o_h, pa.int32()),
                "sample_rate": pa.array([-1] * len(o_id), pa.int32()),
            }
        )


def feature_extract_ds(media_table: pa.Table, concurrency: int = 2, batch_size: int = 32,
                       backend: str = "numpy"):
    """The multimodal pipeline over an in-memory media table (tests) — at
    scale this would be ``read_parquet`` of payload shards instead."""
    import ray.data as rd

    ds = rd.from_arrow(media_table)
    return ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"backend": backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


# -------------------------------------------------- perceptual-hash dedup

# Image near-dup detection over the REAL decode path: aHash (average hash)
# — grayscale via ITU-R 601 luma, bilinear resize to 8×8 (the same
# resize_bilinear kernel the ResizeStage uses), bit i = (pixel ≥ mean),
# row-major MSB-first — then banded hamming pairs through the SAME
# block-banding machinery as text SimHash (dedup.hamming_pairs_ds). Not
# SQL-expressible (binary decode); the oracle is the exact brute-force
# pytest (pigeonhole banding is recall-1.0, so pairs match popcount
# brute force exactly).


def ahash64(rgb: np.ndarray) -> int:
    """64-bit average hash of an (H, W, 3) uint8 image."""
    luma = np.clip(
        np.rint(
            0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        ),
        0,
        255,
    ).astype(np.uint8)
    small = resize_bilinear(luma[..., None], 8, 8)[..., 0].astype(np.float64)
    bits = (small >= small.mean()).ravel()
    return int(np.packbits(bits).view(">u8")[0])


class AHashStage:
    """Actor-pool stage: BMP image rows → (doc_id, simhash) aHash rows
    (column names chosen so dedup's banding machinery consumes them
    directly). Non-image rows are dropped. Per-row decode is inherent —
    images are variable-size — but each decode is vectorized numpy."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for i in range(batch.num_rows):
            if batch["media_type"][i].as_py() != "image/bmp":
                continue
            rgb = decode_bmp(batch["payload"][i].as_py())
            ids.append(int(batch["media_id"][i].as_py()))
            hashes.append(ahash64(rgb))
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, np.int64)),
                "simhash": pa.array(np.asarray(hashes, np.uint64).view(np.int64)),
            }
        )


def image_ahash_ds(media_table: pa.Table, concurrency=(1, 2), batch_size: int = 32):
    """(doc_id, simhash): aHash per BMP image row of a media table."""
    import ray.data as rd

    return rd.from_arrow(media_table).map_batches(
        AHashStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def image_neardup_pairs_ds(
    media_table: pa.Table, max_hamming: int = 7, max_bucket: int = 256
):
    """(a, b, hamming): image near-dup pairs at aHash hamming ≤
    ``max_hamming`` (default 7 → 8×8-bit banding) — decode + hash in an
    actor pool, then the shared banded-hamming exchange; payloads never
    shuffle."""
    from .dedup import hamming_pairs_ds

    return hamming_pairs_ds(image_ahash_ds(media_table), max_hamming, max_bucket)


def audio_fingerprint64(samples: np.ndarray, sr: int) -> int:
    """64-bit spectral fingerprint of a PCM16 clip: 64 equal bands of the
    magnitude spectrum, bit i = (band energy > median band energy) —
    MSB-first. Median-threshold (not mean) keeps exactly ~32 bits set, so
    hamming distance is loudness-invariant in rank terms; bands whose
    energy sits NEAR the median flip under small perturbations, so
    near-dup search over these fingerprints wants a wider radius than
    image aHash (default max_hamming=15 → 16×4-bit banding). Degenerate
    near-empty spectra (pure tones) make the threshold ill-conditioned —
    this fingerprint is for broadband material."""
    x = samples.astype(np.float64) / 32768.0
    if len(x) < 64:
        x = np.pad(x, (0, 64 - len(x)))
    spec = np.abs(np.fft.rfft(x))
    bands = np.array_split(spec, 64)
    e = np.array([float((b**2).sum()) for b in bands])
    bits = e > np.median(e)
    return int(np.packbits(bits).view(">u8")[0])


class AudioFpStage:
    """Actor-pool stage: WAV rows → (doc_id, simhash) fingerprint rows for
    the shared banded-hamming exchange. Non-audio rows are dropped."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for i in range(batch.num_rows):
            if batch["media_type"][i].as_py() != "audio/wav":
                continue
            samples, sr = decode_wav(batch["payload"][i].as_py())
            ids.append(int(batch["media_id"][i].as_py()))
            hashes.append(audio_fingerprint64(samples, sr))
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, np.int64)),
                "simhash": pa.array(np.asarray(hashes, np.uint64).view(np.int64)),
            }
        )


def audio_neardup_pairs_ds(
    media_table: pa.Table, max_hamming: int = 15, max_bucket: int = 256
):
    """(a, b, hamming): audio near-dup pairs at spectral-fingerprint
    hamming ≤ ``max_hamming`` — decode + FFT hash in an actor pool, then
    the same banded-hamming exchange as text SimHash and image aHash."""
    import ray.data as rd

    from .dedup import hamming_pairs_ds

    hashes = rd.from_arrow(media_table).map_batches(
        AudioFpStage, batch_format="pyarrow", batch_size=32,
        concurrency=(1, 2), num_cpus=1,
    )
    return hamming_pairs_ds(hashes, max_hamming, max_bucket)


def videohash64(frame_hashes: list[int]) -> int:
    """64-bit video hash: bitwise MAJORITY over the sampled frames' aHashes
    (ties → 1, deterministic). Robust to a minority of edited/retimed
    frames; a re-encoded copy keeps most per-frame bits and therefore most
    majority bits."""
    if not frame_hashes:
        return 0
    bits = np.array(
        [[(h >> b) & 1 for b in range(64)] for h in frame_hashes], dtype=np.int64
    )
    maj = (2 * bits.sum(axis=0)) >= len(frame_hashes)
    return int(sum(int(v) << b for b, v in enumerate(maj)))


class VideoHashStage:
    """Actor-pool stage: MRV1 video rows → (doc_id, simhash) rows — sample
    every ``every_k``-th frame, aHash each, majority-combine."""

    def __init__(self, every_k: int = 2):
        self.every_k = max(1, every_k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for i in range(batch.num_rows):
            if batch["media_type"][i].as_py() != "video/mrv1":
                continue
            frames = _video_frames(batch["payload"][i].as_py())
            fh = [
                ahash64(decode_bmp(frames[fi]))
                for fi in range(0, len(frames), self.every_k)
            ]
            ids.append(int(batch["media_id"][i].as_py()))
            hashes.append(videohash64(fh))
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, np.int64)),
                "simhash": pa.array(np.asarray(hashes, np.uint64).view(np.int64)),
            }
        )


def video_neardup_pairs_ds(
    media_table: pa.Table, max_hamming: int = 7, max_bucket: int = 256,
    every_k: int = 2,
):
    """(a, b, hamming): video near-dup pairs — frame-sampled majority
    aHash through the shared banded-hamming exchange; containers never
    shuffle."""
    import ray.data as rd

    from .dedup import hamming_pairs_ds

    hashes = rd.from_arrow(media_table).map_batches(
        VideoHashStage,
        fn_constructor_kwargs={"every_k": every_k},
        batch_format="pyarrow", batch_size=8, concurrency=(1, 2), num_cpus=1,
    )
    return hamming_pairs_ds(hashes, max_hamming, max_bucket)

"""Immutable index segment layout + manifest checkpointing.

The reference persists per-partition index state in LAB LSM trees on local
disk with key layouts ``(prefix, fieldId, term, ...)`` and publishes a
readiness watermark only after all index futures complete
(reference: miru-service/.../lab/LabFieldIndex.java:163-189,
MiruIndexer.java:121-123 ``activityIndex.ready(lastId)``). We re-express the
same information as write-once Parquet files per partition — no LSM needed
because segments are immutable (SURVEY.md §1.3):

    <index_dir>/
      index.json                   # global config: n_parts, tokenizer, fields, version
      part=00042/
        postings.parquet           # one row per term_key: RUNS_SCHEMA (delta+varbyte
                                   #   blocks + block-max metadata + df/ttf/max_tf),
                                   #   sorted by term_key, small row groups so parquet
                                   #   min/max stats give term-level pushdown
        forward.parquet            # doc_id, conv_id, turn_idx, role, tool, ts(us), dl
                                   #   (the activity/forward index + time index +
                                   #   doc-length table, MiruActivityIndex.java:16-135)
        _MANIFEST.json             # written LAST (atomicity: segments → fsync →
                                   #   manifest, mirroring ready(lastId) ordering);
                                   #   lineage + doc/term/byte metrics

Term keys are ``"<field>\\x1f<term>"`` — the analogue of the reference's
``(fieldId, term)`` composite index key (LabFieldIndex.java:82-92).
A build that finds a complete ``_MANIFEST.json`` for a partition skips it
(resumable restarts with per-partition lineage, BASELINE.json north_star).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

FIELD_SEP = "\x1f"
# positions are NOT a version bump: the on-disk format is purely additive
# (extra POS_FIELD rows), detected via the global manifest's "positions"
# flag — a v4 index stays fully readable
INDEX_VERSION = 4  # v2: numeric-lex postings; v3: pairedLatest; v4: composite fields

# fields beside tokenized `text` indexed as single-term (tf=1) postings —
# reference schema analogue: role/tool/conv_id are singleTerm fields
# (MiruFullTextNGTest.java:52-60 user/doc singleTerm; FIXTURES.md F3)
META_FIELDS = ("role", "tool", "conv_id")
# numeric fields: int values lex-encoded into order-preserving fixed-width
# terms so the term dictionary supports range scans — the reference's
# Prefix.NUMERIC term composition (MiruTermComposer.java:130-145,
# MiruFieldDefinition.java:139-198 numeric prefix)
NUM_FIELDS = ("turn_idx",)
TEXT_FIELD = "text"

NUM_LEX_WIDTH = 20  # digits of 2^64-1: covers the full biased int64 range
_NUM_BIAS = np.uint64(1 << 63)


def numeric_lex(v: int) -> str:
    """Order-preserving fixed-width encoding of an int64: bias by 2^63
    (two's-complement sign flip) then zero-pad decimal — lexicographic
    order over the encodings == numeric order over the values. The
    decimal analogue of the reference's UtilLexMarshaller byte encoding
    (MiruTermComposer.java:130-145), chosen so terms stay printable and
    ANSI-SQL-checkable."""
    return format(int(np.uint64(np.int64(v)) + _NUM_BIAS), f"0{NUM_LEX_WIDTH}d")


def numeric_lex_array(arr: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """Vectorized numeric_lex over an integer Arrow column."""
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    a = arr.cast(pa.int64())
    v = pc.fill_null(a, 0).to_numpy(zero_copy_only=False)
    with np.errstate(over="ignore"):
        u = v.astype(np.uint64) + _NUM_BIAS
    s = pc.utf8_lpad(pc.cast(pa.array(u, type=pa.uint64()), pa.string()),
                     NUM_LEX_WIDTH, "0")
    if a.null_count:
        s = pc.if_else(pc.is_null(a), pa.scalar(None, pa.string()), s)
    return s

FORWARD_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int32()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.int64()),  # microseconds since epoch
        ("dl", pa.int32()),  # document length (text token count)
    ]
)


# ------------------------------------------------- lifecycle callbacks
#
# The reference exposes index lifecycle hooks (miru-plugin/.../plugin/
# IndexOpenCallback.java, IndexCommitCallback.java,
# IndexCloseCallback.java): plugins observe partition open / commit /
# close. The rebuild's equivalent: module-level callback lists fired when
# a segment manifest is committed (write_segment / finalize_segment) and
# when an engine opens / closes an index.

_LIFECYCLE_CALLBACKS: dict[str, list] = {"open": [], "commit": [], "close": []}


def register_lifecycle_callback(event: str, fn) -> None:
    """Register ``fn`` for ``event`` ∈ {"open", "commit", "close"}.
    open/close fire with (index_dir); commit fires with (index_dir, part)."""
    if event not in _LIFECYCLE_CALLBACKS:
        raise ValueError(f"unknown lifecycle event {event!r}")
    _LIFECYCLE_CALLBACKS[event].append(fn)


def unregister_lifecycle_callback(event: str, fn) -> None:
    _LIFECYCLE_CALLBACKS[event].remove(fn)


def _fire_lifecycle(event: str, *args) -> None:
    for fn in _LIFECYCLE_CALLBACKS[event]:
        fn(*args)


def term_key(field: str, term: str) -> str:
    return field + FIELD_SEP + term


def part_dir(index_dir: str, part: int) -> str:
    return os.path.join(index_dir, f"part={part:05d}")


def manifest_path(index_dir: str, part: int) -> str:
    return os.path.join(part_dir(index_dir, part), "_MANIFEST.json")


def read_manifest(index_dir: str, part: int) -> dict | None:
    p = manifest_path(index_dir, part)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            m = json.load(f)
        # stale-format segments are treated as absent → resume rebuilds them
        if not m.get("complete") or m.get("version") != INDEX_VERSION:
            return None
        return m
    except (json.JSONDecodeError, OSError):
        return None


def completed_parts(index_dir: str) -> list[int]:
    if not os.path.isdir(index_dir):
        return []
    out = []
    for name in os.listdir(index_dir):
        if name.startswith("part="):
            p = int(name.split("=", 1)[1])
            if read_manifest(index_dir, p) is not None:
                out.append(p)
    return sorted(out)


def write_segment(
    index_dir: str,
    part: int,
    postings: pa.Table,
    forward: pa.Table,
    lineage: dict,
    metrics: dict,
) -> dict:
    """Atomically write one partition segment; manifest LAST (SURVEY.md
    §7.4(7)). Returns the manifest dict."""
    import shutil

    final = part_dir(index_dir, part)
    tmp = final + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    # small row groups → parquet min/max term stats prune reads to the
    # handful of row groups containing the queried terms
    pq.write_table(postings, os.path.join(tmp, "postings.parquet"), row_group_size=1024)
    pq.write_table(forward, os.path.join(tmp, "forward.parquet"), row_group_size=65536)
    manifest = {
        "complete": True,
        "version": INDEX_VERSION,
        "part": part,
        "lineage": lineage,
        "metrics": metrics,
    }
    with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    _fire_lifecycle("commit", index_dir, part)
    return manifest


def finalize_segment(
    index_dir: str,
    part: int,
    postings: pa.Table,
    lineage: dict,
    metrics: dict,
    forward: pa.Table | None = None,
) -> dict:
    """Streaming-build path: write postings + forward, then the manifest
    LAST — the same 'ready after all futures' ordering
    (MiruIndexer.java:121-123)."""
    d = part_dir(index_dir, part)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, "postings.parquet.tmp")
    pq.write_table(postings, tmp, row_group_size=1024)
    os.replace(tmp, os.path.join(d, "postings.parquet"))
    if forward is not None:
        ftmp = os.path.join(d, "forward.parquet.tmp")
        pq.write_table(forward, ftmp, row_group_size=65536)
        os.replace(ftmp, os.path.join(d, "forward.parquet"))
    manifest = {
        "complete": True,
        "version": INDEX_VERSION,
        "part": part,
        "lineage": lineage,
        "metrics": metrics,
    }
    mp = manifest_path(index_dir, part)
    with open(mp + ".tmp", "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(mp + ".tmp", mp)
    _fire_lifecycle("commit", index_dir, part)
    return manifest


def write_global_manifest(index_dir: str, meta: dict) -> None:
    tmp = os.path.join(index_dir, "index.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, os.path.join(index_dir, "index.json"))


def read_global_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "index.json")) as f:
        return json.load(f)


# ------------------------------------------------------------- segment reads


def read_postings_for_terms(index_dir: str, part: int, keys: list[str]) -> pa.Table:
    """Read only the posting rows for ``keys`` (parquet row-group pruning via
    the sorted term_key column's min/max stats)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    path = os.path.join(part_dir(index_dir, part), "postings.parquet")
    if not keys:
        return pq.read_schema(path).empty_table()
    dset = pads.dataset(path, format="parquet")
    return dset.to_table(filter=pc.field("term").isin(keys))


def read_term_dfs(index_dir: str, part: int, keys: list[str]) -> dict[str, int]:
    """term_key → df for ``keys`` — a metadata-only pushdown read (term + df
    columns, row groups pruned by the sorted term stats). The suggester's
    read path: document frequency without touching posting bytes."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    if not keys:
        return {}
    path = os.path.join(part_dir(index_dir, part), "postings.parquet")
    dset = pads.dataset(path, format="parquet")
    t = dset.to_table(filter=pc.field("term").isin(keys), columns=["term", "df"])
    return dict(zip(t["term"].to_pylist(), (int(x) for x in t["df"].to_pylist())))


def read_term_range(index_dir: str, part: int, field: str, prefix: str) -> list[str]:
    """Sorted terms of ``field`` starting with ``prefix`` (wildcard expansion —
    the reference's streamTermIdsForField range scan,
    MiruAggregateUtil.java:1160-1168)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    lo = term_key(field, prefix)
    hi = term_key(field, prefix) + "\U0010ffff"
    path = os.path.join(part_dir(index_dir, part), "postings.parquet")
    dset = pads.dataset(path, format="parquet")
    t = dset.to_table(
        filter=(pc.field("term") >= lo) & (pc.field("term") <= hi), columns=["term"]
    )
    sep_len = len(field) + 1
    return [k[sep_len:] for k in t["term"].to_pylist()]


def read_term_between(
    index_dir: str,
    part: int,
    field: str,
    lo: str | None,
    hi: str | None,
    lo_inc: bool = True,
    hi_inc: bool = True,
) -> list[str]:
    """Sorted terms of ``field`` in the [lo, hi] range (open bounds with
    None) — the term-range scan behind ``field:[lo TO hi]`` queries
    (reference: MiruTermComposer numeric ranges + makeUpperExclusive,
    MiruTermComposer.java:130-145,265-280)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    lo_key = term_key(field, lo if lo is not None else "")
    hi_key = term_key(field, hi) if hi is not None else term_key(field, "") + "\U0010ffff"
    expr = (pc.field("term") >= lo_key) if lo_inc else (pc.field("term") > lo_key)
    expr = expr & ((pc.field("term") <= hi_key) if hi_inc else (pc.field("term") < hi_key))
    path = os.path.join(part_dir(index_dir, part), "postings.parquet")
    dset = pads.dataset(path, format="parquet")
    t = dset.to_table(filter=expr, columns=["term"])
    sep_len = len(field) + 1
    return [k[sep_len:] for k in t["term"].to_pylist()]


def remove_docs(index_dir: str, keys: list[tuple[str, int]]) -> dict[int, int]:
    """Tombstone documents by (conv_id, turn_idx) — the reference's REMOVE
    activity type (MiruPartitionedActivity.java:14-16, removal index
    MiruRemovalIndex.java). DocIds are never reassigned; queries AND-NOT the
    tombstone set out of every answer (buildIndexMask,
    MiruBitmapsRoaring.java:492-503). Idempotent; returns per-partition
    removal counts. Global term stats stay untouched until a rebuild —
    exactly the reference's behavior (the cardinality store is not
    decremented on REMOVE)."""
    out: dict[int, int] = {}
    for part, hits in _resolve_doc_ids(index_dir, keys).items():
        existing = read_tombstones(index_dir, part)
        merged = np.union1d(existing, hits)
        path = os.path.join(part_dir(index_dir, part), "tombstones.parquet")
        tmp = path + ".tmp"
        pq.write_table(
            pa.table({"doc_id": pa.array(merged.astype(np.int32), type=pa.int32())}), tmp
        )
        os.replace(tmp, path)
        out[part] = int(len(merged))
    return out


# ------------------------------------------------- per-stream inbox/unread
#
# The reference tracks per-user-stream state in dedicated indexes: an inbox
# index (docs delivered to a stream, MiruInboxIndex.java) and an unread
# tracking index mutated by READ/UNREAD/MARK_ALL_READ activities
# (MiruUnreadTrackingIndex.java, MiruPartitionedActivity.java:14-16). We
# store each as a sorted docId parquet per (partition, streamId), same
# layout as tombstones — queries AND them in per partition.


def _pack_keys(conv: pa.Array | pa.ChunkedArray, turn: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Pack (conv_id, turn_idx) into one binary key column —
    ``conv\\x1fturn`` — for vectorized membership tests (the same packed-key
    idiom the build uses for its int64 sorts)."""
    packed = pc.binary_join_element_wise(
        pc.cast(conv, pa.string()), pc.cast(turn, pa.string()), "\x1f"
    )
    return packed.combine_chunks() if isinstance(packed, pa.ChunkedArray) else packed


def _resolve_doc_ids(index_dir: str, keys: list[tuple[str, int]]) -> dict[int, np.ndarray]:
    """(conv_id, turn_idx) keys → {part: sorted docIds} via the forward
    tables. Key routing uses the build's conv-hash partitioner; membership
    inside a partition is ONE vectorized ``pc.is_in`` over a packed key
    column — no per-row Python over the (potentially millions-row) forward
    table."""
    from .hashing import fnv1a64_str

    meta = read_global_manifest(index_dir)
    n_parts = meta["n_parts"]
    by_part: dict[int, set[tuple[str, int]]] = {}
    for conv, turn in keys:
        by_part.setdefault(fnv1a64_str(conv) % n_parts, set()).add((conv, int(turn)))
    out: dict[int, np.ndarray] = {}
    for part, want in sorted(by_part.items()):
        if read_manifest(index_dir, part) is None:
            continue
        f = read_forward_table(index_dir, part)
        fwd_keys = _pack_keys(f["conv_id"], f["turn_idx"])
        want_keys = pa.array([f"{c}\x1f{t}" for c, t in sorted(want)], pa.string())
        mask = pc.is_in(fwd_keys, value_set=want_keys).to_numpy(zero_copy_only=False)
        hits = np.flatnonzero(mask).astype(np.int64)
        if len(hits):
            out[part] = hits
    return out


def _stream_file(index_dir: str, part: int, kind: str, stream_id: str) -> str:
    safe = "".join(c if c.isalnum() or c in "-_" else "_" for c in stream_id)
    return os.path.join(part_dir(index_dir, part), f"{kind}-{safe}.parquet")


def _write_doc_set(path: str, docs: np.ndarray) -> None:
    tmp = path + ".tmp"
    pq.write_table(
        pa.table({"doc_id": pa.array(np.asarray(docs, dtype=np.int32), type=pa.int32())}), tmp
    )
    os.replace(tmp, path)


_STREAM_CACHE: dict[tuple, np.ndarray] = {}
_EMPTY_SET = np.empty(0, dtype=np.int64)


def read_stream_set(index_dir: str, part: int, kind: str, stream_id: str) -> np.ndarray:
    """Sorted docIds of a stream's inbox/unread set (empty if none)."""
    path = _stream_file(index_dir, part, kind, stream_id)
    if not os.path.exists(path):
        return _EMPTY_SET
    key = (os.path.abspath(path), os.path.getmtime(path))
    hit = _STREAM_CACHE.get(key)
    if hit is None:
        hit = pq.read_table(path)["doc_id"].to_numpy().astype(np.int64)
        if len(_STREAM_CACHE) > 4096:
            _STREAM_CACHE.clear()
        _STREAM_CACHE[key] = hit
    return hit


def _mutate_stream_set(index_dir: str, kind: str, stream_id: str,
                       keys: list[tuple[str, int]], add: bool) -> dict[int, int]:
    out: dict[int, int] = {}
    for part, docs in _resolve_doc_ids(index_dir, keys).items():
        existing = read_stream_set(index_dir, part, kind, stream_id)
        merged = np.union1d(existing, docs) if add else np.setdiff1d(existing, docs, assume_unique=True)
        _write_doc_set(_stream_file(index_dir, part, kind, stream_id), merged)
        out[part] = int(len(merged))
    return out


def add_to_inbox(index_dir: str, stream_id: str, keys: list[tuple[str, int]]) -> dict[int, int]:
    """Deliver docs to a stream's inbox; newly delivered docs also become
    unread (the reference's inbox backfill marks delivery unread)."""
    _mutate_stream_set(index_dir, "unread", stream_id, keys, add=True)
    return _mutate_stream_set(index_dir, "inbox", stream_id, keys, add=True)


def mark_unread(index_dir: str, stream_id: str, keys: list[tuple[str, int]]) -> dict[int, int]:
    """UNREAD activity analogue."""
    return _mutate_stream_set(index_dir, "unread", stream_id, keys, add=True)


def mark_read(index_dir: str, stream_id: str, keys: list[tuple[str, int]]) -> dict[int, int]:
    """READ activity analogue."""
    return _mutate_stream_set(index_dir, "unread", stream_id, keys, add=False)


def mark_all_read(index_dir: str, stream_id: str) -> None:
    """MARK_ALL_READ activity analogue: clear the stream's unread set."""
    meta = read_global_manifest(index_dir)
    for part in range(meta["n_parts"]):
        path = _stream_file(index_dir, part, "unread", stream_id)
        if os.path.exists(path):
            _write_doc_set(path, np.empty(0, dtype=np.int64))


_TOMBSTONE_CACHE: dict[tuple, np.ndarray] = {}
_NO_TOMBSTONES = np.empty(0, dtype=np.int64)


def read_tombstones(index_dir: str, part: int) -> np.ndarray:
    """Sorted tombstoned docIds of a partition (empty array if none)."""
    path = os.path.join(part_dir(index_dir, part), "tombstones.parquet")
    if not os.path.exists(path):
        return _NO_TOMBSTONES
    key = (os.path.abspath(path), os.path.getmtime(path))
    hit = _TOMBSTONE_CACHE.get(key)
    if hit is None:
        hit = pq.read_table(path)["doc_id"].to_numpy().astype(np.int64)
        if len(_TOMBSTONE_CACHE) > 4096:
            _TOMBSTONE_CACHE.clear()
        _TOMBSTONE_CACHE[key] = hit
    return hit


def read_forward_table(index_dir: str, part: int) -> pa.Table:
    """The full forward table of a partition in docId order, either layout
    (single ``forward.parquet`` or streaming-build fragments)."""
    d = part_dir(index_dir, part)
    single = os.path.join(d, "forward.parquet")
    if os.path.exists(single):
        return pq.read_table(single)
    frags = sorted(f for f in os.listdir(d) if f.startswith("forward-"))
    return pa.concat_tables([pq.read_table(os.path.join(d, f)) for f in frags]).combine_chunks()


_FORWARD_CACHE: dict[tuple, dict[str, np.ndarray | pa.Array]] = {}


def forward_columns(index_dir: str, part: int) -> dict:
    """Forward-table columns for a partition, cached per worker process (the
    Strut-style per-worker cache pattern, StrutModelCache.java:104-140).

    Supports both layouts: a single ``forward.parquet`` (sort-based build)
    or ``forward-<frag>.parquet`` fragments in docId order (streaming build)."""
    d = part_dir(index_dir, part)
    key = (os.path.abspath(d), os.path.getmtime(manifest_path(index_dir, part)))
    hit = _FORWARD_CACHE.get(key)
    if hit is None:
        t = read_forward_table(index_dir, part)
        hit = {
            "ts": t["ts"].to_numpy(),
            "dl": t["dl"].to_numpy(),
            "conv_id": t["conv_id"].combine_chunks(),
            "turn_idx": t["turn_idx"].to_numpy(),
            "role": t["role"].combine_chunks(),
            "tool": t["tool"].combine_chunks(),
            "n_docs": t.num_rows,
        }
        if len(_FORWARD_CACHE) > 64:
            _FORWARD_CACHE.clear()
        _FORWARD_CACHE[key] = hit
    return hit

"""Posting-list codec: delta + varbyte compression with block-max metadata.

The reference stores one Roaring bitmap per (field, term) with a ``lastId``
header, optionally atomized into per-64Ki-docId chunks (reference:
miru-service/.../lab/LabInvertedIndex.java:268-292,335-399) and a cardinality
(tf) store per (field, docId, term) plus a global Σtf row
(LabFieldIndex.java:187-189,422-476).  We re-express the same information in
a Ray-Data-friendly immutable layout (per BASELINE.json north star):

* a posting = sorted docIds, **delta + varbyte** encoded in blocks of
  ``BLOCK_SIZE`` docs, with per-block metadata ``(first_doc, count, max_tf,
  min_dl)`` enabling block-max WAND pruning and skip-decoding;
* tf values varbyte-encoded alongside (the per-doc cardinality store);
* per-posting ``df`` / ``ttf`` / ``max_tf`` (df = Roaring cardinality,
  ttf = the reference's global Σtf row — the TF-IDF denominator).

Everything here is numpy-vectorized over whole Arrow batches: a batch of
(part, term, doc, tf) triples becomes a batch of encoded *runs* in O(cols)
numpy passes, with no per-term Python loop.  Runs produced from different
input batches cover disjoint docId ranges (each batch is a contiguous slice
of a partition's docId order), so the merge stage can concatenate encoded
runs per term by *offset subsampling* — no decode, no per-term loop — the
Ray-native analogue of the reference's LSM append+compact
(MiruLocalHostedPartition.java:1083-1101).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

BLOCK_SIZE = 128

# Pseudo-term holding the document-length table: one "posting" whose docIds
# are all docs of the partition and whose tf is the doc's token count.  The
# analogue of the reference's per-partition activity/time bookkeeping; sorts
# before every real term ("\x01" < any printable byte).
DOCLEN_TERM = "\x01dl"

# Pseudo-term carrying a forward-table slice through the posting shuffle:
# ``doc_bytes`` holds the Arrow-IPC-serialized slice, ``first_doc/last_doc``
# its docId range (fragments concatenate in first_doc order). Never collides
# with real term keys ("<field>\x1f<term>") and sorts before them.
FWD_TERM = "\x00fwd"

# Pseudo-FIELD holding the positional index (opt-in, ``positions=True`` at
# build time): term key "\x02pos\x1f<token>" carries one entry per token
# OCCURRENCE — ``doc_bytes`` is the occurrence's docId stream (non-strict
# increasing: a doc with tf occurrences repeats tf times, delta 0) and the
# ``tf_bytes`` slot holds the token's within-doc position. Reuses the whole
# run/block/merge machinery unchanged (``strict=False`` encode); never
# enumerated by field scans (no real field starts with "\x02"). The
# reference has NO positional index (its Lucene parser throws on
# PhraseQuery, LuceneBackedQueryParser.java:106-109) — this is the
# beyond-reference seam that makes exact phrase queries possible.
POS_FIELD = "\x02pos"

RUNS_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("term", pa.large_string()),
        ("first_doc", pa.int32()),
        ("last_doc", pa.int32()),
        ("df", pa.int32()),
        ("ttf", pa.int64()),
        ("max_tf", pa.int32()),
        ("n_blocks", pa.int32()),
        ("doc_bytes", pa.large_binary()),
        ("tf_bytes", pa.large_binary()),
        ("blk_first", pa.large_list(pa.int32())),
        ("blk_count", pa.large_list(pa.int32())),
        ("blk_max_tf", pa.large_list(pa.int32())),
        ("blk_min_dl", pa.large_list(pa.int32())),
        # per-block END byte offsets into doc_bytes / tf_bytes (run-relative):
        # block i's bytes are [end[i-1], end[i]) — enables partial decode of a
        # block range without touching the rest of a (multi-GB at 10^12-turn
        # scale) posting
        ("blk_doc_end", pa.large_list(pa.int64())),
        ("blk_tf_end", pa.large_list(pa.int64())),
    ]
)


# ----------------------------------------------------------- codec SPI
#
# The reference swaps bitmap backends behind MiruBitmaps
# (miru-plugin/.../bitmap/MiruBitmaps.java:35 — roaring5/roaring6). The
# rebuild's analogue is the VALUE-STREAM codec: how a stream of
# non-negative ints (doc deltas, tfs) becomes bytes. Everything above the
# byte payload — the run/block structure, block-max metadata, per-block
# byte-end offsets, and the offset-subsampling merge — is codec-invariant,
# so a codec is exactly two functions:
#
#   encode(values:int64[n]) -> (bytes:uint8[total], ends:int64[n])
#   decode(buf:uint8[total]) -> uint64[n]
#
# ``ends`` (cumulative byte length after each value) is what the block
# byte-end offsets are derived from, so partial decode works identically
# for every codec. Registered codecs:
#   varbyte — delta+LEB128, ~1 byte/doc on dense postings (default)
#   raw32   — fixed-width little-endian uint32: 4 bytes/value, but decode
#             is a single frombuffer+cast (no bit unpacking) — the
#             decode-bound A/B alternative
# The index's codec is recorded in its manifest (``codec`` key) and every
# reader passes it down; mixing codecs across indexes in one process works.

# LEB128 length thresholds: value >= 2^(7k) needs k+1 bytes
_VB_THRESH = np.uint64(1) << (np.uint64(7) * np.arange(1, 10, dtype=np.uint64))


def varbyte_encode(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized LEB128 encode of non-negative ints.

    Returns ``(bytes:uint8[total], ends:int64[n])`` where ``ends`` is the
    cumulative byte length after each value.

    One searchsorted pass yields every byte length (no per-threshold sweep);
    values that all fit one byte (the common case for tf streams and dense
    doc deltas) short-circuit to a single cast.
    """
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    nb = np.searchsorted(_VB_THRESH, v, side="right").astype(np.int64) + 1
    ends = np.cumsum(nb)
    total = int(ends[-1])
    if total == n:  # every value < 128: the bytes ARE the values
        return v.astype(np.uint8), ends
    starts = ends - nb
    out = np.empty(total, dtype=np.uint8)
    # first byte of EVERY value — no boolean mask on the full array
    out[starts] = ((v & np.uint64(0x7F)).astype(np.uint8)) | (
        (nb > 1).astype(np.uint8) << 7
    )
    maxnb = int(nb.max())
    for j in range(1, maxnb):
        sel = nb > j
        idx = starts[sel] + j
        byte = ((v[sel] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[sel] - 1 > j).astype(np.uint8) << 7
        out[idx] = byte | cont
    return out, ends


def varbyte_decode(buf: np.ndarray) -> np.ndarray:
    """Vectorized LEB128 decode; returns uint64 values."""
    b = np.asarray(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, np.uint64)
    terminal = (b & 0x80) == 0
    group_starts = np.flatnonzero(terminal)
    # start of group i is end of group i-1 + 1
    starts = np.empty(len(group_starts), dtype=np.int64)
    starts[0] = 0
    starts[1:] = group_starts[:-1] + 1
    gid = np.zeros(len(b), dtype=np.int64)
    np.add.at(gid, starts[1:], 1)
    gid = np.cumsum(gid)
    shift = ((np.arange(len(b), dtype=np.int64) - starts[gid]) * 7).astype(np.uint64)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << shift
    return np.add.reduceat(contrib, starts)


def raw32_encode(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Fixed-width codec: each value is 4 little-endian bytes. Encode is a
    cast; decode is a frombuffer view — zero bit manipulation. Larger on
    disk than varbyte (4 bytes/value vs ~1 on dense deltas) but the
    cheapest possible decode. Values must fit uint32 (doc deltas and tfs
    always do — docIds are int32 in the run schema)."""
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    if v.max() > np.uint64(0xFFFFFFFF):
        raise ValueError("raw32 codec: value exceeds uint32")
    buf = v.astype("<u4").view(np.uint8)
    ends = np.arange(4, 4 * n + 1, 4, dtype=np.int64)
    return buf, ends


def raw32_decode(buf: np.ndarray) -> np.ndarray:
    b = np.asarray(buf, dtype=np.uint8)
    return np.frombuffer(b.tobytes(), dtype="<u4").astype(np.uint64)


class VarByteCodec:
    name = "varbyte"
    encode = staticmethod(varbyte_encode)
    decode = staticmethod(varbyte_decode)


class Raw32Codec:
    name = "raw32"
    encode = staticmethod(raw32_encode)
    decode = staticmethod(raw32_decode)


VARBYTE = VarByteCodec()
RAW32 = Raw32Codec()
CODECS = {"varbyte": VARBYTE, "raw32": RAW32}


def get_codec(name: str | None):
    """Resolve a codec by manifest name; None/absent → the default."""
    if name is None:
        return VARBYTE
    try:
        return CODECS[name]
    except KeyError:
        raise ValueError(f"unknown posting codec {name!r}; have {sorted(CODECS)}") from None


def _reduceat(op, values: np.ndarray, starts: np.ndarray) -> np.ndarray:
    if len(starts) == 0:
        return np.empty(0, values.dtype)
    return op.reduceat(values, starts)


def _offsets_and_data(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, int]:
    """(offsets:int64[n+1] absolute, data/values buffer view, value_offset)."""
    typ = arr.type
    if pa.types.is_large_binary(typ) or pa.types.is_large_string(typ):
        off = np.frombuffer(arr.buffers()[1], dtype=np.int64)
    elif pa.types.is_binary(typ) or pa.types.is_string(typ):
        off = np.frombuffer(arr.buffers()[1], dtype=np.int32)
    elif pa.types.is_large_list(typ):
        off = np.frombuffer(arr.buffers()[1], dtype=np.int64)
    elif pa.types.is_list(typ):
        off = np.frombuffer(arr.buffers()[1], dtype=np.int32)
    else:
        raise TypeError(str(typ))
    off = off[arr.offset : arr.offset + len(arr) + 1].astype(np.int64, copy=False)
    return off


def encode_triples_to_runs(
    part: np.ndarray,
    term: pa.Array,
    doc: np.ndarray,
    tf: np.ndarray,
    dl: np.ndarray,
    codec=VARBYTE,
) -> pa.Table:
    """Encode a batch of (part, term, doc, tf, dl) triples — ALREADY sorted by
    (part, term, doc), doc strictly increasing within each (part, term) — into
    one posting *run* per (part, term) with block-max metadata.

    ``dl`` is the document length of ``doc`` (needed for the BM25 block upper
    bound ``min_dl``).  Fully vectorized; no per-term loop.
    """
    n = len(doc)
    if n == 0:
        return RUNS_SCHEMA.empty_table()
    if isinstance(term, pa.ChunkedArray):
        term = term.combine_chunks()
    doc = np.asarray(doc, dtype=np.int64)
    tf = np.asarray(tf, dtype=np.int64)
    dl = np.asarray(dl, dtype=np.int64)
    part = np.asarray(part, dtype=np.int64)

    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    if n > 1:
        same_term = pc.equal(term.slice(1), term.slice(0, n - 1)).to_numpy(zero_copy_only=False)
        new_run[1:] = (part[1:] != part[:-1]) | ~same_term
    run_starts = np.flatnonzero(new_run)
    term_per_run = term.take(pa.array(run_starts)).cast(pa.large_string())
    return _encode_runs(part, term_per_run, doc, tf, dl, new_run, run_starts, codec)


def encode_codes_to_runs(
    part: int,
    codes: np.ndarray,
    doc: np.ndarray,
    tf: np.ndarray,
    dl: np.ndarray,
    dict_terms: pa.Array,
    codec=VARBYTE,
    strict: bool = True,
) -> pa.Table:
    """Integer-coded fast path: triples sorted by (code, doc), one partition.
    ``dict_terms[code]`` is the full term key string (prefix already applied).
    Avoids all per-triple string work — term strings materialize once per RUN
    via a dictionary take.

    ``strict=False`` permits repeated docIds within a run (delta 0) — the
    positional-index occurrence streams (POS_FIELD)."""
    n = len(doc)
    if n == 0:
        return RUNS_SCHEMA.empty_table()
    codes = np.asarray(codes, dtype=np.int64)
    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    if n > 1:
        new_run[1:] = codes[1:] != codes[:-1]
    run_starts = np.flatnonzero(new_run)
    term_per_run = dict_terms.take(pa.array(codes[run_starts])).cast(pa.large_string())
    part_arr = np.full(n, part, dtype=np.int64)
    return _encode_runs(
        part_arr,
        term_per_run,
        np.asarray(doc, dtype=np.int64),
        np.asarray(tf, dtype=np.int64),
        np.asarray(dl, dtype=np.int64),
        new_run,
        run_starts,
        codec,
        strict,
    )


def encode_multi_part_runs(
    part: np.ndarray,
    codes: np.ndarray,
    doc: np.ndarray,
    tf: np.ndarray,
    dl: np.ndarray,
    dict_terms: pa.Array,
    codec=VARBYTE,
    strict: bool = True,
) -> pa.Table:
    """Multi-partition fast path: triples sorted by (part, code, doc), doc
    strictly increasing within each (part, code). One call encodes a whole
    file's token stream across all its partitions."""
    n = len(doc)
    if n == 0:
        return RUNS_SCHEMA.empty_table()
    part = np.asarray(part, dtype=np.int64)
    codes = np.asarray(codes, dtype=np.int64)
    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    if n > 1:
        new_run[1:] = (part[1:] != part[:-1]) | (codes[1:] != codes[:-1])
    run_starts = np.flatnonzero(new_run)
    term_per_run = dict_terms.take(pa.array(codes[run_starts])).cast(pa.large_string())
    return _encode_runs(
        part,
        term_per_run,
        np.asarray(doc, dtype=np.int64),
        np.asarray(tf, dtype=np.int64),
        np.asarray(dl, dtype=np.int64),
        new_run,
        run_starts,
        codec,
        strict,
    )


def _encode_runs(
    part: np.ndarray,
    term_per_run: pa.Array,
    doc: np.ndarray,
    tf: np.ndarray,
    dl: np.ndarray,
    new_run: np.ndarray,
    run_starts: np.ndarray,
    codec=VARBYTE,
    strict: bool = True,
) -> pa.Table:
    n = len(doc)
    n_runs = len(run_starts)
    run_id = np.cumsum(new_run) - 1
    within = np.arange(n, dtype=np.int64) - run_starts[run_id]

    new_block = within % BLOCK_SIZE == 0
    block_starts = np.flatnonzero(new_block)
    blk_first = doc[block_starts].astype(np.int32)
    blk_ends = np.empty(len(block_starts), dtype=np.int64)
    blk_ends[:-1] = block_starts[1:]
    blk_ends[-1] = n
    blk_count = (blk_ends - block_starts).astype(np.int32)
    blk_max_tf = _reduceat(np.maximum, tf, block_starts).astype(np.int32)
    blk_min_dl = _reduceat(np.minimum, dl, block_starts).astype(np.int32)

    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = 0
    deltas[1:] = doc[1:] - doc[:-1]
    deltas[block_starts] = 0  # block-relative: first doc of a block == blk_first
    if n > 1:
        inner = deltas[~new_block]
        # strict=False: occurrence streams (POS_FIELD) repeat a doc once per
        # token occurrence — deltas of 0 are legal, regressions never are
        floor = 0 if strict else -1
        if len(inner) and inner.min() <= floor:
            raise ValueError("doc ids must be increasing within (part, term)")

    doc_buf, doc_ends = codec.encode(deltas)
    tf_buf, tf_ends = codec.encode(tf)

    # per-run byte offsets
    doc_off = np.zeros(n + 1, dtype=np.int64)
    doc_off[1:] = doc_ends
    tf_off = np.zeros(n + 1, dtype=np.int64)
    tf_off[1:] = tf_ends
    run_bounds = np.empty(n_runs + 1, dtype=np.int64)
    run_bounds[:-1] = run_starts
    run_bounds[-1] = n

    doc_bytes = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n_runs, [None, pa.py_buffer(doc_off[run_bounds]), pa.py_buffer(doc_buf)]
    )
    tf_bytes = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n_runs, [None, pa.py_buffer(tf_off[run_bounds]), pa.py_buffer(tf_buf)]
    )

    # per-run block-list offsets
    block_run = run_id[block_starts]
    blocks_per_run = np.bincount(block_run, minlength=n_runs)
    blk_offsets = np.zeros(n_runs + 1, dtype=np.int64)
    np.cumsum(blocks_per_run, out=blk_offsets[1:])

    def _list(arr32: np.ndarray) -> pa.Array:
        return pa.LargeListArray.from_arrays(blk_offsets, pa.array(arr32, type=pa.int32()))

    run_ends = run_bounds[1:] - 1
    df = (run_bounds[1:] - run_bounds[:-1]).astype(np.int32)
    ttf = _reduceat(np.add, tf, run_starts).astype(np.int64)
    max_tf = _reduceat(np.maximum, tf, run_starts).astype(np.int32)

    # per-block byte END offsets, relative to the block's run start
    run_doc_base = doc_off[run_starts][block_run]
    run_tf_base = tf_off[run_starts][block_run]
    blk_doc_end = doc_off[blk_ends] - run_doc_base
    blk_tf_end = tf_off[blk_ends] - run_tf_base

    def _list64(arr: np.ndarray) -> pa.Array:
        return pa.LargeListArray.from_arrays(blk_offsets, pa.array(arr, type=pa.int64()))

    return pa.table(
        {
            "part": pa.array(part[run_starts].astype(np.int32), type=pa.int32()),
            "term": term_per_run,
            "first_doc": pa.array(doc[run_starts].astype(np.int32), type=pa.int32()),
            "last_doc": pa.array(doc[run_ends].astype(np.int32), type=pa.int32()),
            "df": pa.array(df, type=pa.int32()),
            "ttf": pa.array(ttf, type=pa.int64()),
            "max_tf": pa.array(max_tf, type=pa.int32()),
            "n_blocks": pa.array(blocks_per_run.astype(np.int32), type=pa.int32()),
            "doc_bytes": doc_bytes,
            "tf_bytes": tf_bytes,
            "blk_first": _list(blk_first),
            "blk_count": _list(blk_count),
            "blk_max_tf": _list(blk_max_tf),
            "blk_min_dl": _list(blk_min_dl),
            "blk_doc_end": _list64(blk_doc_end),
            "blk_tf_end": _list64(blk_tf_end),
        },
        schema=RUNS_SCHEMA,
    )


def decode_posting(
    doc_bytes: bytes | np.ndarray,
    tf_bytes: bytes | np.ndarray | None,
    blk_first: np.ndarray,
    blk_count: np.ndarray,
    codec=VARBYTE,
) -> tuple[np.ndarray, np.ndarray | None]:
    """Decode one posting (or run) back to (docIds:int64, tfs:int64|None)."""
    deltas = codec.decode(np.frombuffer(doc_bytes, dtype=np.uint8)).astype(np.int64)
    blk_count = np.asarray(blk_count, dtype=np.int64)
    blk_first = np.asarray(blk_first, dtype=np.int64)
    starts = np.zeros(len(blk_count), dtype=np.int64)
    np.cumsum(blk_count[:-1], out=starts[1:])
    v = deltas
    v[starts] = blk_first
    c = np.cumsum(v)
    base = c[starts] - blk_first
    docs = c - np.repeat(base, blk_count)
    tfs = None
    if tf_bytes is not None:
        tfs = codec.decode(np.frombuffer(tf_bytes, dtype=np.uint8)).astype(np.int64)
    return docs, tfs


def decode_posting_range(
    doc_bytes: bytes | np.ndarray,
    tf_bytes: bytes | np.ndarray | None,
    blk_first: np.ndarray,
    blk_count: np.ndarray,
    blk_doc_end: np.ndarray,
    blk_tf_end: np.ndarray,
    b_lo: int,
    b_hi: int,
    codec=VARBYTE,
) -> tuple[np.ndarray, np.ndarray | None]:
    """Partial decode of blocks [b_lo, b_hi) using the per-block byte
    offsets — the scale path for multi-GB hot-term postings: only the
    touched blocks' bytes are read and decoded."""
    blk_doc_end = np.asarray(blk_doc_end, dtype=np.int64)
    blk_tf_end = np.asarray(blk_tf_end, dtype=np.int64)
    d_lo = 0 if b_lo == 0 else int(blk_doc_end[b_lo - 1])
    d_hi = int(blk_doc_end[b_hi - 1])
    buf = np.frombuffer(doc_bytes, dtype=np.uint8)[d_lo:d_hi]
    deltas = codec.decode(buf).astype(np.int64)
    counts = np.asarray(blk_count[b_lo:b_hi], dtype=np.int64)
    firsts = np.asarray(blk_first[b_lo:b_hi], dtype=np.int64)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    v = deltas
    v[starts] = firsts
    c = np.cumsum(v)
    base = c[starts] - firsts
    docs = c - np.repeat(base, counts)
    tfs = None
    if tf_bytes is not None:
        t_lo = 0 if b_lo == 0 else int(blk_tf_end[b_lo - 1])
        t_hi = int(blk_tf_end[b_hi - 1])
        tfs = codec.decode(np.frombuffer(tf_bytes, dtype=np.uint8)[t_lo:t_hi]).astype(np.int64)
    return docs, tfs


def decode_tf_range(
    tf_bytes: bytes | np.ndarray,
    blk_tf_end: np.ndarray,
    b_lo: int,
    b_hi: int,
    codec=VARBYTE,
) -> np.ndarray:
    """Partial decode of the tf values of blocks [b_lo, b_hi) only — the
    lazy-tf path of the query engine: docs decode once for set algebra, tf
    bytes decode per touched block during scoring."""
    blk_tf_end = np.asarray(blk_tf_end, dtype=np.int64)
    t_lo = 0 if b_lo == 0 else int(blk_tf_end[b_lo - 1])
    t_hi = int(blk_tf_end[b_hi - 1])
    return codec.decode(np.frombuffer(tf_bytes, dtype=np.uint8)[t_lo:t_hi]).astype(np.int64)


def merge_runs(runs: pa.Table, codec=VARBYTE) -> pa.Table:
    """Merge encoded runs into one posting row per (part, term).

    Runs from different batches cover disjoint, ordered docId ranges, so the
    merge is a sort by (part, term, first_doc) followed by **offset
    subsampling**: the concatenated encoded bytes of a term's runs are already
    contiguous in the sorted table's buffers, so the merged posting's binary
    value is just a wider offset window.  Zero decode, zero per-term Python.

    Falls back to decode→re-encode for any group whose run ranges overlap
    (cannot happen in the standard pipeline; kept for robustness — mirrors
    the reference's read-modify-write path LabInvertedIndex.java:423-434).
    """
    if runs.num_rows == 0:
        return RUNS_SCHEMA.empty_table()
    runs = runs.combine_chunks()
    n = runs.num_rows
    # sort (part, term, first_doc) NUMERICALLY: dictionary-encode the terms
    # once (one hash pass), lex-rank the (small) dictionary, then one numpy
    # lexsort — the n-row multi-key STRING sort this replaces dominated the
    # finalize profile at millions of pre-merge runs per partition. The key
    # is unique per row (runs of one (part, term) cover disjoint docId
    # ranges), so the permutation equals the stable string sort's exactly.
    term_arr = runs["term"].combine_chunks()
    if isinstance(term_arr, pa.ChunkedArray):
        term_arr = term_arr.chunk(0) if term_arr.num_chunks else pa.array([], runs["term"].type)
    denc = term_arr.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dic = denc.dictionary
    rank = np.empty(len(dic), dtype=np.int64)
    rank[pc.sort_indices(dic).to_numpy(zero_copy_only=False)] = np.arange(len(dic))
    tcode = rank[codes]
    part0 = runs["part"].to_numpy(zero_copy_only=False)
    fd0 = runs["first_doc"].to_numpy(zero_copy_only=False)
    order = np.lexsort((fd0, tcode, part0))
    t = runs.take(pa.array(order)).combine_chunks()
    part = part0[order].astype(np.int64)
    first_doc = fd0[order].astype(np.int64)
    last_doc = t["last_doc"].to_numpy(zero_copy_only=False).astype(np.int64)
    tc = tcode[order]

    new_group = np.empty(n, dtype=bool)
    new_group[0] = True
    if n > 1:
        new_group[1:] = (part[1:] != part[:-1]) | (tc[1:] != tc[:-1])

    overlap = (~new_group) & (first_doc <= np.concatenate([[np.int64(-1)], last_doc[:-1]]))
    if overlap.any():
        # slow path: rebuild offending groups from decoded triples
        bad_gid = np.unique((np.cumsum(new_group) - 1)[overlap])
        gid = np.cumsum(new_group) - 1
        bad_mask = np.isin(gid, bad_gid)
        good = _merge_sorted_runs(t.filter(pa.array(~bad_mask)))
        bad = _reencode_overlapping(t.filter(pa.array(bad_mask)), codec)
        merged = pa.concat_tables([good, bad]).combine_chunks()
        return merged.take(
            pc.sort_indices(merged, sort_keys=[("part", "ascending"), ("term", "ascending")])
        )
    return _merge_sorted_runs(t, new_group)


def _merge_sorted_runs(t: pa.Table, new_group: np.ndarray | None = None) -> pa.Table:
    if t.num_rows == 0:
        return RUNS_SCHEMA.empty_table()
    t = t.combine_chunks()
    n = t.num_rows
    if new_group is None:
        part = t["part"].to_numpy(zero_copy_only=False).astype(np.int64)
        term = t["term"].combine_chunks() if isinstance(t["term"], pa.ChunkedArray) else t["term"]
        new_group = np.empty(n, dtype=bool)
        new_group[0] = True
        if n > 1:
            same_term = pc.equal(term.slice(1), term.slice(0, n - 1)).to_numpy(zero_copy_only=False)
            new_group[1:] = (part[1:] != part[:-1]) | ~same_term
    go = np.flatnonzero(new_group)
    n_groups = len(go)
    bounds = np.empty(n_groups + 1, dtype=np.int64)
    bounds[:-1] = go
    bounds[-1] = n

    def col(name):
        c = t[name]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    def np_col(name, dtype):
        a = col(name).to_numpy(zero_copy_only=False)
        return a if a.dtype == dtype else a.astype(dtype)

    def subsample_binary(name):
        arr = col(name)
        off = _offsets_and_data(arr)
        return pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n_groups, [None, pa.py_buffer(off[bounds]), arr.buffers()[2]]
        )

    def subsample_list(name):
        arr = col(name)
        off = _offsets_and_data(arr)
        values = arr.values
        return pa.LargeListArray.from_arrays(pa.array(off[bounds], type=pa.int64()), values)

    def subsample_shifted_list(name, bytes_name):
        """Like subsample_list, but the values are byte offsets relative to
        their ORIGINAL run's bytes — shift each run's entries by where that
        run's bytes land inside the merged run's concatenated bytes."""
        arr = col(name)
        off = _offsets_and_data(arr)
        byte_off = _offsets_and_data(col(bytes_name))
        gid = np.cumsum(new_group) - 1
        shift_per_row = byte_off[:-1] - byte_off[go[gid]]
        blocks_per_row = off[1:] - off[:-1]  # already int64 views
        values = arr.values.to_numpy(zero_copy_only=False)  # int64, zero-copy
        shifted = values + np.repeat(shift_per_row, blocks_per_row)
        return pa.LargeListArray.from_arrays(
            pa.array(off[bounds], type=pa.int64()), pa.array(shifted, type=pa.int64())
        )

    # native-dtype reduceats: df/n_blocks sums and max_tf maxes fit int32
    # (docIds are int32 so per-(part,term) df ≤ 2^31); ttf stays int64
    df = np.add.reduceat(np_col("df", np.int32), go)
    ttf = np.add.reduceat(np_col("ttf", np.int64), go)
    max_tf = np.maximum.reduceat(np_col("max_tf", np.int32), go)
    n_blocks = np.add.reduceat(np_col("n_blocks", np.int32), go)
    first_doc = np_col("first_doc", np.int32)[go]
    last_doc = np_col("last_doc", np.int32)[bounds[1:] - 1]

    return pa.table(
        {
            "part": col("part").take(pa.array(go)),
            "term": col("term").take(pa.array(go)),
            "first_doc": pa.array(first_doc, type=pa.int32()),
            "last_doc": pa.array(last_doc, type=pa.int32()),
            "df": pa.array(df, type=pa.int32()),
            "ttf": pa.array(ttf, type=pa.int64()),
            "max_tf": pa.array(max_tf, type=pa.int32()),
            "n_blocks": pa.array(n_blocks, type=pa.int32()),
            "doc_bytes": subsample_binary("doc_bytes"),
            "tf_bytes": subsample_binary("tf_bytes"),
            "blk_first": subsample_list("blk_first"),
            "blk_count": subsample_list("blk_count"),
            "blk_max_tf": subsample_list("blk_max_tf"),
            "blk_min_dl": subsample_list("blk_min_dl"),
            "blk_doc_end": subsample_shifted_list("blk_doc_end", "doc_bytes"),
            "blk_tf_end": subsample_shifted_list("blk_tf_end", "tf_bytes"),
        },
        schema=RUNS_SCHEMA,
    )


def _pos_rows_to_runs(p: int, term: str, docs: np.ndarray, pos: np.ndarray,
                      dls: np.ndarray, codec=VARBYTE) -> pa.Table:
    """Re-encode one POS_FIELD occurrence stream (repeated docIds legal)."""
    n = len(docs)
    return encode_codes_to_runs(
        int(p), np.zeros(n, dtype=np.int64), docs, pos, dls,
        pa.array([term], type=pa.large_string()), codec, strict=False,
    )


def _reencode_overlapping(t: pa.Table, codec=VARBYTE) -> pa.Table:
    """Decode overlapping runs to triples and re-encode (robustness path)."""
    parts_out = []
    t = t.combine_chunks()
    part = t["part"].to_numpy(zero_copy_only=False)
    terms = t["term"].to_pylist()
    for key in sorted(set(zip(part.tolist(), terms))):
        p, term = key
        docs_all, tfs_all, dls_all = [], [], []
        for i in range(t.num_rows):
            if part[i] != p or terms[i] != term:
                continue
            row = t.slice(i, 1)
            docs, tfs = decode_posting(
                row["doc_bytes"][0].as_py(),
                row["tf_bytes"][0].as_py(),
                np.asarray(row["blk_first"][0].as_py()),
                np.asarray(row["blk_count"][0].as_py()),
                codec,
            )
            dls = np.repeat(
                np.asarray(row["blk_min_dl"][0].as_py(), dtype=np.int64),
                np.asarray(row["blk_count"][0].as_py(), dtype=np.int64),
            )
            docs_all.append(docs)
            tfs_all.append(tfs)
            dls_all.append(dls)
        docs = np.concatenate(docs_all)
        tfs = np.concatenate(tfs_all)
        dls = np.concatenate(dls_all)
        if term.startswith(POS_FIELD):
            # positional occurrence streams: repeated docIds are the DATA
            # (one entry per occurrence, tf slot = position) — dedupe would
            # destroy them. Re-sort by (doc, position) and keep everything.
            order = np.lexsort((tfs, docs))
            docs, tfs, dls = docs[order], tfs[order], dls[order]
            parts_out.append(
                _pos_rows_to_runs(p, term, docs, tfs, dls, codec)
            )
            continue
        order = np.argsort(docs, kind="stable")
        docs, tfs, dls = docs[order], tfs[order], dls[order]
        # collapse duplicate docIds (keep max tf — upsert semantics)
        keep = np.empty(len(docs), dtype=bool)
        keep[:-1] = docs[:-1] != docs[1:]
        keep[-1] = True
        docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
        parts_out.append(
            encode_triples_to_runs(
                np.full(len(docs), p, dtype=np.int64),
                pa.array([term] * len(docs), type=pa.large_string()),
                docs,
                tfs,
                dls,
                codec,
            )
        )
    return pa.concat_tables(parts_out) if parts_out else RUNS_SCHEMA.empty_table()

"""Property-based codec tests (hypothesis): value-codec round-trips,
posting encode/decode identity, and merge invariance under arbitrary run
splits — each run for BOTH registered codecs (varbyte and raw32), the SPI
contract that makes the backends swappable (the MiruBitmaps.java:35
two-implementations analogue)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from miru_ray.codec import (
    CODECS,
    RAW32,
    RUNS_SCHEMA,
    VARBYTE,
    decode_posting,
    encode_triples_to_runs,
    merge_runs,
    varbyte_decode,
    varbyte_encode,
)

BOTH = pytest.mark.parametrize("codec", [VARBYTE, RAW32], ids=["varbyte", "raw32"])


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(values):
    v = np.asarray(values, dtype=np.uint64)
    buf, ends = varbyte_encode(v)
    out = varbyte_decode(buf)
    np.testing.assert_array_equal(out, v)
    if len(v):
        assert ends[-1] == len(buf)


@BOTH
@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), max_size=200))
@settings(max_examples=100, deadline=None)
def test_codec_roundtrip(codec, values):
    """The SPI contract every codec must satisfy: decode(encode(v)) == v and
    ends[-1] == len(buf). Value domain is uint32 (docIds are int32)."""
    v = np.asarray(values, dtype=np.uint64)
    buf, ends = codec.encode(v)
    np.testing.assert_array_equal(codec.decode(buf), v)
    if len(v):
        assert ends[-1] == len(buf)
    assert len(ends) == len(v)


def test_codec_registry():
    assert set(CODECS) == {"varbyte", "raw32"}
    from miru_ray.codec import get_codec

    assert get_codec(None) is VARBYTE
    assert get_codec("raw32") is RAW32
    with pytest.raises(ValueError):
        get_codec("nope")
    with pytest.raises(ValueError):
        RAW32.encode(np.array([2**33], dtype=np.uint64))


@st.composite
def posting(draw):
    n = draw(st.integers(min_value=1, max_value=300))
    gaps = draw(
        st.lists(st.integers(min_value=1, max_value=10_000), min_size=n, max_size=n)
    )
    docs = np.cumsum(np.asarray(gaps, dtype=np.int64)) - 1
    tfs = np.asarray(
        draw(st.lists(st.integers(min_value=1, max_value=500), min_size=n, max_size=n)),
        dtype=np.int64,
    )
    dls = np.asarray(
        draw(st.lists(st.integers(min_value=1, max_value=400), min_size=n, max_size=n)),
        dtype=np.int64,
    )
    return docs, tfs, dls


@BOTH
@given(posting())
@settings(max_examples=100, deadline=None)
def test_posting_encode_decode_identity(codec, p):
    docs, tfs, dls = p
    t = encode_triples_to_runs(
        np.zeros(len(docs), dtype=np.int64),
        pa.array(["x"] * len(docs), type=pa.large_string()),
        docs,
        tfs,
        dls,
        codec,
    )
    assert t.num_rows == 1
    d, f = decode_posting(
        t["doc_bytes"][0].as_py(), t["tf_bytes"][0].as_py(),
        np.asarray(t["blk_first"][0].as_py()), np.asarray(t["blk_count"][0].as_py()),
        codec,
    )
    np.testing.assert_array_equal(d, docs)
    np.testing.assert_array_equal(f, tfs)
    assert t["df"][0].as_py() == len(docs)
    assert t["ttf"][0].as_py() == int(tfs.sum())
    assert t["max_tf"][0].as_py() == int(tfs.max())
    # block-max metadata is consistent with content
    counts = np.asarray(t["blk_count"][0].as_py())
    assert counts.sum() == len(docs)
    bmax = np.asarray(t["blk_max_tf"][0].as_py())
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    for i, (s, c) in enumerate(zip(starts, counts)):
        assert bmax[i] == tfs[s : s + c].max()


@BOTH
@given(posting(), st.lists(st.integers(min_value=1, max_value=299), max_size=5))
@settings(max_examples=100, deadline=None)
def test_merge_runs_split_invariance(codec, p, cut_points):
    """Splitting a posting into arbitrary consecutive runs and merging must
    reproduce the single-run decode exactly."""
    docs, tfs, dls = p
    cuts = sorted({c for c in cut_points if c < len(docs)})
    bounds = [0] + cuts + [len(docs)]
    parts = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        if hi > lo:
            parts.append(
                encode_triples_to_runs(
                    np.zeros(hi - lo, dtype=np.int64),
                    pa.array(["x"] * (hi - lo), type=pa.large_string()),
                    docs[lo:hi],
                    tfs[lo:hi],
                    dls[lo:hi],
                    codec,
                )
            )
    merged = merge_runs(pa.concat_tables(parts), codec) if parts else RUNS_SCHEMA.empty_table()
    assert merged.num_rows == 1
    d, f = decode_posting(
        merged["doc_bytes"][0].as_py(), merged["tf_bytes"][0].as_py(),
        np.asarray(merged["blk_first"][0].as_py()), np.asarray(merged["blk_count"][0].as_py()),
        codec,
    )
    np.testing.assert_array_equal(d, docs)
    np.testing.assert_array_equal(f, tfs)
    assert merged["df"][0].as_py() == len(docs)
    assert merged["ttf"][0].as_py() == int(tfs.sum())


@BOTH
@given(posting(), st.data())
@settings(max_examples=100, deadline=None)
def test_block_range_decode(codec, p, data):
    """decode_posting_range over any block window == the corresponding slice
    of the full decode — including after a multi-run merge."""
    from miru_ray.codec import decode_posting_range

    docs, tfs, dls = p
    cuts = sorted(
        set(
            data.draw(
                st.lists(st.integers(min_value=1, max_value=max(1, len(docs) - 1)), max_size=3)
            )
        )
        - {0, len(docs)}
    )
    bounds = [0] + [c for c in cuts if c < len(docs)] + [len(docs)]
    parts = [
        encode_triples_to_runs(
            np.zeros(hi - lo, dtype=np.int64),
            pa.array(["x"] * (hi - lo), type=pa.large_string()),
            docs[lo:hi], tfs[lo:hi], dls[lo:hi], codec,
        )
        for lo, hi in zip(bounds[:-1], bounds[1:])
        if hi > lo
    ]
    t = merge_runs(pa.concat_tables(parts), codec)
    assert t.num_rows == 1
    blk_first = np.asarray(t["blk_first"][0].as_py())
    blk_count = np.asarray(t["blk_count"][0].as_py())
    blk_doc_end = np.asarray(t["blk_doc_end"][0].as_py())
    blk_tf_end = np.asarray(t["blk_tf_end"][0].as_py())
    n_blocks = len(blk_first)
    assert blk_doc_end[-1] == len(t["doc_bytes"][0].as_py())
    assert blk_tf_end[-1] == len(t["tf_bytes"][0].as_py())
    b_lo = data.draw(st.integers(min_value=0, max_value=n_blocks - 1))
    b_hi = data.draw(st.integers(min_value=b_lo + 1, max_value=n_blocks))
    d, f = decode_posting_range(
        t["doc_bytes"][0].as_py(), t["tf_bytes"][0].as_py(),
        blk_first, blk_count, blk_doc_end, blk_tf_end, b_lo, b_hi, codec,
    )
    starts = np.concatenate([[0], np.cumsum(blk_count)])
    lo_v, hi_v = int(starts[b_lo]), int(starts[b_hi])
    np.testing.assert_array_equal(d, docs[lo_v:hi_v])
    np.testing.assert_array_equal(f, tfs[lo_v:hi_v])

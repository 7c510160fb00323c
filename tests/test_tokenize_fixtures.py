"""Tokenizer contract + fixture generator determinism."""

import numpy as np
import pyarrow as pa

from miru_ray.fixtures import ensure_transcripts, make_transcripts
from miru_ray.hashing import fnv1a64, fnv1a64_str, splitmix64
from miru_ray.tokenize import py_tokenize, token_counts, tokenize_flat


def test_py_vs_arrow_tokenizer_contract():
    texts = [
        "Hello, World!",
        "foo  bar\tbaz",
        "",
        "UPPER lower 123 mixed42x",
        "éclair naïve",  # non-ascii folds out per [a-z0-9]+ rule
        "a-b_c.d",
        "the and of a to",
    ]
    arr = pa.array(texts + [None], type=pa.string())
    for stop in (False, True):
        parents, toks = tokenize_flat(arr, use_stopwords=stop)
        got = {i: [] for i in range(len(arr))}
        for p, t in zip(parents, toks.to_pylist()):
            got[int(p)].append(t)
        for i, txt in enumerate(texts):
            assert got[i] == py_tokenize(txt, use_stopwords=stop), (stop, txt)
        assert got[len(texts)] == []


def test_sliced_array_tokenizes_window_only():
    # A pa.Array slice keeps the full data buffer with offset>0; tokenize_flat
    # must rebase to the window instead of scanning bytes outside it
    # (regression: parents of -1 and tokens merged across sliced-away rows).
    texts = ["alpha beta", "gamma delta", "EPSILON zeta", "eta theta", "iota"]
    arr = pa.array(texts, type=pa.string())
    for lo, hi in [(1, 4), (0, 2), (2, 5), (3, 3)]:
        sl = arr.slice(lo, hi - lo)
        parents, toks = tokenize_flat(sl)
        got = {i: [] for i in range(len(sl))}
        for p, t in zip(parents, toks.to_pylist()):
            assert 0 <= int(p) < len(sl)
            got[int(p)].append(t)
        for i in range(len(sl)):
            assert got[i] == py_tokenize(texts[lo + i]), (lo, hi, i)


def test_token_counts():
    arr = pa.array(["a b c", "", "x y"])
    parents, toks = tokenize_flat(arr)
    np.testing.assert_array_equal(token_counts(parents, 3), [3, 0, 2])


def test_hash_vectorized_matches_scalar():
    vals = ["", "a", "conv-00000042", "日本語"]
    h = fnv1a64(pa.array(vals, type=pa.string()))
    for i, v in enumerate(vals):
        assert int(h[i]) == fnv1a64_str(v)


def test_splitmix_deterministic():
    a = splitmix64(np.arange(10, dtype=np.uint64))
    b = splitmix64(np.arange(10, dtype=np.uint64))
    np.testing.assert_array_equal(a, b)
    assert len(set(a.tolist())) == 10


def test_fixture_slice_invariance():
    full = make_transcripts(100).to_pandas()
    part = make_transcripts(100, 30, 40).to_pandas()
    sl = full[(full.conv_id >= "conv-00000030") & (full.conv_id < "conv-00000040")]
    assert sl.reset_index(drop=True).equals(part.reset_index(drop=True))


def test_fixture_shape_and_ordering():
    t = make_transcripts(50)
    df = t.to_pandas()
    assert list(t.schema.names) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # ts strictly increasing in stable (conv_id, turn_idx) order
    s = df.sort_values(["conv_id", "turn_idx"])
    assert s.ts.is_monotonic_increasing
    assert (s.groupby("conv_id").turn_idx.min() == 0).all()
    # role/tool invariant
    assert set(df.role) <= {"user", "assistant", "tool"}
    assert (df.loc[df.role != "tool", "tool"] == "").all()
    # core terms present densely (AND queries must have matches)
    assert df.text.str.contains("t3").mean() > 0.5


def test_ensure_transcripts_idempotent(tiny_transcripts_dir):
    import glob

    import pyarrow.parquet as pq

    p2 = ensure_transcripts("tiny")
    assert p2 == tiny_transcripts_dir
    n = sum(
        pq.ParquetFile(f).metadata.num_rows for f in glob.glob(p2 + "/*.parquet")
    )
    assert n == make_transcripts(200).num_rows

"""_POSTING_CACHE LRU semantics (VERDICT r5 #9): eviction order, touch
on hit, negative entries, and epoch-keyed invalidation — cache bugs here
are silent rank corruptions, so each behavior is pinned."""

import os

import pytest

from miru_ray import search as S
from miru_ray.build import build_index
from miru_ray.search import PostingSource
from miru_ray.segments import FIELD_SEP, manifest_path


@pytest.fixture()
def idx1(ray_session, tiny_transcripts_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_pcache"))
    build_index(tiny_transcripts_dir, d, n_parts=1)
    return d


def _keys():
    return [k[3].split(FIELD_SEP, 1)[1] for k in S._POSTING_CACHE]


def test_lru_eviction_order_and_touch(idx1, monkeypatch):
    S._POSTING_CACHE.clear()
    monkeypatch.setattr(S, "_POSTING_CACHE_CAP", 4)

    PostingSource(idx1, 0, [("text", "t1"), ("text", "t2")], 0)
    PostingSource(idx1, 0, [("text", "t3"), ("text", "t4")], 0)
    assert _keys() == ["t1", "t2", "t3", "t4"]

    # HIT on t1 must touch it most-recent (pop+reinsert)
    PostingSource(idx1, 0, [("text", "t1")], 0)
    assert _keys() == ["t2", "t3", "t4", "t1"]

    # two misses at cap → the two least-recently-used (t2, t3) evict;
    # the touched t1 survives
    PostingSource(idx1, 0, [("text", "t5"), ("text", "t6")], 0)
    assert _keys() == ["t4", "t1", "t5", "t6"]


def test_negative_entries_cached_and_lru(idx1, monkeypatch):
    S._POSTING_CACHE.clear()
    monkeypatch.setattr(S, "_POSTING_CACHE_CAP", 4)

    src = PostingSource(idx1, 0, [("text", "zz_absent_term")], 0)
    assert ("text", "zz_absent_term") not in src.df
    key = next(iter(S._POSTING_CACHE))
    assert S._POSTING_CACHE[key] is None  # negative entry stored

    # a second ask is a HIT: no storage read
    calls = {"n": 0}
    orig = S.read_postings_for_terms

    def counting(index_dir, part, terms):
        calls["n"] += 1
        return orig(index_dir, part, terms)

    monkeypatch.setattr(S, "read_postings_for_terms", counting)
    src2 = PostingSource(idx1, 0, [("text", "zz_absent_term")], 0)
    assert ("text", "zz_absent_term") not in src2.df
    assert calls["n"] == 0


def test_epoch_bump_invalidates_without_serving_stale(idx1, monkeypatch):
    """Entries are keyed by the partition manifest's mtime: after a
    mutation bumps it, a warm process must RE-READ postings under the new
    epoch rather than serve the pre-mutation arrays — even while old-epoch
    entries still sit in the cache (they are dead weight, never hits)."""
    S._POSTING_CACHE.clear()
    src = PostingSource(idx1, 0, [("text", "t1")], 0)
    df_before = src.df[("text", "t1")]
    n_before = len(S._POSTING_CACHE)

    # simulate extend/repair: the manifest mtime moves forward
    mp = manifest_path(idx1, 0)
    st = os.stat(mp)
    os.utime(mp, (st.st_atime + 10, st.st_mtime + 10))

    calls = {"n": 0}
    orig = S.read_postings_for_terms

    def counting(index_dir, part, terms):
        calls["n"] += 1
        return orig(index_dir, part, terms)

    monkeypatch.setattr(S, "read_postings_for_terms", counting)
    src2 = PostingSource(idx1, 0, [("text", "t1")], 0)
    assert calls["n"] == 1  # old-epoch entry was NOT served
    assert src2.df[("text", "t1")] == df_before
    assert len(S._POSTING_CACHE) == n_before + 1  # both epochs resident

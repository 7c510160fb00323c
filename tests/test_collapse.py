"""Field-collapsing search (one best hit per conv_id / role — Lucene
CollapsingTopDocsCollector analogue): collapsed top-k must equal the
first-occurrence-per-key prefix of the FULL uncollapsed answer order, for
every scorer, across a multi-partition index."""

import pytest

from miru_ray.build import build_index
from miru_ray.search import SearchEngine

N_PARTS = 4
QUERIES = ["t1 t7", "t1 OR w00042", "t1 AND NOT t9", "role:tool t3"]
BIG_K = 100_000


@pytest.fixture(scope="module")
def engine(ray_session, tiny_transcripts_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_collapse"))
    build_index(tiny_transcripts_dir, d, n_parts=N_PARTS)
    return SearchEngine(d)


def brute_collapse(full_hits, key, k):
    """First occurrence per key in the realized total answer order — with
    BIG_K no list is truncated anywhere, so this IS the collapsed truth."""
    out, seen = [], set()
    for h in full_hits:
        kv = getattr(h, key)
        if kv in seen:
            continue
        seen.add(kv)
        out.append(h)
        if len(out) == k:
            break
    return out


@pytest.mark.parametrize("scoring", ["ref_tfidf", "bm25", "time"])
@pytest.mark.parametrize("key", ["conv_id", "role"])
def test_collapse_rank_identity(engine, scoring, key):
    for q in QUERIES:
        full, found_full = engine.search(q, k=BIG_K, scoring=scoring)
        for k in (1, 5, 20):
            # early_exit=False: under TIME the exit legitimately shrinks
            # ``found`` to the partitions asked (documented); the exactness
            # of the exit itself is covered below
            got, found = engine.search(q, k=k, scoring=scoring, collapse=key,
                                       early_exit=False)
            want = brute_collapse(full, key, k)
            assert [
                (h.part, h.doc_id, h.score) for h in got
            ] == [(h.part, h.doc_id, h.score) for h in want], (q, scoring, key, k)
            # found stays uncollapsed (Lucene totalHits semantics)
            assert found == found_full, (q, scoring, key)
            # keys are distinct
            assert len({getattr(h, key) for h in got}) == len(got)


def test_collapse_validation(engine):
    with pytest.raises(ValueError):
        engine.search("t1", k=5, collapse="tool")
    with pytest.raises(ValueError):
        engine.search("t1", k=5, scoring="match", collapse="role")
    with pytest.raises(ValueError):
        engine.search("t1", k=5, collapse="role",
                      after=(1.0, 0, 0, 0))


def brute_group_topk(full_hits, key, n_groups, per_group):
    """Group truth from the untruncated answer order: groups in
    first-occurrence (= best-rep) order, each with its first per_group
    occurrences."""
    order, groups = [], {}
    for h in full_hits:
        kv = getattr(h, key)
        if kv not in groups:
            if len(order) == n_groups:
                if kv not in groups:
                    continue
            order.append(kv)
            groups[kv] = []
        if len(groups[kv]) < per_group:
            groups[kv].append(h)
    return [(kv, groups[kv]) for kv in order[:n_groups]]


@pytest.mark.parametrize("scoring", ["ref_tfidf", "bm25", "time"])
@pytest.mark.parametrize("key", ["conv_id", "role"])
def test_group_topk_vs_brute(engine, scoring, key):
    for q in QUERIES:
        full, found_full = engine.search(q, k=BIG_K, scoring=scoring,
                                         early_exit=False)
        got, found = engine.group_topk(q, n_groups=4, per_group=3, key=key,
                                       scoring=scoring)
        want = brute_group_topk(full, key, 4, 3)
        assert [(kv, [(h.part, h.doc_id, h.score) for h in hs]) for kv, hs in got] == [
            (kv, [(h.part, h.doc_id, h.score) for h in hs]) for kv, hs in want
        ], (q, scoring, key)
        assert found == found_full


def test_collapse_time_early_exit(engine):
    """The TIME walk's zone-map exit stays exact under collapse."""
    full, _ = engine.search("t1", k=BIG_K, scoring="time", early_exit=False)
    want = brute_collapse(full, "conv_id", 5)
    got, _ = engine.search("t1", k=5, scoring="time", collapse="conv_id",
                           early_exit=True)
    assert [(h.part, h.doc_id) for h in got] == [(h.part, h.doc_id) for h in want]


def test_collapse_edges(engine):
    # no matches → empty, found 0
    hits, found = engine.search("zzqqxx", k=5, collapse="role")
    assert hits == [] and found == 0
    # k larger than distinct keys → every key once
    full, _ = engine.search("t1", k=BIG_K, scoring="bm25", early_exit=False)
    distinct_roles = {h.role for h in full}
    hits, _ = engine.search("t1", k=1000, scoring="bm25", collapse="role")
    assert len(hits) == len(distinct_roles)
    assert {h.role for h in hits} == distinct_roles


def test_group_topk_edges(engine):
    got, found = engine.group_topk("zzqqxx", n_groups=3, per_group=2)
    assert got == [] and found == 0
    # more groups than distinct keys → all keys, still exact
    full, _ = engine.search("t1", k=BIG_K, scoring="ref_tfidf", early_exit=False)
    want = brute_group_topk(full, "role", 1000, 2)
    got, _ = engine.group_topk("t1", n_groups=1000, per_group=2, key="role")
    assert [(kv, [(h.part, h.doc_id) for h in hs]) for kv, hs in got] == [
        (kv, [(h.part, h.doc_id) for h in hs]) for kv, hs in want
    ]


def test_count_matches_found(engine):
    for q in QUERIES + ["zzqqxx"]:
        full, found = engine.search(q, k=100_000, scoring="bm25",
                                    early_exit=False)
        assert engine.count(q) == found == len(full)


def test_collapse_composes_with_masks(engine):
    """collapse under a time_range and an authz mask: equals the collapsed
    prefix of the masked full answer."""
    full, _ = engine.search("t1", k=BIG_K, scoring="bm25", early_exit=False)
    ts_vals = sorted(h.ts for h in full)
    lo, hi = ts_vals[len(ts_vals) // 4], ts_vals[3 * len(ts_vals) // 4]
    fullr, foundr = engine.search("t1", k=BIG_K, scoring="bm25",
                                  time_range=(lo, hi), early_exit=False)
    got, found = engine.search("t1", k=5, scoring="bm25", collapse="role",
                               time_range=(lo, hi))
    assert [(h.part, h.doc_id) for h in got] == [
        (h.part, h.doc_id) for h in brute_collapse(fullr, "role", 5)
    ]
    assert found == foundr

    fulla, founda = engine.search("t1", k=BIG_K, scoring="bm25",
                                  authz=("role", ["user"]), early_exit=False)
    gota, found_a = engine.search("t1", k=5, scoring="bm25", collapse="conv_id",
                                  authz=("role", ["user"]))
    assert [(h.part, h.doc_id) for h in gota] == [
        (h.part, h.doc_id) for h in brute_collapse(fulla, "conv_id", 5)
    ]
    assert found_a == founda

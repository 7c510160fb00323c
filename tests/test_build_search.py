"""End-to-end gates (FIXTURES.md F4): posting contents vs brute force,
per-turn text equality, top-k rank identity vs the oracle, resume,
parallelism/chunking invariance."""

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from miru_ray.build import build_index, build_segment_table
from miru_ray.codec import decode_posting
from miru_ray.oracle import oracle_search
from miru_ray.search import Hit, SearchEngine, search_partition
from miru_ray.segments import FIELD_SEP, completed_parts, read_forward_table, read_manifest

N_PARTS = 4

# FIXTURES.md F2 query families
QUERIES = [
    "t3",
    "t1 t7",
    "t1 AND t7 AND w00042",
    "t1 t2 t3 t4 t5",
    "t1 OR w00999",
    "t1 OR t2 OR t3",
    "t1 AND NOT t9",
    "NOT t2",
    "t1 t1 w00042",
    "w004*",
    "role:tool t3",
    "conv-00000007",  # tokenizes to conv + 00000007 (AND)
    "t1 AND (t2 OR t3)",
    "tf tf tf",
    # numeric range terms (Prefix.NUMERIC composition)
    "turn_idx:[3 TO 7] t1",
    "turn_idx:{0 TO 5} t3",
    "turn_idx:[30 TO *]",
    "t1 AND NOT turn_idx:[0 TO 10]",
    # fuzzy terms (Lucene FuzzyQuery syntax; dictionary + Levenshtein≤k)
    "t1~1",
    "w00042~1 t1",
    "t1 AND NOT t9~1",
    "w00042~2 OR t3",
    # regexp terms (Lucene RegexpQuery syntax; dictionary + anchored RE2)
    "/t[13]/",
    "/w00[45].*/ t1",
    "t1 AND NOT /t[29]/",
    # integer boosts (collector-count multiplication)
    "t1^3 t7",
    "t1^2 OR t2",
]


@pytest.fixture(scope="module")
def index_dir(ray_session, tiny_transcripts_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx"))
    build_index(tiny_transcripts_dir, d, n_parts=N_PARTS)
    return d


@pytest.fixture(scope="module")
def engine(index_dir):
    return SearchEngine(index_dir)


def test_build_manifests(index_dir, tiny_rows):
    parts = completed_parts(index_dir)
    assert parts == list(range(N_PARTS))
    total = sum(read_manifest(index_dir, p)["metrics"]["n_docs"] for p in parts)
    assert total == len(tiny_rows)


def test_posting_contents_vs_oracle(index_dir, tiny_oracle):
    """F4.1/F4.2: decoded segment postings == brute-force postings (docIds,
    tfs, df, Σtf) for every term of every partition."""
    for p, opart in tiny_oracle.items():
        t = pq.read_table(os.path.join(index_dir, f"part={p:05d}", "postings.parquet"))
        seen = set()
        for i in range(t.num_rows):
            key = t["term"][i].as_py()
            field, term = key.split(FIELD_SEP, 1)
            docs, tfs = decode_posting(
                t["doc_bytes"][i].as_py(),
                t["tf_bytes"][i].as_py(),
                np.asarray(t["blk_first"][i].as_py()),
                np.asarray(t["blk_count"][i].as_py()),
            )
            exp = opart.post[field][term]
            exp_docs = sorted(exp)
            assert list(docs) == exp_docs, (p, field, term)
            assert list(tfs) == [exp[d] for d in exp_docs], (p, field, term)
            assert t["df"][i].as_py() == len(exp)
            assert t["ttf"][i].as_py() == sum(exp.values())
            seen.add((field, term))
        # completeness: every oracle term is present
        for field, post in opart.post.items():
            for term in post:
                assert (field, term) in seen, (p, field, term)


def test_per_turn_text_equality(index_dir, tiny_rows, tiny_oracle):
    """F4.4 (the BASELINE.json per-row invariant): docId → (conv_id,
    turn_idx) → original text row, under stable ordering."""
    by_key = {(r["conv_id"], r["turn_idx"]): r for r in tiny_rows}
    for p in completed_parts(index_dir):
        f = read_forward_table(index_dir, p)
        d = f.to_pydict()
        assert d["doc_id"] == list(range(f.num_rows))
        keys = list(zip(d["conv_id"], d["turn_idx"]))
        assert keys == sorted(keys)  # stable (conv_id, turn_idx) order
        opart = tiny_oracle[p]
        for i in range(f.num_rows):
            r = by_key[keys[i]]
            assert r["role"] == d["role"][i]
            assert r["ts"] == d["ts"][i]
            # text equality via the oracle's tokenized copy
            assert opart.conv_id[i] == d["conv_id"][i]
            assert opart.turn_idx[i] == d["turn_idx"][i]


def _assert_rank_identical(hits: list[Hit], ohits, scores_rtol=2e-5):
    got = [(h.part, h.doc_id) for h in hits]
    exp = [(h.part, h.doc_id) for h in ohits]
    assert got == exp
    np.testing.assert_allclose(
        [h.score for h in hits], [h.score for h in ohits], rtol=scores_rtol, atol=1e-7
    )
    assert [(h.conv_id, h.turn_idx, h.ts) for h in hits] == [
        (h.conv_id, h.turn_idx, h.ts) for h in ohits
    ]


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identity_tfidf(engine, tiny_oracle, query):
    """F4.3: engine top-k == oracle top-k (§3.3 contract), k ∈ {1,10,100}."""
    for k in (1, 10, 100):
        hits, found = engine.search(query, k=k)
        ohits, ofound = oracle_search(tiny_oracle, query, k=k)
        assert found == ofound, (query, k)
        _assert_rank_identical(hits, ohits)


@pytest.mark.parametrize("query", ["t3", "t1 t7", "t1 OR w00999", "w004*", "t1 AND NOT t9"])
def test_rank_identity_lmd(engine, tiny_oracle, query):
    """Dirichlet query-likelihood scorer (scoring="lmd"): engine fp32 path
    rank- and score-identical to the scalar oracle, like bm25/tfidf."""
    for k in (1, 10, 50):
        hits, found = engine.search(query, k=k, scoring="lmd")
        ohits, ofound = oracle_search(tiny_oracle, query, k=k, scoring="lmd")
        assert found == ofound
        _assert_rank_identical(hits, ohits)


@pytest.mark.parametrize("query", ["t3", "t1 t7", "t1 OR w00999", "w004*"])
def test_rank_identity_bm25(engine, tiny_oracle, query):
    for k in (1, 10, 50):
        hits, found = engine.search(query, k=k, scoring="bm25")
        ohits, ofound = oracle_search(tiny_oracle, query, k=k, scoring="bm25")
        assert found == ofound
        _assert_rank_identical(hits, ohits)


def test_rank_identity_time(engine, tiny_oracle):
    # exhaustive mode: hits AND found identical to the all-partition oracle
    hits, found = engine.search("t1 t7", k=20, scoring="time", early_exit=False)
    ohits, ofound = oracle_search(tiny_oracle, "t1 t7", k=20, scoring="time")
    assert found == ofound
    assert [(h.part, h.doc_id) for h in hits] == [(h.part, h.doc_id) for h in ohits]
    assert all(h.score == 0.0 for h in hits)
    # default mode: the zone-map early exit may skip partitions (found then
    # counts only asked partitions, like the reference's short-circuited
    # evaluator) but the HITS are identical
    ehits, efound = engine.search("t1 t7", k=20, scoring="time")
    assert [(h.part, h.doc_id) for h in ehits] == [(h.part, h.doc_id) for h in ohits]
    assert efound <= ofound


def test_rank_identity_time_range(engine, tiny_oracle):
    ts_values = sorted(ts for p in tiny_oracle.values() for ts in p.ts)
    lo, hi = ts_values[len(ts_values) // 4], ts_values[3 * len(ts_values) // 4]
    for q in ("t1 t7", "NOT t2"):
        hits, found = engine.search(q, k=10, time_range=(lo, hi))
        ohits, ofound = oracle_search(tiny_oracle, q, k=10, time_range=(lo, hi))
        assert found == ofound
        _assert_rank_identical(hits, ohits)


def test_serial_equals_parallel(engine):
    a, fa = engine.search("t1 t7", k=25, parallel=True)
    b, fb = engine.search("t1 t7", k=25, parallel=False)
    assert fa == fb
    assert [(h.part, h.doc_id, h.score) for h in a] == [
        (h.part, h.doc_id, h.score) for h in b
    ]


def test_chunking_invariance(tiny_transcripts_dir):
    """F4.6: segment content independent of in-task chunk size (the two-stage
    merge must be lossless)."""
    import miru_ray.build as B

    t = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(tiny_transcripts_dir + "/*.parquet"))]
    )
    from miru_ray.build import route_partition

    t = route_partition(t, N_PARTS, frozenset())
    g = t.filter(pa.compute.equal(t["part"], 1))
    old = B.CHUNK_DOCS
    try:
        B.CHUNK_DOCS = 97
        p1, f1, s1 = build_segment_table(g)
        B.CHUNK_DOCS = 100_000
        p2, f2, s2 = build_segment_table(g)
    finally:
        B.CHUNK_DOCS = old
    assert s1 == s2
    assert f1.equals(f2)
    assert p1.num_rows == p2.num_rows
    # decoded postings identical (encoded bytes may differ in block splits)
    for i in range(p1.num_rows):
        assert p1["term"][i].as_py() == p2["term"][i].as_py()
        for tbl in ():
            pass
        d1, t1_ = decode_posting(
            p1["doc_bytes"][i].as_py(), p1["tf_bytes"][i].as_py(),
            np.asarray(p1["blk_first"][i].as_py()), np.asarray(p1["blk_count"][i].as_py()),
        )
        d2, t2_ = decode_posting(
            p2["doc_bytes"][i].as_py(), p2["tf_bytes"][i].as_py(),
            np.asarray(p2["blk_first"][i].as_py()), np.asarray(p2["blk_count"][i].as_py()),
        )
        np.testing.assert_array_equal(d1, d2)
        np.testing.assert_array_equal(t1_, t2_)


def test_resume_skips_completed(ray_session, tiny_transcripts_dir, tmp_path_factory, index_dir):
    """F4.5: restart after partial build → remaining partitions built,
    results identical to the uninterrupted build."""
    d = str(tmp_path_factory.mktemp("idx_resume"))
    # simulate a partial build: copy 2 completed partitions from the full one
    for p in (0, 2):
        shutil.copytree(
            os.path.join(index_dir, f"part={p:05d}"), os.path.join(d, f"part={p:05d}")
        )
    meta = build_index(tiny_transcripts_dir, d, n_parts=N_PARTS, resume=True)
    assert meta["parts_resumed"] == [0, 2]
    assert sorted(meta["parts_built"]) == [1, 3]
    # all four partitions' postings equal the reference build's
    for p in range(N_PARTS):
        a = pq.read_table(os.path.join(index_dir, f"part={p:05d}", "postings.parquet"))
        b = pq.read_table(os.path.join(d, f"part={p:05d}", "postings.parquet"))
        assert a.equals(b), p


def test_single_partition_direct_task(index_dir, tiny_oracle):
    """search_partition as a plain function (the unit the Ray tasks wrap)."""
    from miru_ray.oracle import score_partition

    p = max(tiny_oracle)
    r = search_partition(index_dir, p, "t1 t7", 10)
    ohits, ofound = score_partition(tiny_oracle[p], "t1 t7", 10)
    assert r["found"] == ofound
    assert list(r["doc_id"]) == [h.doc_id for h in ohits]


def test_sort_strategy_equals_stream(ray_session, tiny_transcripts_dir, tmp_path_factory, index_dir):
    """The sort-based (groupby raw rows) and streaming (offset) builds must
    produce byte-identical postings and forward contents."""
    d = str(tmp_path_factory.mktemp("idx_sortstrat"))
    meta = build_index(tiny_transcripts_dir, d, n_parts=N_PARTS, strategy="sort")
    assert "strategy" not in meta or meta.get("strategy") != "stream"
    for p in range(N_PARTS):
        a = pq.read_table(os.path.join(index_dir, f"part={p:05d}", "postings.parquet"))
        b = pq.read_table(os.path.join(d, f"part={p:05d}", "postings.parquet"))
        assert a.equals(b), p
        assert read_forward_table(index_dir, p).equals(read_forward_table(d, p)), p


def test_groupby_exchange_equals_spill(ray_session, tiny_transcripts_dir, tmp_path_factory, index_dir):
    """exchange='groupby' (packed runs through the one groupby(part)
    exchange, SegmentFinalizer actor pool) must equal the default spill
    exchange byte-for-byte — and must not deadlock the fixed FileIndexer
    pool against the finalizer pool's min-1 actor (fi_conc is reduced by
    one in this branch)."""
    from miru_ray.build import build_index_streaming

    d = str(tmp_path_factory.mktemp("idx_groupby"))
    meta = build_index_streaming(tiny_transcripts_dir, d, n_parts=N_PARTS, exchange="groupby")
    assert meta is not None and meta["strategy"] == "stream"
    for p in range(N_PARTS):
        a = pq.read_table(os.path.join(index_dir, f"part={p:05d}", "postings.parquet"))
        b = pq.read_table(os.path.join(d, f"part={p:05d}", "postings.parquet"))
        assert a.equals(b), p
        assert read_forward_table(index_dir, p).equals(read_forward_table(d, p)), p


def test_auto_falls_back_on_unsorted_input(ray_session, tiny_transcripts_dir, tmp_path_factory, index_dir):
    """Files renamed out of conv order violate the streaming precondition;
    strategy='auto' must detect it in the metadata pass and fall back to the
    sort-based build with identical results."""
    src = str(tmp_path_factory.mktemp("shuffled_input"))
    t = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(tiny_transcripts_dir + "/*.parquet"))]
    )
    half = t.num_rows // 2
    # second half first → file-boundary order violated
    pq.write_table(t.slice(half), os.path.join(src, "shard-00000.parquet"))
    pq.write_table(t.slice(0, half), os.path.join(src, "shard-00001.parquet"))
    d = str(tmp_path_factory.mktemp("idx_fallback"))
    meta = build_index(src, d, n_parts=N_PARTS, strategy="auto")
    assert meta.get("strategy") != "stream"
    for p in range(N_PARTS):
        a = pq.read_table(os.path.join(index_dir, f"part={p:05d}", "postings.parquet"))
        b = pq.read_table(os.path.join(d, f"part={p:05d}", "postings.parquet"))
        assert a.equals(b), p


def test_actor_engine_equals_tasks(index_dir):
    """Partition-pinned actor pool returns identical answers (and caches
    across repeated queries)."""
    plain = SearchEngine(index_dir)
    actor = SearchEngine(index_dir, use_actors=True, n_actors=2)
    for q in ("t1 t7", "t1 OR w00042", "NOT t2", "w004*"):
        a, fa = plain.search(q, k=15)
        for _ in range(2):  # second round exercises the warm cache
            b, fb = actor.search(q, k=15)
            assert fa == fb
            assert [(h.part, h.doc_id, h.score) for h in a] == [
                (h.part, h.doc_id, h.score) for h in b
            ]


@pytest.mark.parametrize(
    "query",
    [
        "t1 OR t2 OR t3", "t3", "t1 OR w00999", "w00042 OR w00123 OR t5",
        # conjunctive (AND) pruning path
        "t1 t7", "t1 AND t7 AND w00042", "t1 t2 t3 t4 t5", "t1 t1 w00042",
    ],
)
@pytest.mark.parametrize("scoring", ["ref_tfidf", "bm25"])
def test_wand_pruned_equals_full(engine, query, scoring):
    """Block-max pruned disjunctive top-k must be bit-identical to the full
    evaluation path (scores, docs, order, found)."""
    for k in (1, 5, 40):
        a, fa = engine.search(query, k=k, scoring=scoring, prune=True, parallel=False)
        b, fb = engine.search(query, k=k, scoring=scoring, prune=False, parallel=False)
        assert fa == fb
        assert [(h.part, h.doc_id, h.score) for h in a] == [
            (h.part, h.doc_id, h.score) for h in b
        ], (query, scoring, k)


def test_extend_index_append_epoch(ray_session, tiny_transcripts_dir, tmp_path_factory, index_dir):
    """Sip analogue: build on the first half of the conv range, extend with
    the second half (convs sort strictly after → append order == lex order),
    and the result must be byte-identical to the one-shot build. A repeated
    extend with the same files is a no-op (epoch markers)."""
    t = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(tiny_transcripts_dir + "/*.parquet"))]
    )
    convs = t["conv_id"].to_pylist()
    cut_conv = sorted(set(convs))[len(set(convs)) // 2]
    first = t.filter(pa.compute.less(t["conv_id"], cut_conv))
    second = t.filter(pa.compute.greater_equal(t["conv_id"], cut_conv))
    src = str(tmp_path_factory.mktemp("epoch_src"))
    pq.write_table(first, os.path.join(src, "epoch1.parquet"))
    second_dir = str(tmp_path_factory.mktemp("epoch_src2"))
    pq.write_table(second, os.path.join(second_dir, "epoch2.parquet"))

    from miru_ray.build import extend_index

    d = str(tmp_path_factory.mktemp("idx_extend"))
    build_index(src, d, n_parts=N_PARTS)
    meta = extend_index(second_dir, d)
    assert meta["epochs"][-1]["parts_updated"]

    def decoded(path):
        t = pq.read_table(path)
        out = {}
        for i in range(t.num_rows):
            docs, tfs = decode_posting(
                t["doc_bytes"][i].as_py(), t["tf_bytes"][i].as_py(),
                np.asarray(t["blk_first"][i].as_py()), np.asarray(t["blk_count"][i].as_py()),
            )
            out[t["term"][i].as_py()] = (
                list(docs), list(tfs), t["df"][i].as_py(), t["ttf"][i].as_py(),
            )
        return out

    for p in range(N_PARTS):
        # encoded bytes may differ (block boundaries follow epoch runs);
        # decoded content must be identical to the one-shot build
        a = decoded(os.path.join(index_dir, f"part={p:05d}", "postings.parquet"))
        b = decoded(os.path.join(d, f"part={p:05d}", "postings.parquet"))
        assert a == b, p
        assert read_forward_table(index_dir, p).equals(read_forward_table(d, p)), p
    # idempotent re-extend: all partitions skip
    meta2 = extend_index(second_dir, d)
    assert meta2["epochs"][-1]["parts_updated"] == []
    assert meta2["epochs"][-1]["parts_skipped"] == sorted(range(N_PARTS))


def test_remove_docs_masks_answers(ray_session, tiny_transcripts_dir, tiny_rows, tiny_oracle, tmp_path_factory):
    """REMOVE parity: tombstoned docs vanish from every answer (match, top-k,
    TIME) while docIds and term stats stay untouched; rank-identity holds vs
    the oracle with the same removal mask; re-removal is idempotent."""
    from miru_ray.segments import read_tombstones, remove_docs

    d = str(tmp_path_factory.mktemp("idx_remove"))
    build_index(tiny_transcripts_dir, d, n_parts=N_PARTS)
    # remove every 7th row of the corpus
    victims = [(r["conv_id"], r["turn_idx"]) for r in tiny_rows[::7]]
    counts = remove_docs(d, victims)
    assert sum(counts.values()) == len(victims)
    counts2 = remove_docs(d, victims)  # idempotent
    assert counts2 == counts

    removed = {p: set(read_tombstones(d, p).tolist()) for p in range(N_PARTS)}
    eng = SearchEngine(d)
    for q in ("t1 t7", "t1 OR w00999", "NOT t2", "w004*"):
        for scoring in ("ref_tfidf", "bm25", "time"):
            hits, found = eng.search(q, k=25, scoring=scoring)
            ohits, ofound = oracle_search(tiny_oracle, q, k=25, scoring=scoring, removed=removed)
            assert found == ofound, (q, scoring)
            assert [(h.part, h.doc_id) for h in hits] == [(h.part, h.doc_id) for h in ohits], (q, scoring)
    # match path excludes tombstones
    m = eng.match("t1")
    got = {(r["part"], int(doc)) for r in m for doc in r["doc_id"]}
    assert not any((p, doc) in got for p, s in removed.items() for doc in s)


def test_repair_partitions(ray_session, tiny_transcripts_dir, tmp_path_factory, index_dir):
    """REPAIR analogue: dropping + rebuilding chosen partitions restores them
    byte-identically while other partitions are untouched (resume)."""
    from miru_ray.build import repair_partitions

    d = str(tmp_path_factory.mktemp("idx_repair"))
    build_index(tiny_transcripts_dir, d, n_parts=N_PARTS)
    before = {
        p: pq.read_table(os.path.join(d, f"part={p:05d}", "postings.parquet"))
        for p in range(N_PARTS)
    }
    meta = repair_partitions(d, tiny_transcripts_dir, [1, 3])
    assert sorted(meta["parts_built"]) == [1, 3]
    assert meta["parts_resumed"] == [0, 2]
    for p in range(N_PARTS):
        after = pq.read_table(os.path.join(d, f"part={p:05d}", "postings.parquet"))
        assert before[p].equals(after), p


def _oracle_rows(opart):
    """Rebuild input row dicts from an oracle partition (for re-partitioning)."""
    return [
        {
            "conv_id": opart.conv_id[i],
            "turn_idx": opart.turn_idx[i],
            "role": opart.fields["role"][i],
            "text": " ".join(opart.tokens[i]),
            "tool": opart.fields["tool"][i],
            "ts": opart.ts[i],
        }
        for i in range(opart.n_docs)
    ]


def test_lazy_tf_partial_decode(ray_session, tiny_transcripts_dir, tmp_path_factory, tiny_oracle):
    """Lazy-tf postings: with LAZY_TF_BLOCKS lowered so core terms qualify,
    results stay rank-identical while fewer tf bytes are decoded than
    stored (the block-partial decode path)."""
    import miru_ray.search as S

    from miru_ray.oracle import build_oracle_partitions

    d = str(tmp_path_factory.mktemp("idx_lazy"))
    # ONE partition so per-partition domains exceed the tiny-domain cutoff
    # and the block-max sweep actually prunes
    build_index(tiny_transcripts_dir, d, n_parts=1)
    oracle1 = build_oracle_partitions(
        [r for p in sorted(tiny_oracle) for r in _oracle_rows(tiny_oracle[p])], n_parts=1
    )
    old = S.LAZY_TF_BLOCKS
    S.LAZY_TF_BLOCKS = 2  # dictionary terms have >2 blocks in the tiny corpus
    try:
        eng = SearchEngine(d)
        savings = []
        for q in ("t1 t7", "t1 OR t2 OR t3", "t1 t2 t3 t4 t5"):
            for scoring in ("ref_tfidf", "bm25"):
                # fresh caches per query so decoded/total compare like-for-like
                S._POSTING_CACHE.clear()
                S.DECODE_STATS.update(tf_bytes_total=0, tf_bytes_decoded=0)
                hits, found = eng.search(q, k=10, scoring=scoring, parallel=False)
                ohits, ofound = oracle_search(oracle1, q, k=10, scoring=scoring)
                assert found == ofound, (q, scoring)
                assert [(h.doc_id,) for h in hits] == [
                    (h.doc_id,) for h in ohits
                ], (q, scoring)
                assert S.DECODE_STATS["tf_bytes_total"] > 0, (q, scoring)
                savings.append(
                    S.DECODE_STATS["tf_bytes_decoded"] / S.DECODE_STATS["tf_bytes_total"]
                )
        # scored queries decode at most what they store (on this uniform
        # fixture every block holds candidates, so block skipping only pays
        # off on skewed/clustered corpora — the match assertion below is
        # the deterministic saving)
        assert all(s <= 1.0 + 1e-9 for s in savings), savings
        # filter-only evaluation never touches tf bytes at all with lazy
        # postings: the doc-side decode is sufficient for set algebra
        S._POSTING_CACHE.clear()
        S.DECODE_STATS.update(tf_bytes_total=0, tf_bytes_decoded=0)
        res = eng.match("t1", parallel=False)
        assert sum(len(r["doc_id"]) for r in res) > 0
        assert S.DECODE_STATS["tf_bytes_total"] > 0
        assert S.DECODE_STATS["tf_bytes_decoded"] == 0, S.DECODE_STATS
    finally:
        S.LAZY_TF_BLOCKS = old
        S._POSTING_CACHE.clear()


def test_authz_mask_rank_identity(engine, tiny_oracle):
    """Authz mask (MiruAuthzIndex/MiruAuthzCache analogue): only docs
    carrying an allowed label are visible; rank identity vs the oracle
    with the same expression; repeated queries hit the cached mask."""
    for allowed in (["user"], ["user", "tool"], ["assistant", "tool"]):
        authz = ("role", allowed)
        for q in ("t1 t7", "NOT t2", "w004*"):
            hits, found = engine.search(q, k=15, authz=authz)
            ohits, ofound = oracle_search(
                tiny_oracle, q, k=15, authz=("role", tuple(allowed))
            )
            assert found == ofound, (q, allowed)
            _assert_rank_identical(hits, ohits)
    # match path also masks
    m = engine.match("t1", authz=("role", ["user"]))
    import miru_ray.search as S

    fwd_roles = {}
    for r in m:
        p = r["part"]
        from miru_ray.segments import forward_columns

        roles = forward_columns(engine.index_dir, p)["role"]
        for doc in r["doc_id"]:
            assert roles[int(doc)].as_py() == "user"
    # the cache holds composed masks (serial path → driver-process cache)
    engine.search("t1", k=5, authz=("role", ["user"]), parallel=False)
    assert any(k[3] == "role" for k in S._AUTHZ_CACHE)


def test_repair_preserves_tombstones_and_streams(ray_session, tiny_transcripts_dir, tiny_rows, tmp_path_factory):
    """REPAIR keeps removal + inbox/unread state across the rebuild (the
    reference's removal/unread indexes persist; keys are stable
    (conv_id, turn_idx), not docIds)."""
    from miru_ray.build import repair_partitions
    from miru_ray.segments import add_to_inbox, mark_read, read_stream_set, read_tombstones, remove_docs

    d = str(tmp_path_factory.mktemp("idx_repair_state"))
    build_index(tiny_transcripts_dir, d, n_parts=N_PARTS)
    victims = [(r["conv_id"], r["turn_idx"]) for r in tiny_rows[::9]]
    remove_docs(d, victims)
    inbox_keys = [(r["conv_id"], r["turn_idx"]) for r in tiny_rows[::4]]
    add_to_inbox(d, "s1", inbox_keys)
    mark_read(d, "s1", inbox_keys[::2])

    before_tomb = {p: read_tombstones(d, p).tolist() for p in range(N_PARTS)}
    before_inbox = {p: read_stream_set(d, p, "inbox", "s1").tolist() for p in range(N_PARTS)}
    before_unread = {p: read_stream_set(d, p, "unread", "s1").tolist() for p in range(N_PARTS)}

    repair_partitions(d, tiny_transcripts_dir, [0, 2])

    for p in range(N_PARTS):
        assert read_tombstones(d, p).tolist() == before_tomb[p], p
        assert read_stream_set(d, p, "inbox", "s1").tolist() == before_inbox[p], p
        assert read_stream_set(d, p, "unread", "s1").tolist() == before_unread[p], p


def test_raw32_codec_index_equals_varbyte(ray_session, tiny_transcripts_dir, tmp_path_factory, index_dir):
    """The codec SPI end-to-end (the MiruBitmaps two-backend analogue): an
    index built with codec='raw32' must answer every query family
    identically to the default varbyte index — decode metadata (blk_*),
    docIds, tfs and scores are codec-invariant; only the byte payloads
    differ (bigger: 4 bytes/value)."""
    from miru_ray.search import SearchEngine

    d = str(tmp_path_factory.mktemp("idx_raw32"))
    meta = build_index(tiny_transcripts_dir, d, n_parts=N_PARTS, codec="raw32")
    assert meta["codec"] == "raw32"

    a = SearchEngine(index_dir)
    b = SearchEngine(d)
    for q in ("t1 t7", "t1 OR w00042", "t1 AND NOT t9", "w004*",
              "role:tool t3", "turn_idx:[3 TO 7]"):
        for scoring in ("ref_tfidf", "bm25", "time"):
            ha, fa = a.search(q, k=20, scoring=scoring)
            hb, fb = b.search(q, k=20, scoring=scoring)
            assert fa == fb, (q, scoring)
            assert [(h.part, h.doc_id, h.score) for h in ha] == [
                (h.part, h.doc_id, h.score) for h in hb
            ], (q, scoring)
    # raw32 payloads are larger — prove the bytes really differ per codec
    pb_a = sum(pq.read_table(os.path.join(index_dir, f"part={p:05d}", "postings.parquet"))["doc_bytes"].nbytes for p in range(N_PARTS))
    pb_b = sum(pq.read_table(os.path.join(d, f"part={p:05d}", "postings.parquet"))["doc_bytes"].nbytes for p in range(N_PARTS))
    assert pb_b > pb_a
    a.close()
    b.close()


def test_wildcard_expansion_cache(engine, index_dir, monkeypatch):
    """Wildcard/range expansions are cached per (partition, epoch): a
    repeated prefix query re-reads NO term dictionary, and bumping a
    partition's manifest epoch (what extend/repair do) invalidates only
    that partition's entry. Results identical throughout."""
    import miru_ray.search as S
    from miru_ray.segments import manifest_path

    S._EXPANSION_CACHE.clear()
    calls = []
    real = S.read_term_range

    def counting(index_dir_, part, field, prefix):
        calls.append(part)
        return real(index_dir_, part, field, prefix)

    monkeypatch.setattr(S, "read_term_range", counting)
    hits1, found1 = engine.search("w004*", k=15, parallel=False)
    assert found1 > 0
    first_calls = len(calls)
    assert first_calls > 0  # one dictionary scan per partition
    hits2, found2 = engine.search("w004*", k=15, parallel=False)
    assert len(calls) == first_calls  # all partitions served from cache
    assert found2 == found1
    assert [(h.doc_id, h.part) for h in hits2] == [(h.doc_id, h.part) for h in hits1]
    # epoch bump on ONE partition (extend/repair rewrite the manifest):
    # only that partition re-scans its dictionary
    mp = manifest_path(index_dir, 0)
    os.utime(mp, (os.path.getmtime(mp) + 2, os.path.getmtime(mp) + 2))
    hits3, found3 = engine.search("w004*", k=15, parallel=False)
    assert len(calls) == first_calls + 1 and calls[-1] == 0
    assert found3 == found1
    assert [(h.doc_id, h.part) for h in hits3] == [(h.doc_id, h.part) for h in hits1]


def test_search_after_pagination(engine):
    """Deep pagination (Lucene searchAfter analogue): pages of size k
    chained by the previous page's last Hit reassemble the big-k answer
    exactly — including on all-tie score-0 pure-NOT queries (where the
    order falls entirely to the ts/part/doc tie-break) and TIME scoring."""
    for q, scoring in [
        ("t1 t7", "ref_tfidf"),
        ("t1 OR t2 OR t3", "bm25"),
        ("NOT t2", "ref_tfidf"),
        ("w004*", "bm25"),
        ("t1", "time"),
    ]:
        big, found = engine.search(q, k=60, scoring=scoring, early_exit=False)
        pages, after = [], None
        for _ in range(6):
            page, pfound = engine.search(
                q, k=10, scoring=scoring, after=after, early_exit=False
            )
            assert pfound == found, (q, scoring)  # totalHits unaffected
            if not page:
                break
            pages.extend(page)
            after = page[-1]
        assert [(h.doc_id, h.part) for h in pages] == [
            (h.doc_id, h.part) for h in big
        ][: len(pages)], (q, scoring)
        assert len(pages) == min(60, found), (q, scoring)


def test_stats_and_explain(engine, index_dir, tiny_rows):
    st = engine.stats()
    assert st["n_parts"] == N_PARTS
    assert st["totals"]["n_docs"] == len(tiny_rows)
    assert sum(m["n_docs"] for m in st["per_part"].values()) == len(tiny_rows)
    assert st["codec"] == "varbyte" and st["positions"] is False

    ex = engine.explain("t1 t7")
    assert ex["strategy"] == "block-max-wand-and"
    assert ex["terms"]["text:t1"]["df"] > 0 and ex["terms"]["text:t7"]["ttf"] > 0
    assert engine.explain("t1 OR t2")["strategy"] == "block-max-wand-or"
    exw = engine.explain("w004* t1")
    assert exw["strategy"] == "full-eval"
    assert len(exw["expansions"]["text:w004*"]) > 1
    assert engine.explain("t1", scoring="time")["strategy"] == "full-eval"


def test_export_match_resumable(engine, tmp_path_factory):
    """export_match: full answer as one parquet per partition; atomic,
    idempotent, and resumable (present files are skipped; a deleted file
    is the only one rewritten)."""
    import time as _time

    out = str(tmp_path_factory.mktemp("export"))
    res = engine.export_match("t1 AND NOT t9", out)
    assert res["files"] == N_PARTS and res["skipped"] == []
    match_rows = sum(len(r["doc_id"]) for r in engine.match("t1 AND NOT t9"))
    assert res["rows"] == match_rows > 0
    files = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    assert files == [f"part-{p:05d}.parquet" for p in range(N_PARTS)]
    # a DIFFERENT question must not silently reuse this dir's files
    with pytest.raises(ValueError):
        engine.export_match("t1 AND NOT t7", out)
    with pytest.raises(ValueError):
        engine.export_match("t1 AND NOT t9", out, time_range=(0, 1))
    t = pa.concat_tables([pq.read_table(os.path.join(out, f)) for f in files])
    assert t.num_rows == match_rows
    assert t.column_names == ["part", "doc_id", "conv_id", "turn_idx", "role", "tool", "ts"]
    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in files}
    res2 = engine.export_match("t1 AND NOT t9", out)
    assert res2["skipped"] == list(range(N_PARTS)) and res2["rows"] == match_rows
    assert all(os.path.getmtime(os.path.join(out, f)) == mtimes[f] for f in files)
    victim = files[1]
    os.remove(os.path.join(out, victim))
    _time.sleep(0.02)
    res3 = engine.export_match("t1 AND NOT t9", out)
    assert res3["rows"] == match_rows
    assert res3["skipped"] == [p for p in range(N_PARTS) if p != 1]
    assert os.path.getmtime(os.path.join(out, victim)) > mtimes[victim]
    assert all(
        os.path.getmtime(os.path.join(out, f)) == mtimes[f]
        for f in files if f != victim
    )


def test_sparse_bases_equals_dense_reference():
    """sparse_bases (CSR over nonzero (file, part) pairs) must equal the
    dense n_files × n_parts cumsum it replaced, on random sparse counts."""
    import numpy as np

    from miru_ray.build import sparse_bases

    rng = np.random.default_rng(11)
    n_files, n_parts = 37, 4096
    dense = np.zeros((n_files, n_parts), dtype=np.int64)
    metas = []
    for f in range(n_files):
        k = int(rng.integers(0, 9))
        parts = np.sort(rng.choice(n_parts, size=k, replace=False)).astype(np.int64)
        counts = rng.integers(1, 50, size=k).astype(np.int64)
        dense[f, parts] = counts
        metas.append({"parts": parts, "counts": counts})
    ref_bases = np.zeros_like(dense)
    np.cumsum(dense[:-1], axis=0, out=ref_bases[1:])
    csr, by_part = sparse_bases(metas)
    # the CSR never stores zeros
    assert len(csr["cols"]) == int((dense > 0).sum())
    for f in range(n_files):
        lo, hi = int(csr["indptr"][f]), int(csr["indptr"][f + 1])
        for p, v in zip(csr["cols"][lo:hi], csr["vals"][lo:hi]):
            assert ref_bases[f, p] == v, (f, p)
    want = {int(p): int(c) for p, c in enumerate(dense.sum(axis=0)) if c > 0}
    assert by_part == want
    # extend path: pre-existing per-partition offsets shift every base
    off = rng.integers(0, 1000, size=n_parts).astype(np.int64)
    csr2, _ = sparse_bases(metas, base_off=off)
    for f in range(n_files):
        lo, hi = int(csr2["indptr"][f]), int(csr2["indptr"][f + 1])
        for p, v in zip(csr2["cols"][lo:hi], csr2["vals"][lo:hi]):
            assert ref_bases[f, p] + off[p] == v


def test_hash_build_n_parts_4096(ray_session, tiny_transcripts_dir, tmp_path_factory, index_dir):
    """A hash build at n_parts=4096 over multiple files must work without a
    dense bases matrix (the CSR carries only touched partitions) and give
    rank-identical answers to the small-n_parts index."""
    d = str(tmp_path_factory.mktemp("idx4096"))
    meta = build_index(tiny_transcripts_dir, d, n_parts=4096)
    built = meta["parts_built"]
    assert 0 < len(built) <= 4096
    eng_big = SearchEngine(d)
    eng_ref = SearchEngine(index_dir)
    for q in ("t1 t7", "t1 OR t2 OR t3", "NOT t2"):
        # match sets must be identical; top-k ranks are identical up to
        # equal-score ties (docIds — the tie-break — depend on the layout)
        keys_a = set()
        for r in eng_big.match(q):
            keys_a.update(zip(r["conv_id"], r["turn_idx"]))
        keys_b = set()
        for r in eng_ref.match(q):
            keys_b.update(zip(r["conv_id"], r["turn_idx"]))
        assert keys_a == keys_b
        _, found_a = eng_big.search(q, k=10, scoring="bm25")
        _, found_b = eng_ref.search(q, k=10, scoring="bm25")
        assert found_a == found_b
    # docId accounting: every partition's doc count sums to the corpus size
    n_total = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(tiny_transcripts_dir + "/*.parquet")
    )
    assert sum(
        read_manifest(d, p)["metrics"]["n_docs"] for p in built
    ) == n_total


def test_sip_watch_catches_up(ray_session, tiny_transcripts_dir, tmp_path_factory, index_dir):
    """The sip daemon loop (VERDICT r3 #7; MiruLocalHostedPartition's
    heartbeat sip): files appended to the corpus dir are picked up and
    applied by the watch loop WITHOUT a manual extend call; the resulting
    index content equals the one-shot build; an idle loop applies nothing."""
    t = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(tiny_transcripts_dir + "/*.parquet"))]
    )
    convs = sorted(set(t["conv_id"].to_pylist()))
    c1, c2 = convs[len(convs) // 3], convs[2 * len(convs) // 3]
    part1 = t.filter(pa.compute.less(t["conv_id"], c1))
    part2 = t.filter(
        pa.compute.and_(
            pa.compute.greater_equal(t["conv_id"], c1),
            pa.compute.less(t["conv_id"], c2),
        )
    )
    part3 = t.filter(pa.compute.greater_equal(t["conv_id"], c2))

    corpus = str(tmp_path_factory.mktemp("sip_corpus"))
    pq.write_table(part1, os.path.join(corpus, "a-epoch1.parquet"))
    d = str(tmp_path_factory.mktemp("idx_sip"))
    from miru_ray.build import applied_input_files, sip_watch

    build_index(corpus, d, n_parts=N_PARTS)

    seen = []

    def on_cycle(i, new):
        seen.append(list(new))
        # simulate the stream: drop new files into the watched dir between
        # heartbeats (names chosen so the batch sorts after what's applied)
        if i == 1:
            pq.write_table(part2, os.path.join(corpus, "b-epoch2.parquet"))
        elif i == 2:
            pq.write_table(part3, os.path.join(corpus, "c-epoch3.parquet"))

    res = sip_watch(
        corpus, d, interval=0.05, idle_cycles_to_stop=2, on_cycle=on_cycle
    )
    assert res["epochs"] == 2
    assert [os.path.basename(f) for f in res["files_applied"]] == [
        "b-epoch2.parquet", "c-epoch3.parquet"
    ]
    assert {os.path.basename(f) for f in applied_input_files(d)} == {
        "a-epoch1.parquet", "b-epoch2.parquet", "c-epoch3.parquet"
    }
    # caught-up index answers == the one-shot build's answers
    eng_sip = SearchEngine(d)
    eng_ref = SearchEngine(index_dir)
    for q in ("t1 t7", "NOT t2"):
        got = set()
        for r in eng_sip.match(q):
            got.update(zip(r["conv_id"], r["turn_idx"]))
        want = set()
        for r in eng_ref.match(q):
            want.update(zip(r["conv_id"], r["turn_idx"]))
        assert got == want, q
    # a second watch over the same dir is pure idle: no new epochs
    res2 = sip_watch(corpus, d, interval=0.01, idle_cycles_to_stop=1)
    assert res2["epochs"] == 0 and res2["files_applied"] == []


def test_sip_watch_retry_on_error(ray_session, tiny_transcripts_dir, tmp_path_factory):
    """Daemon posture: a half-uploaded (corrupt) file records an error and
    is retried next heartbeat instead of killing the loop; once the file
    becomes valid the batch applies."""
    t = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(tiny_transcripts_dir + "/*.parquet"))]
    )
    convs = sorted(set(t["conv_id"].to_pylist()))
    cut = convs[len(convs) // 2]
    part1 = t.filter(pa.compute.less(t["conv_id"], cut))
    part2 = t.filter(pa.compute.greater_equal(t["conv_id"], cut))
    corpus = str(tmp_path_factory.mktemp("sipr_corpus"))
    pq.write_table(part1, os.path.join(corpus, "a-epoch1.parquet"))
    d = str(tmp_path_factory.mktemp("idx_sipr"))
    from miru_ray.build import sip_watch

    build_index(corpus, d, n_parts=N_PARTS)
    bad = os.path.join(corpus, "b-epoch2.parquet")
    with open(bad, "wb") as f:
        f.write(b"half-uploaded junk")

    def on_cycle(i, new):
        if i == 1:  # "upload finishes" between heartbeats
            pq.write_table(part2, bad)

    res = sip_watch(corpus, d, interval=0.05, max_cycles=3,
                    on_cycle=on_cycle, retry_on_error=True)
    assert len(res["errors"]) == 1 and "cycle 1" in res["errors"][0]
    assert res["epochs"] == 1
    assert [os.path.basename(f) for f in res["files_applied"]] == ["b-epoch2.parquet"]
    # without the daemon posture the same corruption raises
    bad2 = os.path.join(corpus, "c-epoch3.parquet")
    with open(bad2, "wb") as f:
        f.write(b"junk")
    with pytest.raises(Exception):
        sip_watch(corpus, d, interval=0.01, max_cycles=1)


def test_sip_watch_path_spelling_invariance(ray_session, tiny_transcripts_dir, tmp_path_factory):
    """Review regression: the catch-up diff abspath-normalizes both sides,
    so a differently-spelled corpus path (trailing /., relative) must NOT
    re-extend already-applied files."""
    corpus = str(tmp_path_factory.mktemp("sipn_corpus"))
    for f in sorted(glob.glob(tiny_transcripts_dir + "/*.parquet"))[:1]:
        shutil.copy(f, os.path.join(corpus, os.path.basename(f)))
    d = str(tmp_path_factory.mktemp("idx_sipn"))
    from miru_ray.build import sip_watch

    build_index(corpus + "/.", d, n_parts=2)  # build with a dotted spelling
    res = sip_watch(corpus, d, interval=0.01, max_cycles=1)
    assert res["epochs"] == 0 and res["files_applied"] == []
    rel = os.path.relpath(corpus)
    res2 = sip_watch(rel, d, interval=0.01, max_cycles=1)
    assert res2["epochs"] == 0


def test_posting_cache_lru_handles_oversized_miss_set(
    ray_session, tiny_transcripts_dir, tmp_path_factory, index_dir, monkeypatch
):
    """Review regression: a single PostingSource whose miss set exceeds the
    cache cap must not crash the eviction loop."""
    from miru_ray import search as S
    from miru_ray.search import PostingSource
    from miru_ray.segments import read_manifest

    monkeypatch.setattr(S, "_POSTING_CACHE_CAP", 2)
    S._POSTING_CACHE.clear()
    src = PostingSource(index_dir, 0, [("text", w) for w in ("t1", "t2", "t3", "t7", "w00042")], 0)
    assert len(src.docs("text", "t1")) > 0
    assert len(S._POSTING_CACHE) <= 2 + 5  # bounded, no StopIteration


def test_sip_watch_backoff_on_persistent_failure(
    ray_session, tiny_transcripts_dir, tmp_path_factory
):
    """ADVICE r4: a permanently bad batch must not be re-attempted every
    heartbeat — retries back off exponentially (gaps of 1, 2, 4, 8, …
    heartbeats for a never-changing pending set: attempts at cycles 1,
    2, 4, 8 of 12 here) and the error ring is bounded, so a daemon over
    one corrupt file neither hammers extend_index nor grows memory
    without bound."""
    corpus = str(tmp_path_factory.mktemp("sipb_corpus"))
    t = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(tiny_transcripts_dir + "/*.parquet"))]
    )
    pq.write_table(t, os.path.join(corpus, "a-epoch1.parquet"))
    d = str(tmp_path_factory.mktemp("idx_sipb"))
    build_index(corpus, d, n_parts=N_PARTS)
    with open(os.path.join(corpus, "b-bad.parquet"), "wb") as f:
        f.write(b"permanently corrupt")

    from miru_ray.build import sip_watch

    res = sip_watch(corpus, d, interval=0.0, max_cycles=12, retry_on_error=True)
    # without backoff this would be 12 errors; the 1, 2, 4, 8 gaps allow
    # attempts at cycles 1, 2, 4, 8 only
    assert len(res["errors"]) == 4, res["errors"]
    assert res["epochs"] == 0


def test_tokenizer_drift_raises(ray_session, tiny_transcripts_dir, tmp_path_factory):
    """Review r5: an index whose RECORDED token pattern no longer matches
    what its analyzer produces today must refuse to open (and to extend)
    — querying across the drift silently returns wrong answers."""
    import json

    from miru_ray.build import extend_index
    from miru_ray.segments import read_global_manifest, write_global_manifest

    d = str(tmp_path_factory.mktemp("idx_tokdrift"))
    build_index(tiny_transcripts_dir, d, n_parts=2)
    meta = read_global_manifest(d)
    tok = dict(meta["tokenizer"], pattern="[a-z]+")  # a pattern no analyzer produces
    write_global_manifest(d, dict(meta, tokenizer=tok))
    with pytest.raises(ValueError, match="token pattern"):
        SearchEngine(d)
    with pytest.raises(ValueError, match="token pattern"):
        extend_index([], d)
    # restoring the true pattern reopens cleanly
    write_global_manifest(d, meta)
    assert SearchEngine(d).count("t1") > 0

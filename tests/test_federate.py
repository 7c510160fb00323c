"""Federated (multi-index) search parity: independently built indexes over
disjoint corpus halves, answered as one logical index, must equal the
ordered walk over every (index, partition) pair — the reference's
reader-tier askAndMerge across hosts (MiruService.java:101-194)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from miru_ray.build import build_index
from miru_ray.federate import FederatedEngine, _engine_bounds
from miru_ray.oracle import (
    build_oracle_partitions,
    eval_filter,
    merge_partitions,
    score_partition,
)
from miru_ray.filters import parse_query

N_PARTS = 2


def _write_half(table: pa.Table, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    table = table.take(
        pc.sort_indices(
            table, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
    )
    pq.write_table(table, os.path.join(out_dir, "shard-00000.parquet"))
    return out_dir


@pytest.fixture(scope="module")
def fed(ray_session, tiny_transcripts_dir, tiny_rows, tmp_path_factory):
    """Two indexes over an interleaved conv split (both span the full ts
    range — the merge must truly interleave), plus the matching per-half
    oracle partitions."""
    import glob

    t = pa.concat_tables(
        pq.read_table(f) for f in sorted(glob.glob(tiny_transcripts_dir + "/*.parquet"))
    )
    convs = sorted(set(t["conv_id"].to_pylist()))
    half_a = set(convs[0::2])
    mask = pa.array([c in half_a for c in t["conv_id"].to_pylist()])
    base = tmp_path_factory.mktemp("fed")
    dirs = []
    for tag, m in (("a", mask), ("b", pc.invert(mask))):
        src = _write_half(t.filter(m), str(base / f"src_{tag}"))
        idx = str(base / f"idx_{tag}")
        build_index(src, idx, n_parts=N_PARTS)
        dirs.append(idx)
    rows_a = [r for r in tiny_rows if r["conv_id"] in half_a]
    rows_b = [r for r in tiny_rows if r["conv_id"] not in half_a]
    oracles = [
        build_oracle_partitions(rows_a, N_PARTS),
        build_oracle_partitions(rows_b, N_PARTS),
    ]
    eng = FederatedEngine(dirs)
    yield eng, oracles
    eng.close()


def _expected(oracles, query, k, scoring):
    """The walk the federation performs: engines in order, partitions
    newest→oldest inside each, one ordered merge chain."""
    per = []
    for o in oracles:
        for p in sorted(o, reverse=True):
            per.append(score_partition(o[p], query, k, scoring, None, None))
    return merge_partitions(per, k)


@pytest.mark.parametrize("scoring", ["ref_tfidf", "bm25", "time"])
@pytest.mark.parametrize("k", [5, 50])
def test_federated_rank_identity(fed, scoring, k):
    eng, oracles = fed
    for query in ("t1 t7", "t1 OR w00042", "t1 AND NOT t9", "w004*"):
        hits, found = eng.search(query, k=k, scoring=scoring, early_exit=False)
        exp_hits, exp_found = _expected(oracles, query, k, scoring)
        assert found == exp_found, query
        assert [(h.conv_id, h.turn_idx) for h in hits] == [
            (h.conv_id, h.turn_idx) for h in exp_hits
        ], query
        if scoring != "time":
            assert np.allclose(
                [h.score for h in hits], [h.score for h in exp_hits], rtol=1e-5
            )
        assert eng.last_engines_asked == 2


def test_federated_match_union(fed):
    eng, oracles = fed
    got = {
        (r["engine"], r["part"], int(d))
        for r in eng.match("t1 AND NOT t9")
        for d in r["doc_id"]
    }
    exp = set()
    filt = parse_query("t1 AND NOT t9")
    for ei, o in enumerate(oracles):
        for p, opart in o.items():
            exp.update((ei, p, d) for d in eval_filter(opart, filt, None))
    assert got == exp and len(got) > 0


def test_federated_distincts_uniques(fed, tiny_rows):
    eng, oracles = fed
    got = eng.distincts("tool", query="t1")
    exp = set()
    filt = parse_query("t1")
    for o in oracles:
        for opart in o.values():
            for d in eval_filter(opart, filt, None):
                if opart.fields["tool"][d]:
                    exp.add(opart.fields["tool"][d])
    assert got == sorted(exp)
    all_ts = sorted(r["ts"] for r in tiny_rows)
    tr = (all_ts[0], all_ts[len(all_ts) // 2])
    assert eng.uniques("tool", tr, query="t1") == len(
        {
            opart.fields["tool"][d]
            for o in oracles
            for opart in o.values()
            for d in eval_filter(opart, filt, None)
            if tr[0] <= opart.ts[d] <= tr[1] and opart.fields["tool"][d]
        }
    )
    with pytest.raises(ValueError):
        eng.uniques("tool", None)


@pytest.fixture(scope="module")
def fed_time(ray_session, tiny_transcripts_dir, tmp_path_factory):
    """Two indexes over a TIME split (newer half / older half) — the
    natural 100-TB per-time-segment sharding; TIME queries must stop at
    the newest shard."""
    import glob

    t = pa.concat_tables(
        pq.read_table(f) for f in sorted(glob.glob(tiny_transcripts_dir + "/*.parquet"))
    )
    ts = t["ts"].to_pylist()
    mid = sorted(ts)[len(ts) // 2]
    newer = pa.array([x >= mid for x in ts])
    base = tmp_path_factory.mktemp("fed_time")
    dirs = []
    for tag, m in (("new", newer), ("old", pc.invert(newer))):
        src = _write_half(t.filter(m), str(base / f"src_{tag}"))
        idx = str(base / f"idx_{tag}")
        build_index(src, idx, n_parts=N_PARTS)
        dirs.append(idx)
    eng = FederatedEngine(dirs)
    yield eng
    eng.close()


def test_federated_time_early_exit(fed_time):
    eng = fed_time
    full, found_full = eng.search("t1", k=5, scoring="time", early_exit=False)
    assert eng.last_engines_asked == 2
    fast, _ = eng.search("t1", k=5, scoring="time", early_exit=True)
    assert [(h.conv_id, h.turn_idx) for h in fast] == [
        (h.conv_id, h.turn_idx) for h in full
    ]
    # the newest shard alone answered (its 5 newest hits are provably
    # newer than the old shard's zone ts_max)
    assert eng.last_engines_asked == 1


def test_federated_zone_pruning(fed_time):
    eng = fed_time
    b_new = _engine_bounds(eng.engines[0])
    b_old = _engine_bounds(eng.engines[1])
    assert b_new is not None and b_old is not None and b_old[1] < b_new[0]
    # a range entirely inside the newer shard never asks the older one
    hits, _ = eng.search(
        "t1", k=5, scoring="bm25", time_range=(b_new[0], b_new[1])
    )
    assert eng.last_engines_asked == 1 and len(hits) > 0


def test_federated_collapse(fed):
    """Cross-index collapse: one best hit per key over the federation —
    equals the first-per-key prefix of the federated uncollapsed order."""
    eng, _ = fed
    full, found_full = eng.search("t1", k=100_000, scoring="bm25")
    seen, want = set(), []
    for h in full:
        if h.role in seen:
            continue
        seen.add(h.role)
        want.append(h)
        if len(want) == 3:
            break
    got, found = eng.search("t1", k=3, scoring="bm25", collapse="role")
    assert [(h.part, h.doc_id, h.score) for h in got] == [
        (h.part, h.doc_id, h.score) for h in want
    ]
    assert found == found_full
    assert len({h.role for h in got}) == len(got)


def test_federation_refuses_mixed_analyzers(ray_session, tiny_transcripts_dir, tmp_path_factory):
    """Members must share the analysis contract — a default-analyzer index
    federated with a stemmed one is refused (terms are not comparable)."""
    import pytest as _pytest

    from miru_ray.build import build_index as _build

    d1 = str(tmp_path_factory.mktemp("fed_mix1"))
    d2 = str(tmp_path_factory.mktemp("fed_mix2"))
    _build(tiny_transcripts_dir, d1, n_parts=2)
    _build(tiny_transcripts_dir, d2, n_parts=2, analyzer="en")
    with _pytest.raises(ValueError, match="analysis contract"):
        FederatedEngine([d1, d2])
    # explicit override still constructs
    eng = FederatedEngine([d1, d2], allow_mixed_analyzers=True)
    assert len(eng.engines) == 2

"""Collaborative-filtering reco parity: the Ray Data events pipeline vs a
brute-force python oracle, and the index-backed bitmap variant vs brute
force over the oracle partitions (CollaborativeFiltering.java:58-213)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from miru_ray.build import build_index
from miru_ray.search import SearchEngine

N_PARTS = 4


def brute_reco(events, user, k):
    """events: list of (user_id, event_type, item). Pure-python 3-hop CF."""
    ok = [(u, i) for u, t, i in events if t != "error"]
    mine = {i for u, i in ok if u == user}
    if not mine:
        return []
    cnt = {}
    for u, i in ok:
        if u != user and i in mine:
            cnt[u] = cnt.get(u, 0) + 1
    contrib = sorted(cnt.items(), key=lambda r: (-r[1], r[0]))[:k]
    cmap = dict(contrib)
    pairs = {(i, u) for u, i in ok if u in cmap and i not in mine}
    score = {}
    for i, u in pairs:
        score[i] = score.get(i, 0) + cmap[u]
    return sorted(score.items(), key=lambda r: (-r[1], r[0]))[:k]


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """Deterministic synthetic events table (schema of testdata events)."""
    rng = np.random.default_rng(42)
    n = 3000
    user = rng.integers(0, 25, n)
    item = rng.integers(0, 60, n)
    types = np.array(["view", "purchase", "error"], dtype=object)
    etype = types[rng.integers(0, 3, n)]
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(
                (1_700_000_000_000_000 + np.arange(n) * 1_000_000), pa.timestamp("us")
            ),
            "user_id": pa.array(user.astype(np.int64)),
            "event_type": pa.array(etype.tolist(), pa.string()),
            "value": pa.array(rng.random(n)),
            "props": pa.array([f'{{"k": {i}}}' for i in item.tolist()], pa.string()),
        }
    )
    d = str(tmp_path_factory.mktemp("reco_events"))
    pq.write_table(t, os.path.join(d, "events.parquet"))
    rows = list(zip(user.tolist(), etype.tolist(), item.tolist()))
    return d, rows


def test_reco_cf_ds_vs_brute(ray_session, events_dir):
    from miru_ray.reco import reco_cf_ds

    d, rows = events_dir
    for user in (0, 7, 24):
        got = reco_cf_ds(d, user_id=user, k=10)
        exp = brute_reco(rows, user, 10)
        got_rows = list(zip(got["item"].to_pylist(), got["score"].to_pylist()))
        assert got_rows == exp, user


def test_reco_cf_ds_unknown_user_empty(ray_session, events_dir):
    from miru_ray.reco import reco_cf_ds

    d, _rows = events_dir
    assert reco_cf_ds(d, user_id=10_000, k=5).num_rows == 0


def brute_reco_index(oracle_parts, user_conv, k, item_prefix):
    """Reference chain over the pure-python oracle partitions, merged by
    summing per-partition counts (RecoAnswerMerger)."""
    merged = {}
    for p in oracle_parts.values():
        mine = {i for i, c in enumerate(p.conv_id) if c == user_conv}
        if not mine:
            continue
        vocab = {
            t: set(d)
            for t, d in p.post["text"].items()
            if t.startswith(item_prefix)
        }
        my_terms = {t for t, d in vocab.items() if d & mine}
        if not my_terms:
            continue
        other = set()
        for t in my_terms:
            other |= vocab[t]
        other -= mine
        cnt = {}
        for i in other:
            cnt[p.conv_id[i]] = cnt.get(p.conv_id[i], 0) + 1
        contrib = dict(sorted(cnt.items(), key=lambda r: (-r[1], r[0]))[:k])
        for t, d in vocab.items():
            if t in my_terms:
                continue
            s = sum(c for name, c in contrib.items() if any(p.conv_id[i] == name for i in d))
            if s:
                merged[t] = merged.get(t, 0) + s
    return sorted(merged.items(), key=lambda r: (-r[1], r[0]))[:k]


def test_reco_cf_index_vs_brute(ray_session, tiny_transcripts_dir, tiny_oracle, tmp_path_factory):
    from miru_ray.reco import reco_cf_index

    d = str(tmp_path_factory.mktemp("idx_reco"))
    build_index(tiny_transcripts_dir, d, n_parts=N_PARTS)
    eng = SearchEngine(d)
    for conv in ("conv-00000007", "conv-00000042", "conv-00000100"):
        got = reco_cf_index(eng, conv, k=8, item_prefix="w00")
        exp = brute_reco_index(tiny_oracle, conv, 8, "w00")
        assert got == exp, conv


def test_reco_ppr_vs_scalar(ray_session):
    """reco_ppr_ds equals a pure-python seeded integer PageRank on the
    user↔item bipartite graph (floor-division damping, teleport at the
    seed only, own items excluded)."""
    import numpy as np
    import pyarrow.parquet as pq

    from miru_ray.reco import PPR_UNIT, reco_ppr_ds

    SF = "/root/testdata/sf0.001"
    USER, K, ITERS = 7, 5, 3  # all different from the driver query
    ev = pq.read_table(SF + "/events.parquet").to_pydict()
    pairs = set()
    for uid, et, props in zip(ev["user_id"], ev["event_type"], ev["props"]):
        if et == "error":
            continue
        digits = "".join(ch for ch in props if ch.isdigit())
        if digits:
            pairs.add((int(uid), int(digits)))
    edges = set()
    for u, i in pairs:
        edges.add((2 * u, 2 * i + 1))
        edges.add((2 * i + 1, 2 * u))
    nodes = sorted({a for a, _ in edges})
    deg = {n: 0 for n in nodes}
    for a, _ in edges:
        deg[a] += 1
    seed = 2 * USER
    base = (15 * PPR_UNIT) // 100
    r = {n: (PPR_UNIT if n == seed else 0) for n in nodes}
    for _ in range(ITERS):
        inflow = {n: 0 for n in nodes}
        for a, b in edges:
            inflow[b] += r[a] // deg[a]
        r = {n: (base if n == seed else 0) + (85 * inflow[n]) // 100 for n in nodes}
    mine = {i for u, i in pairs if u == USER}
    cand = sorted(
        (((n - 1) // 2, v) for n, v in r.items() if n % 2 == 1 and (n - 1) // 2 not in mine),
        key=lambda x: (-x[1], x[0]),
    )[:K]
    got = reco_ppr_ds(SF, user_id=USER, k=K, iters=ITERS).to_pandas()
    assert [(t.item, t.rank) for t in got.itertuples()] == cand
    assert len(cand) == K and cand[0][1] > 0  # the walk must actually reach items


def test_reco_ppr_paths_equal(ray_session):
    """Small-graph local fast path == distributed rounds (identical
    integers, the graphrank contract)."""
    from miru_ray.reco import reco_ppr_ds

    SF = "/root/testdata/sf0.001"
    a = reco_ppr_ds(SF, user_id=7, k=6, iters=2)
    b = reco_ppr_ds(SF, user_id=7, k=6, iters=2, small_graph_edges=0)
    assert a.to_pydict() == b.to_pydict()

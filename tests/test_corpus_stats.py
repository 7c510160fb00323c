"""TTR, vocabulary growth and top contributors vs scalar recomputes."""

import os
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from miru_ray.tokenize import py_tokenize

SF = "/root/testdata/sf0.001"


def test_source_ttr_vs_scalar(ray_session):
    from miru_ray.textstats import source_ttr_ds

    t = pq.read_table(os.path.join(SF, "documents.parquet"), columns=["source", "text"])
    toks = defaultdict(int)
    types = defaultdict(set)
    for s, x in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        tk = py_tokenize(x)
        toks[s] += len(tk)
        types[s].update(tk)
    got = source_ttr_ds(SF).to_pandas()
    assert got["source"].tolist() == sorted(toks)
    for _, r in got.iterrows():
        assert r["n_tokens"] == toks[r["source"]]
        assert r["n_types"] == len(types[r["source"]])
        assert r["ttr"] == round(len(types[r["source"]]) / toks[r["source"]], 6)


def test_vocab_growth_vs_scalar(ray_session):
    from miru_ray.textstats import vocab_growth_ds

    t = pq.read_table(os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"])
    first = {}
    for d, x in sorted(zip(t["doc_id"].to_pylist(), t["text"].to_pylist())):
        for tk in py_tokenize(x):
            first.setdefault(tk, d)
    new = Counter(first.values())
    got = vocab_growth_ds(SF).to_pandas()
    assert got["doc_id"].tolist() == sorted(new)
    run = 0
    for _, r in got.iterrows():
        assert r["new_types"] == new[r["doc_id"]]
        run += new[r["doc_id"]]
        assert r["vocab_size"] == run
    # Heaps sanity: growth must be sublinear on the real corpus tail
    assert got["vocab_size"].iloc[-1] < 2 * got["vocab_size"].iloc[len(got) // 4]
    # multi-bucket distributed prefix sum (bucket_docs smaller than the
    # corpus): same curve, driver holds only per-bucket totals
    multi = (
        vocab_growth_ds(SF, bucket_docs=64)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert multi["doc_id"].tolist() == got["doc_id"].tolist()
    assert multi["new_types"].tolist() == got["new_types"].tolist()
    assert multi["vocab_size"].tolist() == got["vocab_size"].tolist()


def test_top_contributors_vs_scalar(ray_session):
    from miru_ray.analytics import top_contributors_ds

    t = pq.read_table(os.path.join(SF, "events.parquet"), columns=["event_type", "user_id"])
    counts = Counter(zip(t["event_type"].to_pylist(), t["user_id"].to_pylist()))
    per_type = defaultdict(list)
    for (ty, u), n in counts.items():
        per_type[ty].append((-n, u))
    got = top_contributors_ds(SF, n=3).to_pandas()
    for ty, rows in per_type.items():
        rows.sort()
        sel = got[got["event_type"] == ty].sort_values("rank")
        assert sel["user_id"].tolist() == [u for _, u in rows[:3]]
        assert sel["n_events"].tolist() == [-n for n, _ in rows[:3]]
        assert sel["rank"].tolist() == [1, 2, 3]

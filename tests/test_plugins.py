"""Plugin-operator parity tests (distincts / counts / waveform / latest)
against brute-force recomputation from the oracle's posting dicts."""

import numpy as np
import pytest

from miru_ray.build import build_index
from miru_ray.oracle import eval_filter
from miru_ray.filters import parse_query
from miru_ray.search import SearchEngine
from miru_ray import plugins

N_PARTS = 4


@pytest.fixture(scope="module")
def engine(ray_session, tiny_transcripts_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_plugins"))
    build_index(tiny_transcripts_dir, d, n_parts=N_PARTS)
    return SearchEngine(d)


def oracle_answer(opart, query):
    return eval_filter(opart, parse_query(query), None)


def test_distincts_meta_field(engine, tiny_oracle):
    got = plugins.distincts(engine, "role")
    exp = sorted({v for p in tiny_oracle.values() for v in p.fields["role"] if v})
    assert got == exp

    got_q = plugins.distincts(engine, "tool", query="t1 t7")
    exp_q = set()
    for p in tiny_oracle.values():
        ans = oracle_answer(p, "t1 t7")
        exp_q.update(p.fields["tool"][i] for i in ans if p.fields["tool"][i])
    assert got_q == sorted(exp_q)


def test_distincts_text_prefix_with_query(engine, tiny_oracle):
    got = plugins.distincts(engine, "text", prefix="w004", query="t1")
    exp = set()
    for p in tiny_oracle.values():
        ans = oracle_answer(p, "t1")
        for term, posting in p.post["text"].items():
            if term.startswith("w004") and not ans.isdisjoint(posting):
                exp.add(term)
    assert got == sorted(exp)
    assert plugins.distinct_count(engine, "text", prefix="w004", query="t1") == len(exp)


def test_aggregate_counts(engine, tiny_oracle):
    got = plugins.aggregate_counts(engine, "role", query="t3")
    # totals per role must match oracle
    exp_tot: dict[str, int] = {}
    for p in tiny_oracle.values():
        ans = oracle_answer(p, "t3")
        for i in ans:
            v = p.fields["role"][i]
            if v:
                exp_tot[v] = exp_tot.get(v, 0) + 1
    assert {t: c for t, c, _p, _l in got} == exp_tot
    # newest-first: ordered by (partition desc, docId desc) of newest hit
    keys = [(p, l) for _t, _c, p, l in got]
    assert keys == sorted(keys, reverse=True)


def test_waveform(engine, tiny_oracle):
    bucket = 3_600_000_000  # 1 hour in us
    got = plugins.waveform(engine, bucket, query="t1 t7")
    exp: dict[int, int] = {}
    for p in tiny_oracle.values():
        ans = oracle_answer(p, "t1 t7")
        for i in ans:
            b = (p.ts[i] // bucket) * bucket
            exp[b] = exp.get(b, 0) + 1
    assert got == exp
    assert sum(got.values()) == sum(
        len(oracle_answer(p, "t1 t7")) for p in tiny_oracle.values()
    )


def test_latest_first(engine, tiny_oracle):
    got = plugins.latest_first(engine, "text", prefix="t1")
    for part, rows in got.items():
        opart = tiny_oracle[part]
        for term, first, last, df in rows:
            docs = sorted(opart.post["text"][term])
            assert first == docs[0] and last == docs[-1] and df == len(docs), (part, term)


def test_trending_deterministic(engine):
    a = plugins.trending(engine, ["t1", "t2", "w00042"], 3_600_000_000)
    b = plugins.trending(engine, ["t1", "t2", "w00042"], 3_600_000_000)
    assert a == b
    assert len(a) == 3 and all(isinstance(s, float) for _q, s in a)

"""Adversarial inputs through the FULL build+query path: null/empty/unicode
text, huge documents, a term present in every doc (maximal posting), and a
single-conversation corpus (partition skew)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from miru_ray.build import build_index
from miru_ray.fixtures import TRANSCRIPTS_SCHEMA
from miru_ray.oracle import build_oracle_partitions, oracle_search
from miru_ray.search import SearchEngine
from miru_ray.tokenize import py_tokenize

N_PARTS = 2
BASE = 1_700_000_000_000_000


def _rows():
    texts = [
        "",                                   # empty
        None,                                 # null
        "hot unicode Füße 縮小 ÉCOLE k123",    # non-ASCII separators
        "hot " * 50_000,                      # one huge doc (~200 KB)
        "hot plain words here",
        "HOT CASE folding TeSt",
        "hot-hyphen and under_score and 123numbers",
        "\x00hot\x1fweird\tcontrol\nbytes",
    ]
    rows = []
    for conv in range(6):
        for turn in range(4):
            t = texts[(conv * 4 + turn) % len(texts)]
            rows.append(
                {
                    "conv_id": f"edge-{conv:04d}",
                    "turn_idx": turn,
                    "role": ["user", "assistant", "tool"][turn % 3],
                    "text": t,
                    "tool": "tool-x" if turn % 3 == 2 else "",
                    "ts": BASE + (conv * 4 + turn) * 1_000_000,
                }
            )
    return rows


@pytest.fixture(scope="module")
def edge_corpus(tmp_path_factory):
    rows = _rows()
    d = str(tmp_path_factory.mktemp("edge_src"))
    t = pa.table(
        {
            "conv_id": pa.array([r["conv_id"] for r in rows]),
            "turn_idx": pa.array([r["turn_idx"] for r in rows], type=pa.int32()),
            "role": pa.array([r["role"] for r in rows]),
            "text": pa.array([r["text"] for r in rows]),
            "tool": pa.array([r["tool"] for r in rows]),
            "ts": pa.array([r["ts"] for r in rows], type=pa.timestamp("us")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )
    pq.write_table(t, os.path.join(d, "edge.parquet"))
    for r in rows:
        r["text"] = r["text"] or ""
    return d, rows


@pytest.fixture(scope="module")
def edge_engine(ray_session, edge_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_idx"))
    src, _rows_ = edge_corpus
    meta = build_index(src, d, n_parts=N_PARTS)
    assert meta.get("strategy") == "stream"
    return SearchEngine(d)


@pytest.fixture(scope="module")
def edge_oracle(edge_corpus):
    _src, rows = edge_corpus
    return build_oracle_partitions(rows, n_parts=N_PARTS)


@pytest.mark.parametrize(
    "query",
    ["hot", "hot AND unicode", "füße OR cole", "k123", "hot AND NOT case",
     "under OR score", "NOT hot", "tool:tool-x hot"],
)
def test_edge_rank_identity(edge_engine, edge_oracle, query):
    for scoring in ("ref_tfidf", "bm25"):
        hits, found = edge_engine.search(query, k=20, scoring=scoring)
        ohits, ofound = oracle_search(edge_oracle, query, k=20, scoring=scoring)
        assert found == ofound, (query, scoring)
        assert [(h.part, h.doc_id) for h in hits] == [(h.part, h.doc_id) for h in ohits]
        np.testing.assert_allclose(
            [h.score for h in hits], [h.score for h in ohits], rtol=2e-5, atol=1e-7
        )


def test_edge_huge_doc_dl(edge_engine, edge_oracle):
    """The 50k-token doc survives the chunked pipeline with correct length."""
    from miru_ray.segments import forward_columns

    big = max(
        (dl, p, i)
        for p, op in edge_oracle.items()
        for i, dl in enumerate(op.dl)
    )
    assert big[0] == 50_000
    fwd = forward_columns(edge_engine.index_dir, big[1])
    assert int(fwd["dl"][big[2]]) == 50_000


def test_single_conversation_skew(ray_session, tmp_path_factory):
    """Everything hashes to one partition: build + query still correct."""
    rows = [
        {
            "conv_id": "only-conv",
            "turn_idx": i,
            "role": "user",
            "text": f"solo t{i % 5} filler",
            "tool": "",
            "ts": BASE + i * 1_000_000,
        }
        for i in range(500)
    ]
    src = str(tmp_path_factory.mktemp("solo_src"))
    t = pa.table(
        {
            "conv_id": pa.array([r["conv_id"] for r in rows]),
            "turn_idx": pa.array([r["turn_idx"] for r in rows], type=pa.int32()),
            "role": pa.array([r["role"] for r in rows]),
            "text": pa.array([r["text"] for r in rows]),
            "tool": pa.array([r["tool"] for r in rows]),
            "ts": pa.array([r["ts"] for r in rows], type=pa.timestamp("us")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )
    pq.write_table(t, os.path.join(src, "solo.parquet"))
    d = str(tmp_path_factory.mktemp("solo_idx"))
    meta = build_index(src, d, n_parts=8)
    assert len(meta["parts_built"]) == 1  # all rows in one partition
    eng = SearchEngine(d)
    oracle = build_oracle_partitions(rows, n_parts=8)
    hits, found = eng.search("solo t1", k=10)
    ohits, ofound = oracle_search(oracle, "solo t1", k=10)
    assert found == ofound == 100
    assert [(h.part, h.doc_id) for h in hits] == [(h.part, h.doc_id) for h in ohits]


def test_tokenizer_edge_scalars():
    assert py_tokenize("") == []
    assert py_tokenize("ÉCOLE") == ["cole"]  # É is a separator (ASCII rule)
    assert py_tokenize("Füße") == ["f", "e"]
    assert py_tokenize("a" * 10) == ["a" * 10]
    assert py_tokenize("\x00x\x1fy\tz") == ["x", "y", "z"]


def test_knn_classify_k_exceeds_corpus(ray_session):
    """k larger than the table: every non-self row is a neighbor, the vote
    covers the whole corpus (votes sum to n-1 per query)."""
    from miru_ray.ann import knn_classify

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id"])
    n = t.num_rows
    got = knn_classify("/root/testdata/sf0.001", n_queries=2, k=n + 50).to_pandas()
    assert len(got) == 2
    # with every row voting, the winner is the corpus-wide modal label
    lab = pq.read_table(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "label"]
    )
    labels = lab["label"].to_pylist()
    ids = lab["vec_id"].to_pylist()
    for q in (0, 1):
        counts: dict[int, int] = {}
        for v, L in zip(ids, labels):
            if v != q:
                counts[L] = counts.get(L, 0) + 1
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        row = got[got["q"] == q].iloc[0]
        assert int(row["pred_label"]) == best[0]
        assert int(row["votes"]) == best[1]


def test_keywords_k_exceeds_doc_terms(ray_session):
    """k larger than any doc's distinct-term count returns every term of
    the doc, still ranked (score desc, term asc)."""
    from miru_ray.textstats import keywords_ds
    from miru_ray.tokenize import py_tokenize

    got = keywords_ds("/root/testdata/sf0.001", k=10**6).to_pandas()
    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    n_terms = {
        int(d): len(set(py_tokenize(t)))
        for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    }
    per_doc = got.groupby("doc_id").size().to_dict()
    assert set(per_doc) == {d for d, n in n_terms.items() if n > 0}
    for d, cnt in per_doc.items():
        assert cnt == n_terms[int(d)], d
    # ranked within each doc
    for d, g in got.groupby("doc_id"):
        s = g["score"].to_numpy()
        assert (np.diff(s) <= 1e-12).all(), d

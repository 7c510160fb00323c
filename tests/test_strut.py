"""Strut scorer parity vs a scalar brute force (Strut.java:37-56 strategy
semantics: distinct features per doc, unit/regression/max combination)."""

import numpy as np
import pyarrow as pa
import pytest

from miru_ray.strut import StrutScorer, regression_scalar
from miru_ray.tokenize import py_tokenize

MODEL = {"alpha": 0.5, "beta": 0.25, "gamma": 0.125, "delta": 0.0625}


def brute(text, strategy):
    present = sorted({t for t in py_tokenize(text) if t in MODEL},
                     key=list(MODEL).index)
    if not present:
        return 0.0
    w = [MODEL[t] for t in present]
    if strategy == "unit_weighted":
        return sum(w) / len(w)
    if strategy == "regression_weighted":
        return sum(MODEL[t] * regression_scalar(list(MODEL).index(t)) for t in present)
    return max(w)


@pytest.mark.parametrize("strategy", ["unit_weighted", "regression_weighted", "max"])
def test_strut_scorer_vs_scalar(strategy):
    texts = [
        "alpha beta gamma",
        "Alpha ALPHA alpha",  # repeated feature scores once
        "nothing matches here",
        "",
        "delta and gamma plus noise beta",
        "beta",
    ]
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    out = StrutScorer(MODEL, strategy=strategy)(batch)
    got = out["score"].to_pylist()
    exp = [round(brute(t, strategy), 6) for t in texts]
    assert got == pytest.approx(exp, abs=1e-9), strategy


def test_strut_empty_model():
    batch = pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["alpha"], pa.string())})
    out = StrutScorer({}, strategy="max")(batch)
    assert out["score"].to_pylist() == [0.0]


def test_train_model_vs_brute(ray_session):
    """Catwalk numerator/denominator training: weights equal brute-force
    per-feature positive-doc ratios over the sf0.001 documents."""
    import pyarrow.parquet as pq

    from miru_ray.strut import train_model
    from miru_ray.tokenize import py_tokenize

    sf = "/root/testdata/sf0.001"
    feats = ["scan", "merge", "zzznotaterm"]
    got = train_model(sf, feats, positive_term="the")

    docs = pq.read_table(sf + "/documents.parquet", columns=["text"])["text"].to_pylist()
    n_pos = {f: 0 for f in feats}
    n_all = {f: 0 for f in feats}
    for text in docs:
        toks = set(py_tokenize(text))
        for f in feats:
            if f in toks:
                n_all[f] += 1
                if "the" in toks:
                    n_pos[f] += 1
    for f in feats:
        exp = n_pos[f] / n_all[f] if n_all[f] else 0.0
        assert got[f] == pytest.approx(exp, abs=1e-12), f
    assert got["zzznotaterm"] == 0.0

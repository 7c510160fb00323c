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

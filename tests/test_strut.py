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


FIELD_FEATURES = [["source"], ["lang"], ["source", "lang"]]


def _brute_field_model(rows, positive_term):
    from miru_ray.tokenize import py_tokenize

    pos = {r["doc_id"] for r in rows if positive_term in py_tokenize(r["text"] or "")}
    model = {}
    for fid, fields in enumerate(FIELD_FEATURES):
        combos = {}
        for r in rows:
            vals = [r.get(f) for f in fields]
            if any(v is None or v == "" for v in vals):
                continue
            key = "\x1f".join(str(v) for v in vals)
            n_pos, n_all = combos.get(key, (0, 0))
            combos[key] = (n_pos + (r["doc_id"] in pos), n_all + 1)
        for key, (n_pos, n_all) in combos.items():
            model[(fid, key)] = n_pos / n_all
    return model


def _brute_field_score(rows, model, strategy):
    from miru_ray.strut import regression_scalar

    out = {}
    for r in rows:
        weights, present = [], []
        for fid, fields in enumerate(FIELD_FEATURES):
            vals = [r.get(f) for f in fields]
            if any(v is None or v == "" for v in vals):
                present.append(False)
                weights.append(0.0)
                continue
            present.append(True)
            weights.append(model.get((fid, "\x1f".join(map(str, vals))), 0.0))
        cnt = sum(present)
        if cnt == 0:
            out[r["doc_id"]] = 0.0
        elif strategy == "unit_weighted":
            out[r["doc_id"]] = sum(w for w, p in zip(weights, present) if p) / cnt
        elif strategy == "regression_weighted":
            out[r["doc_id"]] = sum(
                w * regression_scalar(i) for i, (w, p) in enumerate(zip(weights, present)) if p
            )
        else:
            out[r["doc_id"]] = max(w for w, p in zip(weights, present) if p)
    return out


@pytest.mark.parametrize("strategy", ["unit_weighted", "regression_weighted", "max"])
def test_strut_field_features_vs_brute(ray_session, strategy):
    """Multi-field catwalk features (MiruAggregateUtil gatherFeatures):
    training ratios and strategy scores equal a row-by-row brute force over
    the sf0.001 documents, including null/empty field guards."""
    import pyarrow.parquet as pq

    from miru_ray.strut import strut_field_score_ds, train_field_model

    sf = "/root/testdata/sf0.001"
    rows = pq.read_table(
        sf + "/documents.parquet", columns=["doc_id", "source", "lang", "text"]
    ).to_pylist()
    positive = "the"

    model = train_field_model(sf, FIELD_FEATURES, positive)
    brute_model = _brute_field_model(rows, positive)
    assert set(model) == set(brute_model)
    for k in model:
        assert model[k] == pytest.approx(brute_model[k], abs=1e-12), k

    got = {
        r["doc_id"]: r["score"]
        for r in strut_field_score_ds(sf, FIELD_FEATURES, positive, strategy=strategy)
        .take_all()
    }
    exp = _brute_field_score(rows, brute_model, strategy)
    assert set(got) == set(exp)
    for d in got:
        assert got[d] == pytest.approx(round(exp[d], 6), abs=1e-9), d


def test_strut_incremental_cache(ray_session, tmp_path_factory):
    """lastScoredId semantics: first call scores everything and pins the
    model; after new docs append, the second call scores ONLY the delta yet
    returns scores identical to a full rescore UNDER THE PINNED MODEL; a
    changed feature set drops the cache (model-version invalidation)."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from miru_ray.strut import StrutScorer, strut_score_incremental

    corpus = tmp_path_factory.mktemp("inc_corpus")
    docs_dir = corpus / "documents.parquet"
    docs_dir.mkdir()

    def write_part(name, ids, texts):
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.string())}),
            str(docs_dir / name),
        )

    write_part("p0.parquet", [0, 1, 2, 3],
               ["scan merge the data", "join window scan", "plain words only", "merge merge data"])
    cache = str(tmp_path_factory.mktemp("inc_cache"))
    terms = ["scan", "merge", "join"]

    full1 = strut_score_incremental(str(corpus), terms, cache)
    assert full1.num_rows == 4
    meta1 = json.load(open(os.path.join(cache, "meta.json")))
    assert meta1["last_run_scored"] == 4 and meta1["last_doc_id"] == 3
    pinned_model = {t: float(w) for t, w in meta1["model"].items()}

    # append new docs (higher doc_ids), rescore incrementally
    write_part("p1.parquet", [4, 5], ["scan join everything", "no features here"])
    full2 = strut_score_incremental(str(corpus), terms, cache)
    meta2 = json.load(open(os.path.join(cache, "meta.json")))
    assert meta2["last_run_scored"] == 2 and meta2["last_doc_id"] == 5
    assert full2.num_rows == 6
    # old rows byte-identical to the first run (never rescored)
    assert full2.slice(0, 4).equals(full1)
    # delta rows equal a direct scoring under the PINNED model
    scorer = StrutScorer(model=pinned_model)
    direct = scorer(pa.table({"doc_id": pa.array([4, 5], pa.int64()),
                              "text": pa.array(["scan join everything", "no features here"])}))
    assert full2.slice(4, 2)["score"].to_pylist() == direct["score"].to_pylist()

    # a different feature set invalidates the cache → full rescore
    full3 = strut_score_incremental(str(corpus), ["scan"], cache)
    meta3 = json.load(open(os.path.join(cache, "meta.json")))
    assert meta3["last_run_scored"] == 6 and full3.num_rows == 6

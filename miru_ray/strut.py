"""Strut-style model scoring — the stateful actor-pool pattern, for real.

The reference's Strut plugin scores documents against trained "catwalk"
models held in a per-node cache: a model maps feature values to
(numerator, denominator) counts, a score per feature is the ratio, and
features combine by strategy — UNIT_WEIGHTED (mean), REGRESSION_WEIGHTED
(fixed scalars), MAX (reference: miru-stream-plugins/.../strut/
Strut.java:37-56, StrutModelCache.java:104-140,
miru-catwalk-shared/.../Strategy.java:6-9, StrutModel.java:29,
StrutModelScore.java:9-13). The model travels to workers ONCE and scoring
is a per-batch vectorized lookup — exactly the "model in __init__, work in
__call__" actor-pool contract for stateful Ray Data stages.

Here the model is a term-weight table: weight(t) = Σtf(t) / total_tokens
over the corpus (a catwalk-style global ratio, SQL-checkable), restricted
to the query's feature terms; each feature optionally carries a numerator
scalar (the reference's numeratorScalars). A document's feature set is
its DISTINCT model terms (features are value combinations, scored once).

``StrutScorer`` is the map_batches class; ``strut_score_ds`` wires the
full Ray Data pipeline: stats → broadcast model → actor pool scoring.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .tokenize import tokenize_flat

STRATEGIES = ("unit_weighted", "regression_weighted", "max")
# the reference's REGRESSION_WEIGHTED comment: S = 0.5*A + 0.4*B + 0.4*C
# + 0.3*D ... — decaying per-feature scalars; we fix the published four
# then 1/(i+1) beyond
REGRESSION_SCALARS = (0.5, 0.4, 0.4, 0.3)


def regression_scalar(i: int) -> float:
    return REGRESSION_SCALARS[i] if i < len(REGRESSION_SCALARS) else 1.0 / (i + 1)


class StrutScorer:
    """Actor-pool map_batches stage: model loaded once per actor in
    __init__ (the StrutModelCache pattern), per-batch vectorized scoring
    in __call__.

    ``model`` maps term → weight; terms are matched against the tokenized
    ``text`` column; per doc the distinct matched model terms score by
    strategy. Docs matching nothing score 0.0 (the nil score)."""

    def __init__(self, model: dict[str, float], strategy: str = "unit_weighted",
                 text_col: str = "text", id_col: str = "doc_id"):
        if strategy not in STRATEGIES:
            raise ValueError(strategy)
        # per-actor setup: fixed term order (model insertion order defines
        # feature index for regression scalars), weights as an array
        self.terms = list(model)
        self.term_index = {t: i for i, t in enumerate(self.terms)}
        self.weights = np.asarray([model[t] for t in self.terms], dtype=np.float64)
        self.scalars = np.asarray(
            [regression_scalar(i) for i in range(len(self.terms))], dtype=np.float64
        )
        self.strategy = strategy
        self.text_col = text_col
        self.id_col = id_col
        # Arrow lookup table for vectorized token→feature-index mapping
        self._lookup = pa.array(self.terms, type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        parents, tokens = tokenize_flat(batch[self.text_col])
        # token → model feature index (or -1)
        idx = pc.index_in(tokens, value_set=self._lookup)
        has = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        fidx = idx.to_numpy(zero_copy_only=False)
        scores = np.zeros(n, dtype=np.float64)
        if has.any():
            rows = parents[has]
            feats = fidx[has].astype(np.int64)
            # distinct (doc, feature) pairs — features score once per doc
            pair = rows * len(self.terms) + feats
            pair = np.unique(pair)
            prow = pair // len(self.terms)
            pfeat = pair % len(self.terms)
            w = self.weights[pfeat]
            if self.strategy == "unit_weighted":
                sums = np.bincount(prow, weights=w, minlength=n)
                cnts = np.bincount(prow, minlength=n)
                nz = cnts > 0
                scores[nz] = sums[nz] / cnts[nz]
            elif self.strategy == "regression_weighted":
                scores = np.bincount(prow, weights=w * self.scalars[pfeat], minlength=n).astype(np.float64)
            else:  # max
                order = np.argsort(prow, kind="stable")
                pr, ww = prow[order], w[order]
                starts = np.flatnonzero(np.concatenate([[True], pr[1:] != pr[:-1]]))
                mx = np.maximum.reduceat(ww, starts)
                scores[pr[starts]] = mx
        return pa.table(
            {
                self.id_col: pc.cast(batch[self.id_col], pa.int64()),
                "score": pa.array(np.round(scores, 6)),
            }
        )


class _FeatureTfCounter:
    """map_batches stage: per batch, partial Σtf for each feature term plus
    the batch's total token count (fidx == -1 row). The feature filter runs
    INSIDE the pipeline so the driver only ever sees len(features)+1 rows —
    never the corpus vocabulary."""

    def __init__(self, feature_terms: list[str]):
        self.lookup = pa.array(feature_terms, type=pa.string())
        self.n_feat = len(feature_terms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        _, tokens = tokenize_flat(batch["text"])
        idx = pc.index_in(tokens, value_set=self.lookup)
        has = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        feats = idx.to_numpy(zero_copy_only=False)[has].astype(np.int64)
        tf = np.bincount(feats, minlength=self.n_feat).astype(np.int64)
        return pa.table(
            {
                "fidx": pa.array(np.arange(-1, self.n_feat), pa.int64()),
                "tf": pa.array(np.concatenate([[len(tokens)], tf])),
            }
        )


def build_model(sf_dir: str, feature_terms: list[str],
                concurrency: int = 2) -> dict[str, float]:
    """Catwalk-training stand-in: weight(t) = Σtf(t)/total_tokens. A Ray
    Data pipeline of per-batch FILTERED partials (only the feature terms
    plus one total-token row leave each batch) → one tiny groupby-sum; the
    driver never scans the vocabulary. Deterministic and expressible in
    SQL for the oracle."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    ).map_batches(
        _FeatureTfCounter,
        fn_constructor_kwargs={"feature_terms": list(feature_terms)},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
    rows = ds.groupby("fidx").aggregate(Sum("tf")).take_all()
    agg = {int(r["fidx"]): int(r["sum(tf)"]) for r in rows}
    total = agg.get(-1, 0)
    return {t: (agg.get(i, 0) / total if total else 0.0)
            for i, t in enumerate(feature_terms)}


class _LabelCounter:
    """map_batches stage: per batch, (term, n_positive, n_total) partial
    document-frequency counts for the feature terms (label = does the doc
    match the positive predicate)."""

    def __init__(self, feature_terms: list[str], positive_term: str):
        self.lookup = pa.array(feature_terms, type=pa.string())
        self.n_feat = len(feature_terms)
        self.positive_term = positive_term

    def __call__(self, batch: pa.Table) -> pa.Table:
        parents, tokens = tokenize_flat(batch["text"])
        n = batch.num_rows
        # positive label: the doc contains the positive term
        pos = np.zeros(n, dtype=bool)
        is_pos_tok = pc.equal(tokens, self.positive_term).to_numpy(zero_copy_only=False)
        if is_pos_tok.any():
            pos[np.unique(parents[is_pos_tok])] = True
        idx = pc.index_in(tokens, value_set=self.lookup)
        has = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        feats = idx.to_numpy(zero_copy_only=False)[has].astype(np.int64)
        rows = parents[has]
        # distinct (doc, feature) pairs → per-feature df among positives/all
        pair = np.unique(rows * self.n_feat + feats)
        prow = pair // self.n_feat
        pfeat = pair % self.n_feat
        n_all = np.bincount(pfeat, minlength=self.n_feat)
        n_pos = np.bincount(pfeat[pos[prow]], minlength=self.n_feat)
        return pa.table(
            {
                "fidx": pa.array(np.arange(self.n_feat), pa.int64()),
                "n_pos": pa.array(n_pos.astype(np.int64)),
                "n_all": pa.array(n_all.astype(np.int64)),
            }
        )


def train_model(sf_dir: str, feature_terms: list[str], positive_term: str,
                concurrency: int = 2) -> dict[str, float]:
    """The catwalk numerator/denominator training semantics
    (StrutModelScore.java:9-13: score = numerator / denominator): for each
    feature term, numerator = # docs containing BOTH the feature and the
    positive term, denominator = # docs containing the feature. A Ray Data
    pipeline of per-batch partial counts → one tiny groupby-sum; weights
    are exact ratios (0 for unseen features), SQL-checkable."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    ).map_batches(
        _LabelCounter,
        fn_constructor_kwargs={"feature_terms": list(feature_terms),
                               "positive_term": positive_term},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
    rows = ds.groupby("fidx").aggregate(Sum("n_pos"), Sum("n_all")).take_all()
    agg = {int(r["fidx"]): (int(r["sum(n_pos)"]), int(r["sum(n_all)"])) for r in rows}
    return {
        t: (agg.get(i, (0, 0))[0] / agg[i][1] if agg.get(i, (0, 0))[1] else 0.0)
        for i, t in enumerate(feature_terms)
    }


def strut_score_ds(sf_dir: str, feature_terms: list[str],
                   strategy: str = "unit_weighted", concurrency: int = 4):
    """The full Strut pipeline: train (stats) → broadcast the model to an
    actor pool → score every document. Returns a Ray Dataset
    (doc_id, score)."""
    import ray.data as rd

    model = build_model(sf_dir, feature_terms)
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(
        StrutScorer,
        fn_constructor_kwargs={"model": model, "strategy": strategy},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=1,
    )

"""Percolation: standing queries matched against a document stream.

The reverse of search — N registered queries, documents arrive, and every
document is routed to the queries it satisfies (Elasticsearch's percolator;
the reference's ``realtimeDelivery`` flag marks exactly this intent on an
activity, MiruActivity.java:34-60 — deliver matching activities to standing
listeners as they are indexed). A 100-TB ingest pipeline uses this shape
for alerting, routing and labeling without building an index first.

Ray-native design: the queries are parsed ONCE per actor
(``PercolateStage.__init__`` — the canonical stateful-stage pattern), each
batch is tokenized once, and every query is evaluated as boolean vector
algebra over a (docs × terms) presence matrix:

- one ``pc.is_in`` of the batch's token stream against the union of all
  queries' text terms, scattered to per-(doc, term) presence bits — cost is
  O(tokens + matches), independent of the number of queries;
- meta fields (role → source, tool → lang) compare columns directly;
- each query's filter tree folds presence columns with &, \\|, &~ in the
  exact operand order of the engine's evaluator (search.eval_filter_np:
  field filters first, then sub-filters; ``pButNotQ`` = first operand
  minus the rest; ``inclusive`` injects the universe).

Restriction: standing queries must be literal boolean term queries —
wildcard/range/fuzzy/regexp/phrase atoms raise at registration (their
expansions are index-dictionary-dependent, and a percolator has no index).

The matching semantics are definitionally identical to the search engine's
filter path because both sides evaluate the SAME parsed AST; the driver
oracle mirrors that AST as generated boolean SQL per query.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .filters import Filter, parse_query
from .tokenize import tokenize_flat

_LITERAL_RE = re.compile(r"^[a-z0-9]+$")

# documents-table columns backing the transcripts view's meta fields
# (transcripts.docs_to_transcripts: role = source, tool = lang)
FIELD_COLS = {"role": "source", "tool": "lang"}


def _validate(filt: Filter, qid: str) -> None:
    if filt.op == "phrase":
        raise ValueError(f"percolate query {qid!r}: phrase atoms need a positional index")
    for ff in filt.field_filters:
        for v in ff.values:
            if ff.field == "text" and not _LITERAL_RE.fullmatch(v):
                raise ValueError(
                    f"percolate query {qid!r}: {v!r} is not a literal term "
                    "(wildcard/range/fuzzy/regexp expansion needs an index dictionary)"
                )
            if ff.field not in ("text",) and ff.field not in FIELD_COLS:
                raise ValueError(f"percolate query {qid!r}: unknown field {ff.field!r}")
    for sub in filt.sub_filters:
        _validate(sub, qid)


def _collect_text_terms(filt: Filter, out: set) -> None:
    for ff in filt.field_filters:
        if ff.field == "text":
            out.update(ff.values)
    for sub in filt.sub_filters:
        _collect_text_terms(sub, out)


class PercolateStage:
    """Actor-pool stage: queries parsed and validated once per actor;
    each batch → (doc_id, query_id) match pairs."""

    def __init__(self, queries: dict[str, str], use_stopwords: bool = False,
                 analyzer: str = "default"):
        self.compiled: dict[str, Filter] = {}
        terms: set[str] = set()
        for qid in sorted(queries):
            filt = parse_query(queries[qid], use_stopwords=use_stopwords,
                               analyzer=analyzer)
            _validate(filt, qid)
            self.compiled[qid] = filt
            _collect_text_terms(filt, terms)
        self.terms = sorted(terms)
        self.term_idx = {t: i for i, t in enumerate(self.terms)}
        self.term_arr = pa.array(self.terms, type=pa.string())

    def _presence(self, batch: pa.Table) -> tuple[np.ndarray, dict]:
        n = batch.num_rows
        parents, tokens = tokenize_flat(batch["text"])
        pres = np.zeros((n, max(1, len(self.terms))), dtype=bool)
        if len(self.terms) and len(parents):
            sel = pc.is_in(tokens, value_set=self.term_arr).to_numpy(
                zero_copy_only=False
            )
            hit = np.flatnonzero(sel)
            if len(hit):
                tid = pc.index_in(
                    tokens.take(pa.array(hit)), value_set=self.term_arr
                ).to_numpy(zero_copy_only=False)
                pres[parents[hit], tid] = True
        meta: dict[tuple[str, str], np.ndarray] = {}
        for field, col in FIELD_COLS.items():
            if col in batch.schema.names:
                vals = batch[col]
                for qid, filt in self.compiled.items():
                    for fv in _meta_values(filt, field):
                        key = (field, fv)
                        if key not in meta:
                            meta[key] = pc.equal(vals, fv).to_numpy(
                                zero_copy_only=False
                            )
        return pres, meta

    def _eval(self, filt: Filter, pres: np.ndarray, meta: dict, n: int) -> np.ndarray:
        operands: list[np.ndarray] = []
        if filt.inclusive:
            operands.append(np.ones(n, dtype=bool))
        for ff in filt.field_filters:
            cols = []
            for v in ff.values:
                if ff.field == "text":
                    cols.append(pres[:, self.term_idx[v]])
                else:
                    cols.append(meta[(ff.field, v)])
            op = cols[0].copy()
            for c in cols[1:]:
                op |= c
            operands.append(op)
        for sub in filt.sub_filters:
            operands.append(self._eval(sub, pres, meta, n))
        if not operands:
            return np.zeros(n, dtype=bool)
        r = operands[0].copy()
        if filt.op == "and":
            for o in operands[1:]:
                r &= o
        elif filt.op == "or":
            for o in operands[1:]:
                r |= o
        elif filt.op == "pButNotQ":
            for o in operands[1:]:
                r &= ~o
        else:
            raise ValueError(filt.op)
        return r

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        pres, meta = self._presence(batch)
        out_ids: list[np.ndarray] = []
        out_qids: list[str] = []
        for qid, filt in self.compiled.items():
            m = self._eval(filt, pres, meta, n)
            hits = ids[m]
            out_ids.append(hits)
            out_qids.extend([qid] * len(hits))
        all_ids = np.concatenate(out_ids) if out_ids else np.empty(0, np.int64)
        return pa.table(
            {
                "doc_id": pa.array(all_ids),
                "query_id": pa.array(out_qids, type=pa.string()),
            }
        )


def _meta_values(filt: Filter, field: str) -> list[str]:
    out = []
    for ff in filt.field_filters:
        if ff.field == field:
            out.extend(ff.values)
    for sub in filt.sub_filters:
        out.extend(_meta_values(sub, field))
    return out


def percolate_ds(sf_dir: str, queries: dict[str, str],
                 use_stopwords: bool = False, analyzer: str = "default"):
    """(doc_id, query_id) for every (document, standing query) match —
    one streaming pass, queries compiled once per actor, nothing shuffles."""
    import os

    import ray.data as rd

    # validate EAGERLY on the driver: a bad standing query must raise as a
    # ValueError at registration, not as an ActorDiedError mid-pipeline
    for qid in sorted(queries):
        _validate(
            parse_query(queries[qid], use_stopwords=use_stopwords, analyzer=analyzer),
            qid,
        )
    import ray

    max_actors = max(2, int(ray.cluster_resources().get("CPU", 8)) - 1)
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source", "lang"],
    )
    return ds.map_batches(
        PercolateStage,
        fn_constructor_kwargs={
            "queries": queries, "use_stopwords": use_stopwords,
            "analyzer": analyzer,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, max_actors),
    )

"""Percolation (standing queries over the document stream) vs a scalar
reference that re-evaluates each parsed filter tree per document with
python sets, exactly the engine evaluator's operand semantics."""

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

QUERIES = {
    "q_and": "scan merge",
    "q_or": "scan OR join",
    "q_not": "scan AND NOT merge",
    "q_field": "role:src3 scan",
    "q_tool": "tool:en scan",
    "q_nested": "(scan OR join) AND NOT (table OR merge)",
}


def scalar_eval(filt, toks: set, row: dict) -> bool:
    ops = []
    if filt.inclusive:
        ops.append(True)
    for ff in filt.field_filters:
        if ff.field == "text":
            ops.append(any(v in toks for v in ff.values))
        else:
            col = {"role": "source", "tool": "lang"}[ff.field]
            ops.append(row[col] in ff.values)
    for sub in filt.sub_filters:
        ops.append(scalar_eval(sub, toks, row))
    if not ops:
        return False
    if filt.op == "and":
        return all(ops)
    if filt.op == "or":
        return any(ops)
    return ops[0] and not any(ops[1:])  # pButNotQ


def test_percolate_vs_scalar(ray_session):
    from miru_ray.filters import parse_query
    from miru_ray.percolate import percolate_ds
    from miru_ray.tokenize import py_tokenize

    got = percolate_ds(SF, QUERIES).to_pandas()
    pairs = {(int(r["doc_id"]), r["query_id"]) for _, r in got.iterrows()}

    t = pq.read_table(SF + "/documents.parquet").to_pydict()
    want = set()
    for i in range(len(t["doc_id"])):
        row = {k: t[k][i] for k in t}
        toks = set(py_tokenize(row["text"]))
        for qid, q in QUERIES.items():
            if scalar_eval(parse_query(q), toks, row):
                want.add((int(row["doc_id"]), qid))
    assert pairs == want
    assert {q for _, q in pairs} == set(QUERIES)  # every query fires


def test_percolate_rejects_expansion_atoms(ray_session):
    from miru_ray.percolate import percolate_ds

    for bad in ("w004*", "turn_idx:[3 TO 7]", '"scan merge"', "scan~1"):
        with pytest.raises(ValueError):
            percolate_ds(SF, {"bad": bad}).materialize()

"""Fuzzy term queries (`term~N`, Lucene FuzzyQuery syntax).

The engine expands a fuzzy value per partition by filtering the field's
term dictionary with a vectorized Levenshtein DP (search._fuzzy_filter);
the oracle uses its own scalar DP (oracle._lev). Rank identity across the
fuzzy query families is asserted by the main rank-identity tests in
test_build_search.py (QUERIES entries); this file covers the parser, the
DP parity, and the highlighter.
"""

import random

import pytest

from miru_ray.filters import QueryParseError, fuzzy_value, levenshtein, parse_query
from miru_ray.search import _fuzzy_filter


def _leaf_values(f):
    out = []
    if f.field_filters:
        for ff in f.field_filters:
            out.extend((ff.field, v) for v in ff.values)
    for s in f.sub_filters:
        out.extend(_leaf_values(s))
    return out


def test_parser_fuzzy_atoms():
    assert _leaf_values(parse_query("part~1")) == [("text", "part~1")]
    # bare `~` → Lucene FuzzyQuery.defaultMaxEdits = 2
    assert _leaf_values(parse_query("part~")) == [("text", "part~2")]
    # ~0 collapses to the exact term at parse time
    assert _leaf_values(parse_query("part~0")) == [("text", "part")]
    # field-scoped
    assert _leaf_values(parse_query("role:use~1")) == [("role", "use~1")]
    # uppercase body analyzes like any term
    assert _leaf_values(parse_query("PART~1")) == [("text", "part~1")]
    with pytest.raises(QueryParseError):
        parse_query("part~3")
    # non-digit suffix is NOT fuzzy syntax: `~` is an analyzer separator
    assert _leaf_values(parse_query("a~b")) == [("text", "a"), ("text", "b")]


def test_fuzzy_value_recognizer():
    assert fuzzy_value("part~1") == ("part", 1)
    assert fuzzy_value("part~2") == ("part", 2)
    assert fuzzy_value("part") is None
    assert fuzzy_value("part~0") is None  # never stored
    assert fuzzy_value("part~12") is None
    assert fuzzy_value("*") is None
    assert fuzzy_value("[3 TO 7]") is None


def test_vectorized_dp_equals_scalar():
    rng = random.Random(7)
    alpha = "abcde"
    vocab = sorted(
        {"".join(rng.choice(alpha) for _ in range(rng.randint(1, 8))) for _ in range(400)}
    )
    for q in ("abc", "de", "abcde", "aaaa", "zzz"):
        for k in (1, 2):
            got = _fuzzy_filter(vocab, q, k)
            want = [t for t in vocab if levenshtein(t, q) <= k]
            assert got == want, (q, k)
    assert _fuzzy_filter([], "abc", 1) == []
    assert _fuzzy_filter(["zzzzzzzzzz"], "a", 1) == []  # length window empty


def test_scalar_levenshtein_known_values():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("part", "spark") == 2
    assert levenshtein("part", "sort") == 2


def test_highlight_fuzzy_spans():
    from miru_ray.highlight import highlight

    out = highlight("part~1", "the parts of a plan", pre="[", post="]")
    assert out is not None and "[parts]" in out  # parts is 1 edit from part
    assert highlight("part~1", "nothing relevant here") is None


def test_fuzzy_engine_expansion_matches_oracle(engine_fuzzy):
    eng, oracle = engine_fuzzy
    from miru_ray.oracle import oracle_search

    for q in ("t1~1", "w00042~1", "w00042~2 OR t3"):
        hits, found = eng.search(q, k=20)
        ohits, ofound = oracle_search(oracle, q, k=20)
        assert found == ofound, q
        assert [(h.doc_id, h.part) for h in hits] == [
            (h.doc_id, h.part) for h in ohits
        ], q


@pytest.fixture(scope="module")
def engine_fuzzy(ray_session, tiny_transcripts_dir, tiny_rows, tmp_path_factory):
    from miru_ray.build import build_index
    from miru_ray.oracle import build_oracle_partitions
    from miru_ray.search import SearchEngine

    d = str(tmp_path_factory.mktemp("idx_fuzzy"))
    build_index(tiny_transcripts_dir, d, n_parts=4)
    return SearchEngine(d), build_oracle_partitions(tiny_rows, n_parts=4)


def test_parser_regexp_atoms():
    from miru_ray.filters import regexp_value

    assert _leaf_values(parse_query("/s.*n/")) == [("text", "/s.*n/")]
    assert _leaf_values(parse_query("role:/to.l/")) == [("role", "/to.l/")]
    with pytest.raises(QueryParseError):
        parse_query("/s(.*n/")  # '(' splits at the query tokenizer → missing )
    with pytest.raises(QueryParseError):
        parse_query("/s[a/")  # unbalanced class → re.error → parse error
    assert regexp_value("/s.*n/") == "s.*n"
    assert regexp_value("plain") is None
    assert regexp_value("//") is None


def test_regexp_engine_expansion_matches_oracle(engine_fuzzy):
    eng, oracle = engine_fuzzy
    from miru_ray.oracle import oracle_search

    for q in ("/t[13]/", "/w00[45].*/", "/t[13]/ OR w00042"):
        hits, found = eng.search(q, k=20)
        ohits, ofound = oracle_search(oracle, q, k=20)
        assert found == ofound, q
        assert [(h.doc_id, h.part) for h in hits] == [
            (h.doc_id, h.part) for h in ohits
        ], q


def test_highlight_regexp_spans():
    from miru_ray.highlight import highlight

    out = highlight("/pl.n/", "the plan of record", pre="[", post="]")
    assert out is not None and "[plan]" in out
    assert highlight("/pl.n/", "nothing here") is None


def test_suggest_vs_brute(engine_fuzzy):
    """SearchEngine.suggest == brute force over the oracle's global df
    (sum across partitions), ranked (df desc, dist asc, term asc)."""
    eng, oracle = engine_fuzzy
    gdf: dict[str, int] = {}
    for part in oracle.values():
        for t, n in part.df["text"].items():
            gdf[t] = gdf.get(t, 0) + n
    for term, k, d in (("t0", 5, 1), ("w0004", 8, 2), ("zzz", 3, 2)):
        got = eng.suggest(term, k=k, max_dist=d)
        exp = sorted(
            ((t, n, levenshtein(t, term)) for t, n in gdf.items()
             if levenshtein(t, term) <= d),
            key=lambda x: (-x[1], x[2], x[0]),
        )[:k]
        assert got == exp, (term, k, d)
    assert eng.suggest("", k=3) == []
    with pytest.raises(ValueError):
        eng.suggest("t1", max_dist=3)


def test_parser_boost_atoms():
    from miru_ray.filters import FieldFilter

    assert _leaf_values(parse_query("t1^3")) == [("text", "t1")] * 3
    assert _leaf_values(parse_query("scan^2 merge")) == [
        ("text", "scan"), ("text", "scan"), ("text", "merge")
    ]
    with pytest.raises(QueryParseError):
        parse_query("t1^0")
    with pytest.raises(QueryParseError):
        parse_query("t1^0.5")  # float boosts rejected
    with pytest.raises(QueryParseError):
        parse_query("w004*^2")  # boost on wildcard rejected
    # field-scoped ^ stays the composite joiner
    vals = _leaf_values(parse_query("role_tool:user^search"))
    assert vals == [("role_tool", "user\x1esearch")]


def test_boost_equals_repetition_engine(engine_fuzzy):
    eng, oracle = engine_fuzzy
    from miru_ray.oracle import oracle_search

    for boosted, spelled in [
        ("t1^3 t7", "t1 t1 t1 t7"),
        ("t1^2 OR t2", "t1 t1 OR t2"),
    ]:
        for scoring in ("ref_tfidf", "bm25"):
            hb, fb = eng.search(boosted, k=20, scoring=scoring)
            hs, fs = eng.search(spelled, k=20, scoring=scoring)
            assert fb == fs
            assert [(h.doc_id, h.part, h.score) for h in hb] == [
                (h.doc_id, h.part, h.score) for h in hs
            ], (boosted, scoring)
            ohits, ofound = oracle_search(oracle, boosted, k=20, scoring=scoring)
            assert fb == ofound
            assert [(h.doc_id, h.part) for h in hb] == [
                (h.doc_id, h.part) for h in ohits
            ], (boosted, scoring)


def test_suggest_prefix_vs_brute(engine_fuzzy):
    """SearchEngine.suggest_prefix == brute force over the oracle's global
    df restricted to the prefix, ranked (df desc, term asc)."""
    eng, oracle = engine_fuzzy
    gdf: dict[str, int] = {}
    for part in oracle.values():
        for t, n in part.df["text"].items():
            gdf[t] = gdf.get(t, 0) + n
    for prefix, k in (("w004", 10), ("t", 5), ("w00042", 3), ("zzz", 4)):
        got = eng.suggest_prefix(prefix, k=k)
        exp = sorted(
            ((t, n) for t, n in gdf.items() if t.startswith(prefix)),
            key=lambda x: (-x[1], x[0]),
        )[:k]
        assert got == exp, (prefix, k)
    assert eng.suggest_prefix("", k=3) == []


def test_synonym_expansion_rank_identity(engine_fuzzy):
    """search(q, synonyms=...) ≡ the OR query the user could have typed:
    identical hits, scores and found counts (the rewrite only widens leaf
    value lists, which the evaluator unions natively)."""
    import numpy as np

    from miru_ray.oracle import oracle_search

    eng, oracle = engine_fuzzy
    syn = {"t1": ["t2"], "t7": ["w00042"]}
    for q, q_or in (
        ("t1 AND NOT t9", "(t1 OR t2) AND NOT t9"),
        ("t1 t7", "(t1 OR t2) (t7 OR w00042)"),
        ("role:tool t7", "role:tool (t7 OR w00042)"),
    ):
        for scoring in ("bm25", "time"):
            # early_exit=False: the oracle's found counts every partition
            hits, found = eng.search(q, k=20, scoring=scoring, synonyms=syn,
                                     early_exit=False)
            ohits, ofound = oracle_search(oracle, q_or, 20, scoring)
            assert found == ofound, (q, scoring)
            assert [(h.doc_id, h.part) for h in hits] == [
                (h.doc_id, h.part) for h in ohits
            ], (q, scoring)
            if scoring == "bm25":
                assert np.allclose([h.score for h in hits],
                                   [h.score for h in ohits], rtol=1e-5)
    # no-op when no leaf matches a key
    h1, f1 = eng.search("t3", k=10, synonyms={"zzz": ["t1"]})
    h2, f2 = eng.search("t3", k=10)
    assert f1 == f2 and [(h.doc_id, h.part) for h in h1] == [
        (h.doc_id, h.part) for h in h2
    ]
    # wildcard leaves untouched; multi-token synonyms rejected
    hw, _ = eng.search("w004*", k=5, synonyms={"w004*": ["t1"]})
    hw2, _ = eng.search("w004*", k=5)
    assert [(h.doc_id, h.part) for h in hw] == [(h.doc_id, h.part) for h in hw2]
    with pytest.raises(ValueError):
        eng.search("t1", synonyms={"t1": ["two words"]})

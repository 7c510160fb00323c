"""Analyzer-seam tests: registry fallback chain (TermAnalyzers.java:117-136
contract), flat≡scalar parity, and the manifest round trip — an index built
with analyzer="unicode" must answer accented/CJK queries with the SAME
analyzer resolved from its manifest (TermTokenizer.java:34-54)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from miru_ray.analyzers import Analyzer, analyzer_names, get_analyzer, register_analyzer


def test_registry_fallback_chain():
    assert get_analyzer("unicode").name == "unicode"
    assert get_analyzer("ascii").name == "ascii"
    assert get_analyzer(None).name == "default"
    assert get_analyzer("zz_XX").name == "default"
    # language-prefix chop: register a language, resolve a locale of it
    register_analyzer(Analyzer("xx", get_analyzer("ascii").flat, get_analyzer("ascii").scalar))
    try:
        assert get_analyzer("xx_YY").name == "xx"
        assert get_analyzer("XX-zz").name == "xx"
    finally:
        import miru_ray.analyzers as A

        del A._REGISTRY["xx"]
    assert "unicode" in analyzer_names()


def test_unicode_flat_scalar_parity():
    """The scalar side is the vectorized kernel on a 1-row array — assert it
    anyway over a torture set (nulls, empties, CJK, combining marks)."""
    a = get_analyzer("unicode")
    cases = [
        "Héllo WÖRLD foo-bar",
        "北京 Москва abc123",
        "ỆŠÇÅPĘ the_under score",
        "",
        "   ",
        "123 ４５６",  # fullwidth digits are Nd → tokens
        "naïve café résumé",
    ]
    parents, toks = a.flat(pa.array(cases, pa.string()))
    by_row = {}
    for p, t in zip(parents, toks.to_pylist()):
        by_row.setdefault(int(p), []).append(t)
    for i, c in enumerate(cases):
        assert by_row.get(i, []) == a.scalar(c), c
    # stopwords apply identically
    _, toks_sw = a.flat(pa.array(["the naïve and café"], pa.string()), use_stopwords=True)
    assert toks_sw.to_pylist() == ["naïve", "café"]


def test_unicode_flat_null_and_sliced():
    a = get_analyzer("unicode")
    arr = pa.array(["aaa bbb", None, "Ccc déf", "x"], pa.string())
    parents, toks = a.flat(arr.slice(1, 2))
    assert toks.to_pylist() == ["ccc", "déf"]
    assert list(parents) == [1, 1]


@pytest.fixture(scope="module")
def unicode_corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("uni_corpus")
    rows = {
        "conv_id": pa.array([f"c{i:03d}" for i in range(6)], pa.string()),
        "turn_idx": pa.array([0] * 6, pa.int32()),
        "role": pa.array(["user", "assistant"] * 3, pa.string()),
        "text": pa.array(
            [
                "Héllo wörld from Zürich",
                "plain ascii text here",
                "Москва и Киев на карте",
                "das schöne MÄDCHEN",
                "café crème à Paris",
                "hello world Zurich",
            ],
            pa.string(),
        ),
        "tool": pa.array(["t"] * 6, pa.string()),
        "ts": pa.array(list(range(1000, 7000, 1000)), pa.timestamp("us")),
    }
    pq.write_table(pa.table(rows), str(d / "part-0.parquet"))
    return str(d)


def test_unicode_index_round_trip(ray_session, unicode_corpus_dir, tmp_path_factory):
    """build(analyzer='unicode') → manifest records it → SearchEngine resolves
    it for query parse: accented queries match accented docs; the ascii
    analyzer on the same corpus would tokenize 'wörld' as ['w','rld'] and
    miss."""
    from miru_ray.build import build_index
    from miru_ray.search import SearchEngine

    idx = str(tmp_path_factory.mktemp("uni_idx"))
    meta = build_index(unicode_corpus_dir, idx, n_parts=2, analyzer="unicode")
    assert meta["tokenizer"]["analyzer"] == "unicode"

    eng = SearchEngine(idx)
    hits, found = eng.search("WÖRLD", k=10)
    assert {h.conv_id for h in hits} == {"c000"}  # Héllo wörld from Zürich
    hits, _ = eng.search("МОСКВА", k=10)
    assert {h.conv_id for h in hits} == {"c002"}  # Москва и Киев на карте
    hits, _ = eng.search("mädchen café", k=10)  # AND across docs → no match
    assert hits == []
    hits, _ = eng.search("café crème", k=10)
    assert {h.conv_id for h in hits} == {"c004"}  # café crème à Paris


def test_unicode_extend_preserves_analyzer(ray_session, unicode_corpus_dir, tmp_path_factory):
    """extend_index must re-resolve the analyzer from the manifest — new
    accented docs become queryable without the caller restating it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from miru_ray.build import build_index, extend_index
    from miru_ray.search import SearchEngine

    idx = str(tmp_path_factory.mktemp("uni_ext_idx"))
    build_index(unicode_corpus_dir, idx, n_parts=2, analyzer="unicode")
    ext = tmp_path_factory.mktemp("uni_ext_in")
    pq.write_table(
        pa.table(
            {
                "conv_id": pa.array(["d000"], pa.string()),
                "turn_idx": pa.array([0], pa.int32()),
                "role": pa.array(["user"], pa.string()),
                "text": pa.array(["größe Straße prüfung"], pa.string()),
                "tool": pa.array(["t"], pa.string()),
                "ts": pa.array([99_000_000], pa.timestamp("us")),
            }
        ),
        str(ext / "part-0.parquet"),
    )
    extend_index(str(ext), idx)
    eng = SearchEngine(idx)
    hits, _ = eng.search("STRASSE", k=10)  # utf8_lower("STRASSE") ≠ straße — no match
    assert hits == []
    hits, _ = eng.search("Straße prüfung", k=10)
    assert {h.conv_id for h in hits} == {"d000"}


def test_ascii_index_unaffected(ray_session, unicode_corpus_dir, tmp_path_factory):
    """Default build keeps the ascii contract: non-ASCII bytes separate, so
    'wörld' never becomes a token and the accented query finds nothing."""
    from miru_ray.build import build_index
    from miru_ray.search import SearchEngine

    idx = str(tmp_path_factory.mktemp("ascii_idx"))
    meta = build_index(unicode_corpus_dir, idx, n_parts=2)
    assert meta["tokenizer"]["analyzer"] == "default"
    eng = SearchEngine(idx)
    hits, _ = eng.search("hello", k=10)
    assert {h.conv_id for h in hits} == {"c005"}  # hello world Zurich


def test_manifest_records_resolved_analyzer(ray_session, unicode_corpus_dir, tmp_path_factory):
    """A typo/unregistered locale falls back to default AND the manifest
    records the RESOLVED name — a later process registering that locale
    can't silently re-tokenize queries differently."""
    from miru_ray.build import build_index

    idx = str(tmp_path_factory.mktemp("typo_idx"))
    meta = build_index(unicode_corpus_dir, idx, n_parts=2, analyzer="unicod")  # typo
    assert meta["tokenizer"]["analyzer"] == "default"
    # the contract fields describe the resolved analyzer too
    assert meta["tokenizer"]["pattern"] == "[a-z0-9]+"


def test_analyzer_cache_follows_rebuild(ray_session, unicode_corpus_dir, tmp_path_factory):
    """An in-place rebuild with a different analyzer must not serve the old
    cached name (the epoch-keyed cache)."""
    import shutil

    from miru_ray.build import build_index
    from miru_ray.search import _analyzer_name

    idx = str(tmp_path_factory.mktemp("rebuild_idx"))
    build_index(unicode_corpus_dir, idx, n_parts=2)
    assert _analyzer_name(idx) == "default"
    shutil.rmtree(idx)
    build_index(unicode_corpus_dir, idx, n_parts=2, analyzer="unicode")
    assert _analyzer_name(idx) == "unicode"


def test_highlight_unicode_content_side():
    """highlight(analyzer='unicode') must find spans for accented terms in
    the ORIGINAL content (review finding: content side used ascii rule)."""
    from miru_ray.highlight import highlight

    out = highlight("WÖRLD", "Héllo wörld from Zürich", analyzer="unicode")
    assert out is not None and "<b>wörld</b>" in out
    # default analyzer splits the query at Ö into ['w','rld'] and marks the
    # ascii fragments — never the whole accented token
    dflt = highlight("WÖRLD", "Héllo wörld", analyzer="default")
    assert dflt is None or "<b>wörld</b>" not in dflt

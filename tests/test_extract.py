"""Corpus extraction (index answer → raw-source semi-join → parquet):
the exported rows must be exactly the matching (conv_id, turn_idx) source
rows, text included."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from miru_ray.build import build_index
from miru_ray.extract import export_corpus
from miru_ray.filters import parse_query
from miru_ray.oracle import eval_filter
from miru_ray.search import SearchEngine

N_PARTS = 4


@pytest.fixture(scope="module")
def engine(ray_session, tiny_transcripts_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_extract"))
    build_index(tiny_transcripts_dir, d, n_parts=N_PARTS)
    return SearchEngine(d)


def test_export_corpus_rejoins_text(
    engine, tiny_transcripts_dir, tiny_oracle, tmp_path_factory
):
    out = str(tmp_path_factory.mktemp("extract_out"))
    res = export_corpus(engine, "t1 AND NOT t9", tiny_transcripts_dir, out)

    t = pa.concat_tables(
        pq.read_table(f) for f in sorted(glob.glob(out + "/*.parquet"))
    )
    assert t.num_rows == res["rows"] > 0
    got = {
        (c, int(i)): x
        for c, i, x in zip(
            t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(), t["text"].to_pylist()
        )
    }
    filt = parse_query("t1 AND NOT t9")
    exp = {}
    for p in tiny_oracle.values():
        for d in eval_filter(p, filt, None):
            exp[(p.conv_id[d], p.turn_idx[d])] = d
    assert set(got) == set(exp)
    # text is the SOURCE text (round-trips through nothing)
    src = pa.concat_tables(
        pq.read_table(f)
        for f in sorted(glob.glob(tiny_transcripts_dir + "/*.parquet"))
    )
    src_text = {
        (c, int(i)): x
        for c, i, x in zip(
            src["conv_id"].to_pylist(),
            src["turn_idx"].to_pylist(),
            src["text"].to_pylist(),
        )
    }
    assert all(got[k] == src_text[k] for k in got)


def test_export_corpus_column_projection(
    engine, tiny_transcripts_dir, tmp_path_factory
):
    out = str(tmp_path_factory.mktemp("extract_cols"))
    res = export_corpus(
        engine, "t1 t7", tiny_transcripts_dir, out,
        columns=["conv_id", "turn_idx", "text"],
    )
    t = pa.concat_tables(
        pq.read_table(f) for f in sorted(glob.glob(out + "/*.parquet"))
    )
    assert t.column_names == ["conv_id", "turn_idx", "text"]
    assert t.num_rows == res["rows"] > 0


def test_export_corpus_distributed_join_path(
    engine, tiny_transcripts_dir, tmp_path_factory
):
    """Huge-answer regime: with broadcast_limit=0 every export takes the
    distributed keys-Dataset ⨝ source hash join (the driver never builds
    the key array — engine.match is not even called). A broad >50%-of-corpus
    match must produce EXACTLY the broadcast path's rows."""
    q = "NOT zzqqabsent"  # negation of an absent term — the whole corpus
    out_bc = str(tmp_path_factory.mktemp("extract_bc"))
    out_dj = str(tmp_path_factory.mktemp("extract_dj"))
    res_bc = export_corpus(engine, q, tiny_transcripts_dir, out_bc)
    called = {"match": False}
    orig = engine.match
    engine.match = lambda *a, **k: called.__setitem__("match", True) or orig(*a, **k)
    try:
        res_dj = export_corpus(
            engine, q, tiny_transcripts_dir, out_dj,
            broadcast_limit=0, join_partitions=4,
        )
    finally:
        engine.match = orig
    assert not called["match"]  # driver-side key gather never ran
    assert res_dj["matched"] == res_bc["matched"]
    assert res_dj["rows"] == res_bc["rows"] > 0

    def rows(d):
        t = pa.concat_tables(
            pq.read_table(f, columns=["conv_id", "turn_idx", "text"])
            for f in sorted(glob.glob(d + "/*.parquet"))
        )
        return sorted(
            zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(),
                t["text"].to_pylist())
        )

    assert rows(out_dj) == rows(out_bc)
    # corpus share sanity: the match really is the majority of the corpus
    src_rows = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(tiny_transcripts_dir + "/*.parquet")
    )
    assert res_bc["rows"] > src_rows // 2


def test_export_corpus_projection_pushdown_distributed(
    engine, tiny_transcripts_dir, tmp_path_factory
):
    out = str(tmp_path_factory.mktemp("extract_dj_cols"))
    res = export_corpus(
        engine, "t1 t7", tiny_transcripts_dir, out,
        columns=["conv_id", "turn_idx", "text"], broadcast_limit=0,
        join_partitions=2,
    )
    t = pa.concat_tables(
        pq.read_table(f) for f in sorted(glob.glob(out + "/*.parquet"))
    )
    assert sorted(t.column_names) == ["conv_id", "text", "turn_idx"]
    assert t.num_rows == res["rows"] > 0


def test_export_corpus_empty_answer(engine, tiny_transcripts_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("extract_empty"))
    res = export_corpus(
        engine, "t1 AND NOT t1", tiny_transcripts_dir, out
    )
    assert res["rows"] == 0
    files = glob.glob(out + "/*.parquet")
    assert sum(pq.read_metadata(f).num_rows for f in files) == 0


def test_export_cli(engine, tiny_transcripts_dir, tmp_path_factory, capsys):
    import json

    from miru_ray.__main__ import main

    out_meta = str(tmp_path_factory.mktemp("cli_export"))
    assert main(["export", "--index", engine.index_dir, "--query", "t1 t7",
                 "--out", out_meta]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["files"] == N_PARTS and res["rows"] > 0

    out_text = str(tmp_path_factory.mktemp("cli_export_text"))
    assert main(["export", "--index", engine.index_dir, "--query", "t1 t7",
                 "--out", out_text, "--source", tiny_transcripts_dir]) == 0
    res2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res2["rows"] == res["rows"]
    t = pa.concat_tables(
        pq.read_table(f) for f in sorted(glob.glob(out_text + "/*.parquet"))
    )
    assert "text" in t.column_names and t.num_rows == res["rows"]


def test_export_corpus_refuses_nonempty_dir(
    engine, tiny_transcripts_dir, tmp_path_factory
):
    out = str(tmp_path_factory.mktemp("extract_refuse"))
    export_corpus(engine, "t1 t7", tiny_transcripts_dir, out)
    with pytest.raises(FileExistsError):
        export_corpus(engine, "t1 AND NOT t9", tiny_transcripts_dir, out)


def test_highlight_hits(ray_session, tiny_transcripts_dir, tmp_path_factory):
    """highlight_hits: one filtered source read per hit page, fragments
    carry the markers around the query terms, missing source rows → None."""
    from miru_ray.build import build_index
    from miru_ray.extract import highlight_hits
    from miru_ray.search import Hit, SearchEngine

    d = str(tmp_path_factory.mktemp("idx_hl"))
    build_index(tiny_transcripts_dir, d, n_parts=2)
    eng = SearchEngine(d)
    hits, _ = eng.search("t1 t7", k=5, scoring="bm25")
    assert hits
    frags = highlight_hits(eng, "t1 t7", hits, tiny_transcripts_dir)
    assert set(frags) == {(h.conv_id, h.turn_idx) for h in hits}
    for frag in frags.values():
        assert frag is not None and ("<b>t1</b>" in frag or "<b>t7</b>" in frag)
    # a hit whose source row vanished → None, others unaffected
    ghost = Hit(score=0.0, ts=0, doc_id=0, part=0, conv_id="no-such-conv",
                turn_idx=0, role="")
    frags2 = highlight_hits(eng, "t1 t7", hits + [ghost], tiny_transcripts_dir)
    assert frags2[("no-such-conv", 0)] is None
    assert frags2[(hits[0].conv_id, hits[0].turn_idx)] == frags[
        (hits[0].conv_id, hits[0].turn_idx)
    ]

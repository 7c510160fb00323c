"""Wiki XML dump ingest (the reference's corpus demo path) → transcripts
shards → a queryable index. Synthetic two-file dump with markup cases and
a non-main-namespace page that must be skipped."""

import os

import pytest

DUMP_A = """<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/">
 <page>
  <title>Alpha article</title>
  <ns>0</ns>
  <id>10</id>
  <revision><id>900</id><text>The {{infobox|x=1}} quick [[brown fox|fox]] jumps
   over the [[lazy dog]].&lt;ref&gt;cite&lt;/ref&gt; ''emphasis'' [http://x.org ext label]
   [[File:pic.png|thumb]] end.</text></revision>
 </page>
 <page>
  <title>Talk:Alpha article</title>
  <ns>1</ns>
  <id>11</id>
  <revision><text>talk page must be skipped entirely zzskipzz</text></revision>
 </page>
</mediawiki>"""

DUMP_B = """<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/">
 <page>
  <title>Beta article</title>
  <ns>0</ns>
  <id>20</id>
  <revision><text>Nested {{outer {{inner}} tmpl}} survives; plain beta body.</text></revision>
 </page>
</mediawiki>"""


def test_strip_markup_cases():
    from miru_ray.wiki import strip_markup

    assert strip_markup("a {{tpl|x}} b") == "a b"
    assert strip_markup("x {{o {{i}} o}} y") == "x y"
    assert strip_markup("[[target|label]] and [[plain]]") == "label and plain"
    assert strip_markup("[http://u.org some label] t") == "some label t"
    assert strip_markup("keep <ref>dropped</ref> text") == "keep text"
    assert strip_markup("'''bold''' ''it''") == "bold it"
    assert strip_markup("[[File:x.png|thumb]] body") == "body"


def test_wiki_ingest_to_index(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from miru_ray.build import build_index
    from miru_ray.search import SearchEngine
    from miru_ray.wiki import wiki_ingest

    d = tmp_path / "dumps"
    os.makedirs(d)
    (d / "a.xml").write_text(DUMP_A)
    (d / "b.xml").write_text(DUMP_B)
    out = str(tmp_path / "transcripts")
    shards = wiki_ingest(str(d), out)
    assert len(shards) == 2
    t = pq.read_table(shards[0])
    assert t.column_names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # talk page skipped; markup stripped; title prepended
    texts = t["text"].to_pylist()
    assert len(texts) == 1
    assert texts[0].startswith("Alpha article The quick fox jumps")
    assert "infobox" not in texts[0] and "zzskipzz" not in texts[0]
    assert "ext label" in texts[0]

    idx = str(tmp_path / "idx")
    build_index(out, idx, n_parts=2)
    eng = SearchEngine(idx)
    hits, found = eng.search("fox", k=5, scoring="bm25")
    assert found == 1 and hits[0].conv_id == "wiki-000000000010"
    hits2, _ = eng.search("beta", k=5, scoring="bm25")
    assert hits2 and hits2[0].conv_id == "wiki-000000000020"
    # the skipped namespace's text is not indexed
    assert eng.count("zzskipzz") == 0

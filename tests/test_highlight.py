"""Highlighter span tests (LuceneBackedQueryParser.highlight contract:
pre/post wrapping, ~100-char fragments, best 4 joined by ' ... ',
None on no match)."""

from miru_ray.highlight import highlight


def test_basic_wrap():
    assert highlight("scan", "a scan here") == "a <b>scan</b> here"
    assert highlight("scan", "A SCAN here") == "A <b>SCAN</b> here"  # case-insensitive match, original case kept


def test_no_match_returns_none():
    assert highlight("zebra", "nothing to see") is None
    assert highlight("", "content") is None


def test_not_terms_never_highlight():
    out = highlight("scan AND NOT merge", "scan then merge")
    assert out == "<b>scan</b> then merge"
    # pure NOT → no positive terms
    assert highlight("NOT scan", "scan scan") is None


def test_prefix_and_or():
    assert highlight("sca*", "scan scatter scope") == "<b>scan</b> <b>scatter</b> scope"
    assert highlight("a OR b", "a x b") == "<b>a</b> x <b>b</b>"


def test_custom_markers_and_preview():
    assert highlight("x", "x y x", pre="[", post="]") == "[x] y [x]"
    # preview caps analysis: the second match is beyond the window
    assert highlight("zz", "zz " + "a" * 50 + " zz", preview=10) == "<b>zz</b> aaaaaaa"


def test_fragments_best_four_in_order():
    # 6 fragments of ~20 chars; matches in fragments 0, 2, 4, with 2 in #4
    frag = lambda s: s.ljust(19) + " "
    content = (
        frag("hit one") + frag("nothing") + frag("hit two")
        + frag("nothing") + frag("hit hit") + frag("nothing")
    )
    out = highlight("hit", content, fragment_size=20)
    parts = out.split(" ... ")
    assert len(parts) == 3
    assert parts[0].startswith("<b>hit</b> one")
    assert "<b>hit</b> two" in parts[1]
    assert parts[2].count("<b>hit</b>") == 2


def test_range_values_ignored():
    assert highlight("turn_idx:[3 TO 7] scan", "scan 5") == "<b>scan</b> 5"

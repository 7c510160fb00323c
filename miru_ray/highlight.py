"""Query-term highlighter (LuceneBackedQueryParser.highlight analogue).

The reference highlights query terms in content with pre/post markers,
fragments the content (~100 chars), and returns the best 4 fragments
joined by " ... ", analyzing at most ``preview`` chars
(miru-plugin/.../query/LuceneBackedQueryParser.java:56-74: Highlighter +
QueryTermScorer + SimpleFragmenter(100), getBestFragments(tokens,
content, 4, " ... ")). This re-derivation is deterministic: fragments
are token-aligned windows, scored by their count of matched query-term
occurrences, the top ``max_fragments`` by (score desc, position asc)
emitted in position order. Returns None when nothing matches (the
reference returns null on a blank summary).
"""

from __future__ import annotations

import re

from .filters import Filter, parse_query
from .tokenize import _ASCII_LOWER, _PY_TOKEN_RE

# content-side span tokenizer for the unicode analyzer: offsets come from
# the ORIGINAL text (utf8-lowering first could shift offsets — some
# codepoints change length under case folding); each matched token is
# lowercased for comparison. str.lower vs Arrow utf8_lower agree on all
# common scripts — a divergence costs at worst a missed highlight, never a
# wrong span.
_UNI_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)


def _positive_terms(filt: Filter, field: str, out: set[str], term_in: bool = True):
    """Collect the query's positive term values for ``field`` (negated
    operands of pButNotQ never highlight — same sign walk as the signed
    collector, eval_filter_np)."""
    has_operand = filt.inclusive
    for ff in filt.field_filters:
        fin = (not term_in) if (filt.op == "pButNotQ" and has_operand) else term_in
        if fin and ff.field == field:
            out.update(ff.values)
        has_operand = True
    for sub in filt.sub_filters:
        sin = (not term_in) if (filt.op == "pButNotQ" and has_operand) else term_in
        _positive_terms(sub, field, out, sin)
        has_operand = True


def _term_matches(token: str, values: set[str]) -> bool:
    import re

    from .filters import fuzzy_value, levenshtein, regexp_value

    for v in values:
        if v.endswith("*") and regexp_value(v) is None:
            if token.startswith(v[:-1]):
                return True
        elif token == v:
            return True
        else:
            rx = regexp_value(v)
            if rx is not None:
                if re.fullmatch(rx, token):
                    return True
                continue
            fz = fuzzy_value(v)
            if fz is not None and levenshtein(token, fz[0]) <= fz[1]:
                return True
    return False


def highlight(
    query: str,
    content: str,
    pre: str = "<b>",
    post: str = "</b>",
    preview: int = 10_000,
    fragment_size: int = 100,
    max_fragments: int = 4,
    use_stopwords: bool = False,
    analyzer: str = "default",
    field: str = "text",
) -> str | None:
    """Highlight ``query``'s positive terms in ``content``; None if no
    term matches (the reference's blank-summary contract)."""
    try:
        filt = parse_query(query, use_stopwords=use_stopwords, analyzer=analyzer)
    except ValueError:
        return None
    values: set[str] = set()
    _positive_terms(filt, field, values)
    values = {v for v in values if not v.startswith("[") and not v.startswith("{")}
    if not values:
        return None

    text = content[:preview]
    from .analyzers import LOCALE_STOPWORDS, get_analyzer

    resolved = get_analyzer(analyzer).name
    if resolved == "en":
        # stemming chain: the query values are STEMS (the parser analyzed
        # them), so the content-side tokens must stem identically before
        # comparison — spans still come from the ORIGINAL surface form
        from .stem import porter2_stem

        low = text.translate(_ASCII_LOWER)
        spans = [
            (m.start(), m.end())
            for m in _PY_TOKEN_RE.finditer(low)
            if _term_matches(porter2_stem(m.group()), values)
        ]
    elif resolved == "unicode" or resolved in LOCALE_STOPWORDS:
        # unicode-tokenized chains (unicode, de/fr/es): spans from the
        # original text, tokens lowercased — and stemmed for the de chain,
        # matching its index side
        xform = None
        if resolved == "de":
            from .stem import german_stem as xform
        low = text
        spans = [
            (m.start(), m.end())
            for m in _UNI_TOKEN_RE.finditer(text)
            if _term_matches(
                xform(m.group().lower()) if xform else m.group().lower(), values
            )
        ]
    else:
        low = text.translate(_ASCII_LOWER)
        spans = [
            (m.start(), m.end())
            for m in _PY_TOKEN_RE.finditer(low)
            if _term_matches(m.group(), values)
        ]
    if not spans:
        return None

    # token-aligned fragments of ~fragment_size chars
    frags: list[tuple[int, int, int]] = []  # (start, end, n_matches)
    start = 0
    while start < len(text):
        end = min(len(text), start + fragment_size)
        if end < len(text):
            # extend to the end of a token rather than splitting one
            while end < len(text) and low[end].isalnum():
                end += 1
        n = sum(1 for s, _e in spans if start <= s < end)
        frags.append((start, end, n))
        start = end
    best = [f for f in frags if f[2] > 0]
    best.sort(key=lambda f: (-f[2], f[0]))
    chosen = sorted(best[:max_fragments])  # emit in position order

    out_parts: list[str] = []
    for fs, fe, _n in chosen:
        piece: list[str] = []
        cur = fs
        for s, e in spans:
            if s < fs or s >= fe:
                continue
            piece.append(text[cur:s])
            piece.append(pre + text[s:e] + post)
            cur = e
        piece.append(text[cur:fe])
        out_parts.append("".join(piece))
    summary = " ... ".join(out_parts)
    return summary if summary.strip() else None

"""The tokenizer — the term-equality contract of the whole engine.

The reference tokenizes with Lucene analyzer chains at ingest AND at query
parse (reference: miru-plugin/.../query/TermTokenizer.java:34-54,
TermAnalyzers.java:117-136; ingest use
wiki-miru-deployable/.../WikiMiruIndexService.java:396-425).  The index stores
terms only, so the tokenizer must be byte-identical between the build side
and the query side.  We fix a deterministic, locale-free rule that is also
expressible in ANSI SQL (for the DuckDB oracles):

    tokens(text) = maximal runs of [a-z0-9] after ASCII-lowercasing
                 ≡ regexp_extract_all(lower(text), '[a-z0-9]+') on ASCII text

Lowercasing is ASCII-only (bytes A-Z → a-z): non-ASCII bytes are separators,
so the rule operates on raw UTF-8 bytes with no Unicode tables. (The only
divergence from Unicode ``lower()`` is exotic codepoints that case-fold INTO
ascii, e.g. the Kelvin sign — they never produce tokens here. The SQL
oracles use ``lower()``, identical on ASCII corpora.)  An optional English
stopword set mirrors the reference's ``useStopWords`` flag
(LuceneBackedQueryParser.java:48-53); default off.

The Arrow path (`tokenize_flat`) is byte-level numpy: one 256-entry LUT
lowercase pass, one token-class mask, boundary detection by shifted masks
(row-boundary breaks forced), and a single gather building the token string
array in place. No regex, no list arrays, no per-row loop — ~5 linear
passes over the byte buffer, which keeps 30-way-parallel build workers off
the memory-allocator wall.
"""

from __future__ import annotations

import re
import string

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_PATTERN = "[a-z0-9]+"
_PY_TOKEN_RE = re.compile(TOKEN_PATTERN)
_ASCII_LOWER = str.maketrans(string.ascii_uppercase, string.ascii_lowercase)

_LOWER_LUT = np.arange(256, dtype=np.uint8)
_LOWER_LUT[65:91] += 32  # A-Z → a-z
_ISTOK_LUT = np.zeros(256, dtype=bool)
_ISTOK_LUT[ord("a") : ord("z") + 1] = True
_ISTOK_LUT[ord("0") : ord("9") + 1] = True
# token-class on RAW bytes (A-Z included): classifying before lowercasing
# removes the full-buffer lowercase pass — only the ~80% of bytes that are
# token bytes get the LUT applied, after the compress
_ISTOK_RAW = _ISTOK_LUT.copy()
_ISTOK_RAW[ord("A") : ord("Z") + 1] = True

# Small fixed English stopword list (deterministic contract; mirrors the
# spirit of Lucene's EnglishAnalyzer default set, reference
# TermAnalyzers.java:50-115).
STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


def py_tokenize(text: str, use_stopwords: bool = False) -> list[str]:
    """Scalar tokenizer (oracle / query-parse side). Contract-identical to
    ``tokenize_flat`` (ASCII-only lowercasing)."""
    toks = _PY_TOKEN_RE.findall(text.translate(_ASCII_LOWER)) if text else []
    if use_stopwords:
        toks = [t for t in toks if t not in STOPWORDS]
    return toks


def tokenize_flat(
    texts: pa.Array | pa.ChunkedArray, use_stopwords: bool = False,
    with_tokens: bool = True,
) -> tuple[np.ndarray, pa.Array | None]:
    """Vectorized byte-level tokenize of a string column.

    Returns ``(parent_indices:int64[nTokens], tokens:StringArray[nTokens])``
    where ``parent_indices[i]`` is the row of ``texts`` that produced token
    ``i``; tokens appear in within-row order.

    ``with_tokens=False`` (counting-only callers, e.g. packing pass 1)
    skips the token-byte gather + lowercase LUT entirely and returns
    ``(parents, None)`` — roughly a third of the tokenize cost. Requires
    ``use_stopwords=False`` (the stopword filter needs the strings).
    """
    if not with_tokens and use_stopwords:
        raise ValueError("with_tokens=False is incompatible with use_stopwords")
    from .hashing import _string_buffers

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    offsets, data = _string_buffers(texts)
    n_rows = len(offsets) - 1
    # Rebase sliced inputs: offsets index the FULL data buffer, but the
    # mask/boundary passes below assume data[0] is row 0's first byte.
    # Without this, a pa.Array with offset>0 tokenizes bytes outside the
    # window (parents of -1 / n_rows, tokens merged across sliced-away rows).
    if n_rows <= 0:
        return np.empty(0, np.int64), (pa.array([], type=pa.string()) if with_tokens else None)
    if offsets[0] != 0 or int(offsets[-1]) != len(data):
        data = data[int(offsets[0]) : int(offsets[-1])]
        offsets = offsets - offsets[0]
    if len(data) == 0:
        return np.empty(0, np.int64), (pa.array([], type=pa.string()) if with_tokens else None)
    nb = len(data)
    # class mask straight from the RAW bytes (A-Z counted in-class): the
    # full-buffer lowercase pass is gone — lowercasing happens once, after
    # the compress, on token bytes only
    mask = _ISTOK_RAW[data]
    # token boundaries from ONE transition scan (run starts/ends alternate
    # along the transition list) instead of the prev/nxt shifted-mask pair —
    # 2 byte-buffer passes instead of ~6
    t = np.flatnonzero(mask[1:] != mask[:-1]) + 1
    if mask[0]:
        class_starts = np.concatenate([np.zeros(1, np.int64), t[1::2]])
        class_ends = t[0::2]
    else:
        class_starts = t[0::2]
        class_ends = t[1::2]
    if mask[-1]:
        class_ends = np.concatenate([class_ends, np.array([nb], np.int64)])
    # a row boundary inside an in-class run forces a break (adjacent rows
    # must never merge into one token); boundaries at class edges are
    # already transitions
    row_bounds = offsets[(offsets > 0) & (offsets < nb)]
    rb_in = row_bounds[mask[row_bounds] & mask[row_bounds - 1]]
    if len(rb_in) > 1:
        # empty rows repeat an offset — a duplicated break would fabricate
        # an empty token; row_bounds is sorted, so adjacent-unique suffices
        rb_in = rb_in[np.concatenate([[True], rb_in[1:] != rb_in[:-1]])]
    if len(rb_in):
        starts = np.sort(np.concatenate([class_starts, rb_in]))
        ends = np.sort(np.concatenate([class_ends, rb_in]))
    else:
        starts, ends = class_starts, class_ends
    if len(starts) == 0:
        return np.empty(0, np.int64), (pa.array([], type=pa.string()) if with_tokens else None)
    lengths = ends - starts
    parents = np.searchsorted(offsets, starts, side="right") - 1
    if not with_tokens:
        return parents.astype(np.int64, copy=False), None
    out_off = np.zeros(len(starts) + 1, dtype=np.int64)
    np.cumsum(lengths, out=out_off[1:])
    # packed token bytes = ONE boolean compress: every in-class byte belongs
    # to exactly one token and tokens are maximal runs, so data[mask] IS the
    # in-order concatenation of all token bytes; the lowercase LUT then
    # touches only those bytes
    tok_bytes = _LOWER_LUT[data[mask]]
    tokens = pa.StringArray.from_buffers(
        len(starts),
        pa.py_buffer(out_off.astype(np.int32)),
        pa.py_buffer(tok_bytes),
    )
    parents = parents.astype(np.int64, copy=False)
    if use_stopwords:
        keep_a = pc.invert(pc.is_in(tokens, value_set=pa.array(sorted(STOPWORDS))))
        keep = keep_a.to_numpy(zero_copy_only=False)
        tokens = tokens.filter(keep_a)
        parents = parents[keep]
    return parents, tokens


def token_counts(parents: np.ndarray, n_rows: int) -> np.ndarray:
    """Per-row token counts (document lengths) from tokenize_flat output."""
    return np.bincount(parents, minlength=n_rows).astype(np.int32, copy=False)


def token_positions(parents: np.ndarray) -> np.ndarray:
    """Within-row ordinal of each token (0-based) from tokenize_flat output
    — the positional-index payload. ``parents`` is non-decreasing (tokens
    emit in row order), so positions are one boundary scan + a repeat."""
    n = len(parents)
    if n == 0:
        return np.empty(0, np.int64)
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = parents[1:] != parents[:-1]
    starts = np.flatnonzero(new)
    return np.arange(n, dtype=np.int64) - np.repeat(starts, np.diff(np.append(starts, n)))

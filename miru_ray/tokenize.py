"""The tokenizer — the term-equality contract of the whole engine.

The reference tokenizes with Lucene analyzer chains at ingest AND at query
parse (reference: miru-plugin/.../query/TermTokenizer.java:34-54,
TermAnalyzers.java:117-136; ingest use
wiki-miru-deployable/.../WikiMiruIndexService.java:396-425).  The index stores
terms only, so the tokenizer must be byte-identical between the build side
and the query side.  We fix a deterministic, locale-free rule that is also
expressible in ANSI SQL (for the DuckDB oracles):

    tokens(text) = regexp_extract_all(lower(text), '[a-z0-9]+')

i.e. lowercase, then maximal runs of ASCII ``[a-z0-9]``.  An optional English
stopword set mirrors the reference's ``useStopWords`` flag
(LuceneBackedQueryParser.java:48-53); default off.

The Arrow path (`tokenize_flat`) is fully vectorized: ``utf8_lower`` →
``split_pattern_regex`` → ``list_flatten`` + ``list_parent_indices`` →
empty-token mask.  No Python per-row loop.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_PATTERN = "[a-z0-9]+"
_SPLIT_PATTERN = "[^a-z0-9]+"
_PY_TOKEN_RE = re.compile(TOKEN_PATTERN)

# Small fixed English stopword list (deterministic contract; mirrors the
# spirit of Lucene's EnglishAnalyzer default set, reference
# TermAnalyzers.java:50-115).
STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


def py_tokenize(text: str, use_stopwords: bool = False) -> list[str]:
    """Scalar tokenizer (oracle / query-parse side). Contract-identical to
    ``tokenize_flat``."""
    toks = _PY_TOKEN_RE.findall(text.lower()) if text else []
    if use_stopwords:
        toks = [t for t in toks if t not in STOPWORDS]
    return toks


def tokenize_flat(
    texts: pa.Array | pa.ChunkedArray, use_stopwords: bool = False
) -> tuple[np.ndarray, pa.Array]:
    """Vectorized tokenize of a string column.

    Returns ``(parent_indices:int64[nTokens], tokens:StringArray[nTokens])``
    where ``parent_indices[i]`` is the row of ``texts`` that produced token
    ``i``; tokens appear in within-row order.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    low = pc.utf8_lower(pc.coalesce(texts, pa.scalar("", type=texts.type)))
    lists = pc.split_pattern_regex(low, _SPLIT_PATTERN)
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    mask = pc.not_equal(flat, "")
    if use_stopwords:
        mask = pc.and_(mask, pc.invert(pc.is_in(flat, value_set=pa.array(sorted(STOPWORDS)))))
    keep = mask.to_numpy(zero_copy_only=False)
    tokens = flat.filter(mask)
    return parents[keep].astype(np.int64, copy=False), tokens


def token_counts(parents: np.ndarray, n_rows: int) -> np.ndarray:
    """Per-row token counts (document lengths) from tokenize_flat output."""
    return np.bincount(parents, minlength=n_rows).astype(np.int32, copy=False)

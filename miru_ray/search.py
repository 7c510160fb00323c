"""Top-k query engine over immutable index segments.

Re-implements the reference's query path (SURVEY.md §3.3;
FullTextCustomQuestion.askLocal → MiruAggregateUtil.filter →
FullText.collectTfIdf → FullTextAnswerMerger.merge) over our segment
layout, Ray-Data-style: the query plan (parsed filter AST + scoring config)
is broadcast to one task per partition; each task does posting reads with
parquet term-pushdown, sorted-array set algebra, fp32 scoring and a local
top-k; the driver does the exact two-pointer ordered merge.

Rank-identity contract (tested against the pure-python oracle):
* signed term collector (±1 per collected term occurrence, sign flips for
  the negated operands of pButNotQ — MiruAggregateUtil.java:1149-1151,
  1204-1220);
* TF_IDF: multiplier_t = float32(count_t) / float32(Σtf_t^partition)
  (terms with Σtf ≤ 0 dropped — FullText.java:118-127); score accumulated
  in float32 over terms in sorted order; per-partition top-k by (score
  desc, docId desc) (RawBitScore.compareTo), answer sorted (score desc,
  ts desc) (ActivityScore.compareTo); every partition queried with an
  ABSENT report (fulltext always uses the parallel solver, which creates
  solvables with Optional.absent() — MiruService.java:410-414);
* TIME: descending docId, first k, score 0 (FullText.java:222-251).
  The reference's TIME evaluator additionally short-circuits the
  partition walk (isDone, FullTextAnswerEvaluator.java:18-35) because its
  partitions are TIME-ordered: once k newest hits are found, older
  partitions cannot contribute. Our partitioning is conversation-hash
  (ts ranges overlap across partitions), so that early exit would be
  UNSOUND here and all partitions are asked — by design, not omission;
  with range partitioning (build_index(partitioning="range") over a
  time-ordered stream) the per-partition manifest ts zone maps are
  disjoint and the walk DOES stop early (see SearchEngine.search);
* merge: partitions newest→oldest (descending part id), two-pointer
  truncated to k, taking from the running merge iff strictly less — ties
  go to the current partition (FullTextAnswerMerger.java:56-63);
  ``found`` sums the per-partition answer cardinalities.

BM25 mode (the north star's scoring engine) uses the same machinery with
idf = ln(1 + (N - df + ½)/(df + ½)) and the k1/b length normalization over
the per-partition doc-length table; block-max metadata enables skip
pruning for conjunctive all-positive queries (see codec.BLOCK_SIZE).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from .codec import POS_FIELD, decode_posting, get_codec
from .filters import DEFAULT_MAX_WILDCARD_EXPANSION, Filter, parse_query
from .segments import (
    FIELD_SEP,
    forward_columns,
    read_global_manifest,
    read_manifest,
    read_postings_for_terms,
    read_term_between,
    read_term_range,
    completed_parts,
)

F32 = np.float32
BM25_K1 = 1.2
BM25_B = 0.75
LMD_MU = 1500.0  # Dirichlet smoothing mass (Zhai & Lafferty 2004 default range)

_EMPTY = np.empty(0, dtype=np.int64)

# per-process cache of ray.remote-wrapped helpers (exported to the cluster
# once per session, not once per call — same pattern as plugins._REMOTE_FNS)
_REMOTE_FNS: dict = {}


@dataclass
class Hit:
    score: float
    ts: int
    doc_id: int
    part: int
    conv_id: str
    turn_idx: int
    role: str = ""


def _sort_key(h: Hit):
    return (-F32(h.score), -h.ts)


# --------------------------------------------------------------- AST walking


def _collect_term_specs(filt: Filter, out: list[tuple[str, str]]):
    for ff in filt.field_filters:
        for v in ff.values:
            out.append((ff.field, v))
            if filt.op == "phrase":
                out.append((POS_FIELD, v))  # occurrence stream for verify
    for sub in filt.sub_filters:
        _collect_term_specs(sub, out)


def _has_phrase(filt: Filter) -> bool:
    return filt.op == "phrase" or any(_has_phrase(s) for s in filt.sub_filters)


# per-process decoded-posting cache: (index_dir, part, epoch, "field\x1fterm")
# → (docs, tfs, ttf, df) | None-for-absent. The analogue of the reference's
# per-partition bitmap caches held by reader nodes (LAB leap cache /
# StrutModelCache.java pattern). Worker processes are reused across Ray
# tasks, and partition-pinned query actors make hits deterministic. The
# epoch component is the partition manifest's mtime: extend_index / repair
# rewrite postings.parquet + manifest, so warm workers must not serve the
# pre-extend postings or n_docs (mirrors _FORWARD_CACHE/_TOMBSTONE_CACHE).
_POSTING_CACHE: dict[tuple, tuple | None] = {}
_POSTING_CACHE_CAP = 200_000
_MANIFEST_CACHE: dict[tuple, dict] = {}

# per-process wildcard/range expansion cache: (index_dir, part, epoch,
# field, spec) → sorted matching terms. A prefix/range query re-scans the
# term dictionary (one pushdown parquet read per partition) on EVERY
# evaluation even when every expanded posting is already in
# _POSTING_CACHE — the reference keeps its term dictionary resident in the
# LAB leap cache, so repeated wildcard queries never re-walk storage
# (LabInvertedIndex leap cache; TermIdStream re-use). Epoch-keyed like the
# posting cache so extend/repair invalidate it.
_EXPANSION_CACHE: dict[tuple, list] = {}
_EXPANSION_CACHE_CAP = 50_000


def _fuzzy_filter(terms: list[str], q: str, k: int) -> list[str]:
    """Sorted subset of ``terms`` within byte-level Levenshtein distance
    ``k`` of ``q`` — the FuzzyQuery expansion (Lucene walks a Levenshtein
    automaton over the FST term dictionary; this is the same set computed
    as one vectorized DP over the partition dictionary: a length-window
    prefilter, then a (n_cands, max_len) numpy edit-distance table swept
    column-by-column — no per-candidate python loop)."""
    if not terms:
        return []
    qb = np.frombuffer(q.encode(), dtype=np.uint8)
    enc = [t.encode() for t in terms]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=len(enc))
    cand = np.nonzero(np.abs(lens - len(qb)) <= k)[0]
    if cand.size == 0:
        return []
    clens = lens[cand]
    L = int(clens.max())
    mat = np.zeros((cand.size, L), dtype=np.uint8)
    data = np.frombuffer(b"".join(enc[i] for i in cand), dtype=np.uint8)
    offs = np.zeros(cand.size + 1, dtype=np.int64)
    np.cumsum(clens, out=offs[1:])
    pos = np.arange(L)[None, :]
    valid = pos < clens[:, None]
    mat[valid] = data[(offs[:-1, None] + pos)[valid]]
    prev = np.broadcast_to(
        np.arange(L + 1, dtype=np.int16), (cand.size, L + 1)
    ).copy()
    for i, qc in enumerate(qb, 1):
        sub = prev[:, :-1] + (mat != qc)
        cur = np.empty_like(prev)
        cur[:, 0] = i
        for j in range(1, L + 1):  # L ≤ len(q)+k: short inner sweep
            np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1, out=cur[:, j])
            np.minimum(cur[:, j], sub[:, j - 1], out=cur[:, j])
        prev = cur
    dist = prev[np.arange(cand.size), clens]
    return [terms[i] for i in cand[dist <= k]]


def _manifest_epoch(index_dir: str, part: int) -> float:
    import os

    from .segments import manifest_path

    try:
        return os.path.getmtime(manifest_path(index_dir, part))
    except OSError:
        return -1.0


_CODEC_CACHE: dict[str, object] = {}


def _index_codec(index_dir: str):
    """The index's posting value codec, from the global manifest's ``codec``
    key (absent → varbyte, the pre-SPI default). Cached per index_dir: the
    codec is fixed at build time and never changes across extends/repairs
    (they inherit it from the same manifest)."""
    c = _CODEC_CACHE.get(index_dir)
    if c is None:
        from .segments import read_global_manifest

        try:
            name = (read_global_manifest(index_dir) or {}).get("codec")
        except FileNotFoundError:
            name = None
        c = get_codec(name)
        _CODEC_CACHE[index_dir] = c
    return c



# analyzer name per index, keyed by the GLOBAL manifest's mtime epoch (like
# _MANIFEST_CACHE): extend/repair never change the analyzer, but an
# in-place REBUILD of the same directory may — the epoch key makes the
# cache follow index.json instead of serving the first process-lifetime
# answer forever
_ANALYZER_CACHE: dict[tuple, str] = {}


def _index_has_positions(index_dir: str) -> bool:
    """Whether the index carries the positional occurrence streams
    (``positions=True`` at build time) — phrase queries need them."""
    try:
        epoch = os.path.getmtime(os.path.join(index_dir, "index.json"))
    except OSError:
        epoch = -1.0
    key = ("__positions__", index_dir, epoch)
    hit = _ANALYZER_CACHE.get(key)
    if hit is None:
        from .segments import read_global_manifest

        meta = read_global_manifest(index_dir) or {}
        hit = "y" if meta.get("positions") else "n"
        _ANALYZER_CACHE[key] = hit
    return hit == "y"


def _analyzer_name(index_dir: str) -> str:
    try:
        epoch = os.path.getmtime(os.path.join(index_dir, "index.json"))
    except OSError:
        epoch = -1.0
    key = (index_dir, epoch)
    name = _ANALYZER_CACHE.get(key)
    if name is None:
        from .segments import read_global_manifest

        meta = read_global_manifest(index_dir) or {}
        name = (meta.get("tokenizer") or {}).get("analyzer", "default")
        _ANALYZER_CACHE[key] = name
    return name


_MANIFEST_MISS = object()  # sentinel: a cached None must count as a hit


def _check_tokenizer_compat(meta: dict, index_dir: str) -> None:
    """Raise loudly when the index's RECORDED tokenizer contract no longer
    matches what the resolved analyzer produces today — querying (or
    extending) such an index would silently mismatch terms (zero hits /
    split vocabularies), e.g. after the round-5 \\p{M} token-class
    change for mark scripts. Pre-pattern manifests skip the check."""
    tok = (meta or {}).get("tokenizer") or {}
    recorded = tok.get("pattern")
    if not recorded:
        return
    from .analyzers import tokenizer_meta

    current = tokenizer_meta(tok.get("analyzer"), bool(tok.get("stopwords")))
    if current["pattern"] != recorded:
        raise ValueError(
            f"{index_dir}: index was built with token pattern {recorded!r} "
            f"but analyzer {tok.get('analyzer')!r} now tokenizes with "
            f"{current['pattern']!r} — rebuild the index (or pin the "
            "library version it was built with); querying across the "
            "mismatch would silently return wrong answers"
        )


def _cached_manifest(index_dir: str, part: int) -> dict:
    from .segments import read_manifest

    key = (index_dir, part, _manifest_epoch(index_dir, part))
    # sentinel-based lookup so a cached None (missing / unreadable
    # manifest — a vanished primary partition in replica mode) is a HIT:
    # .get(key) alone would re-read the missing file on every query
    # (ADVICE r4, the defeated negative cache)
    m = _MANIFEST_CACHE.get(key, _MANIFEST_MISS)
    if m is _MANIFEST_MISS:
        m = read_manifest(index_dir, part)
        if len(_MANIFEST_CACHE) > 4096:
            _MANIFEST_CACHE.clear()
        _MANIFEST_CACHE[key] = m
    return m


# lazy-tf threshold: postings with at least this many blocks keep their tf
# bytes ENCODED at read time; docs decode once (set algebra needs them),
# tf decodes per touched block during scoring (codec.decode_tf_range) —
# the partial-decode path for hot terms whose postings dwarf the touched
# candidate set. DECODE_STATS tracks the realized byte savings.
LAZY_TF_BLOCKS = 64
DECODE_STATS = {"tf_bytes_total": 0, "tf_bytes_decoded": 0}


class PostingSource:
    """Per-partition posting reader: one pushdown parquet read for the terms
    a query needs that are not already in the process cache, decoded into
    sorted docId arrays. Large postings defer tf decoding (lazy-tf)."""

    def __init__(self, index_dir: str, part: int, specs: list[tuple[str, str]],
                 max_wild: int):
        from .filters import fuzzy_value, range_term_bounds, regexp_value

        epoch = _manifest_epoch(index_dir, part)

        def _expand(field: str, v: str) -> list[str]:
            hit = expand_spec(index_dir, part, epoch, field, v)
            # the cache holds the UNTRIMMED expansion; the maxWildcardExpansion
            # cap is per query (reference: FullTextQuery maxWildcardExpansion)
            return hit[:max_wild] if max_wild > 0 else hit

        self.expansions: dict[tuple[str, str], list[str]] = {}
        keys = set()
        for field, v in specs:
            if (range_term_bounds(v) is not None or v.endswith("*")
                    or fuzzy_value(v) is not None or regexp_value(v) is not None):
                terms = _expand(field, v)
                self.expansions[(field, v)] = terms
                keys.update(field + FIELD_SEP + t for t in terms)
            else:
                keys.add(field + FIELD_SEP + v)
        self._codec = _index_codec(index_dir)
        self.index_dir = index_dir
        self.post: dict[tuple[str, str], tuple[np.ndarray, np.ndarray]] = {}
        self.ttf: dict[tuple[str, str], int] = {}
        self.df: dict[tuple[str, str], int] = {}
        self.blocks: dict[tuple[str, str], dict[str, np.ndarray]] = {}
        misses = []
        for k in sorted(keys):
            ck = (index_dir, part, epoch, k)
            if ck in _POSTING_CACHE:
                # LRU touch: dicts preserve insertion order, so pop+reinsert
                # marks the entry most-recent (eviction takes the front)
                hit = _POSTING_CACHE.pop(ck)
                _POSTING_CACHE[ck] = hit
                if hit is not None:
                    field, term = k.split(FIELD_SEP, 1)
                    self.post[(field, term)] = (hit[0], hit[1])
                    self.ttf[(field, term)] = hit[2]
                    self.df[(field, term)] = hit[3]
                    self.blocks[(field, term)] = hit[4]
            else:
                misses.append(k)
        if misses:
            # evict least-recently-used entries one by one (replaces the
            # old wholesale clear(), which dropped the whole warm set);
            # the non-empty guard covers a single source whose miss set
            # alone exceeds the cap
            while _POSTING_CACHE and len(_POSTING_CACHE) + len(misses) > _POSTING_CACHE_CAP:
                _POSTING_CACHE.pop(next(iter(_POSTING_CACHE)))
            t = read_postings_for_terms(index_dir, part, misses)
            found = set()
            for i in range(t.num_rows):
                key_str = t["term"][i].as_py()
                field, term = key_str.split(FIELD_SEP, 1)
                blk_first = np.asarray(t["blk_first"][i].as_py())
                blk_count = np.asarray(t["blk_count"][i].as_py())
                n_blocks = int(t["n_blocks"][i].as_py())
                tf_raw = t["tf_bytes"][i].as_py()
                DECODE_STATS["tf_bytes_total"] += len(tf_raw)
                lazy = n_blocks >= LAZY_TF_BLOCKS
                docs, tfs = decode_posting(
                    t["doc_bytes"][i].as_py(),
                    None if lazy else tf_raw,
                    blk_first,
                    blk_count,
                    self._codec,
                )
                if not lazy:
                    DECODE_STATS["tf_bytes_decoded"] += len(tf_raw)
                ttf = int(t["ttf"][i].as_py())
                df = int(t["df"][i].as_py())
                blocks = {
                    "first": blk_first,
                    "count": blk_count,
                    "max_tf": np.asarray(t["blk_max_tf"][i].as_py()),
                    "min_dl": np.asarray(t["blk_min_dl"][i].as_py()),
                }
                if lazy:
                    blocks["tf_bytes"] = tf_raw
                    blocks["tf_end"] = np.asarray(t["blk_tf_end"][i].as_py(), dtype=np.int64)
                    blocks["count_cum"] = np.cumsum(blk_count.astype(np.int64))
                self.post[(field, term)] = (docs, tfs)
                self.ttf[(field, term)] = ttf
                self.df[(field, term)] = df
                self.blocks[(field, term)] = blocks
                _POSTING_CACHE[(index_dir, part, epoch, key_str)] = (docs, tfs, ttf, df, blocks)
                found.add(key_str)
            for k in misses:
                if k not in found:
                    _POSTING_CACHE[(index_dir, part, epoch, k)] = None  # negative entry
        self._ckey = (index_dir, part, epoch)

    def expand(self, field: str, value: str) -> list[str]:
        from .filters import fuzzy_value, regexp_value

        if (field, value) in self.expansions:
            return self.expansions[(field, value)]
        if (value.endswith("*") or fuzzy_value(value) is not None
                or regexp_value(value) is not None):
            return []
        return [value]

    def docs(self, field: str, term: str) -> np.ndarray:
        p = self.post.get((field, term))
        return p[0] if p is not None else _EMPTY

    def tfs(self, field: str, term: str) -> np.ndarray:
        """Full tf array (forces a full decode of lazy-tf postings and
        writes the eager form back to the process cache so later queries
        skip the decode)."""
        p = self.post.get((field, term))
        if p is None:
            return _EMPTY
        if p[1] is None:
            from .codec import decode_tf_range

            blk = self.blocks[(field, term)]
            DECODE_STATS["tf_bytes_decoded"] += len(blk["tf_bytes"])
            tfs = decode_tf_range(blk["tf_bytes"], blk["tf_end"], 0, len(blk["tf_end"]), self._codec)
            self.post[(field, term)] = (p[0], tfs)
            ck = self._ckey + (field + FIELD_SEP + term,)
            hit = _POSTING_CACHE.get(ck)
            if hit is not None:
                _POSTING_CACHE[ck] = (hit[0], tfs, hit[2], hit[3], hit[4])
            return tfs
        return p[1]

    def tf_at(self, field: str, term: str, pos: np.ndarray) -> np.ndarray:
        """tf values at positions ``pos`` (indices into the docs array).
        Lazy-tf postings decode ONE contiguous block range covering the
        touched positions (vectorized — never a per-block python loop);
        when more than a quarter of the blocks are touched, fall through
        to a full decode that is cached for the rest of the process."""
        p = self.post.get((field, term))
        if p is None:
            return _EMPTY
        if p[1] is not None:
            return p[1][pos]
        if len(pos) == 0:
            return np.empty(0, dtype=np.int64)
        from .codec import decode_tf_range

        blk = self.blocks[(field, term)]
        cum = blk["count_cum"]  # end position of each block
        bids = np.searchsorted(cum, pos, side="right")
        b_lo, b_hi = int(bids.min()), int(bids.max()) + 1
        if (b_hi - b_lo) * 4 >= len(cum):
            return self.tfs(field, term)[pos]
        t_lo = 0 if b_lo == 0 else int(blk["tf_end"][b_lo - 1])
        DECODE_STATS["tf_bytes_decoded"] += int(blk["tf_end"][b_hi - 1]) - t_lo
        tf_span = decode_tf_range(blk["tf_bytes"], blk["tf_end"], b_lo, b_hi, self._codec)
        base = 0 if b_lo == 0 else int(cum[b_lo - 1])
        return tf_span[pos - base]


# position packing for the adjacency intersect: doc<<21 | shifted-pos —
# tokens past within-doc position 2^21-len(phrase) are not phrase-matchable
# (a 2M-token doc; transcripts turns are ~100 tokens)
_PHRASE_POS_BITS = np.int64(21)


def _occ_keys(src: "PostingSource", tok: str, cand: np.ndarray) -> np.ndarray | None:
    """Packed (doc << POS_BITS | pos) occurrence keys of ``tok`` restricted
    to the candidate docs, strictly increasing (occurrence streams are
    (doc asc, pos asc)); None when the restriction is empty. Partial tf
    decode keeps the position reads proportional to the candidates."""
    occ = src.docs(POS_FIELD, tok)
    if len(occ) == 0:
        return None
    idx = np.searchsorted(cand, occ)
    ok = (idx < len(cand)) & (cand[np.minimum(idx, len(cand) - 1)] == occ)
    sel = np.flatnonzero(ok)
    if len(sel) == 0:
        return None
    pos = src.tf_at(POS_FIELD, tok, sel).astype(np.int64)
    fit = pos < (np.int64(1) << _PHRASE_POS_BITS)
    return (occ[sel[fit]] << _PHRASE_POS_BITS) | pos[fit]


def _eval_phrase(
    filt: Filter,
    src: PostingSource,
    collector: dict[tuple[str, str], int] | None,
    term_in: bool = True,
) -> np.ndarray:
    """Exact phrase match: AND of the component-term postings for candidate
    docs, then a vectorized adjacency intersect over the positional
    occurrence streams (POS_FIELD) — occurrence i of token k matches when
    (doc, pos-k) collides across every k. Each token contributes to the
    signed collector exactly like an AND leaf, so scoring over the phrase
    answer equals the AND query's scores restricted to adjacent docs (the
    SQL-mirrorable contract). Partial tf decode (``tf_at``) keeps the
    position reads proportional to the CANDIDATE docs, not the term's
    occurrence count."""
    ff = filt.field_filters[0]
    toks = ff.values
    # positional streams exist for the text field only, and only when the
    # index was built with positions=True — raise rather than silently
    # matching nothing (covers plugin queries and constraint trees too,
    # which never pass through search_partition's early guard)
    from .filters import DEFAULT_FIELD

    if ff.field != DEFAULT_FIELD:
        raise ValueError(
            f"phrase queries are supported on the {DEFAULT_FIELD!r} field only "
            f"(got {ff.field!r}: meta fields have no positional streams)"
        )
    if not _index_has_positions(src.index_dir):
        raise ValueError(
            'phrase queries ("...") need an index built with positions=True '
            "(the positional occurrence streams are opt-in)"
        )
    inc = 1 if term_in else -1
    if collector is not None:
        for t in toks:
            key = (ff.field, t)
            collector[key] = collector.get(key, 0) + inc
    cand: np.ndarray | None = None
    for t in dict.fromkeys(toks):  # unique, order-preserving
        d = src.docs(ff.field, t)
        if len(d) == 0:
            return _EMPTY
        cand = d if cand is None else np.intersect1d(cand, d, assume_unique=True)
        if len(cand) == 0:
            return _EMPTY
    win = np.int64(filt.slop + 1)
    if not filt.ordered:
        # unordered two-term near (SpanNearQuery inOrder=false analogue,
        # `"a b"~~N`): a doc matches when some occurrence pair satisfies
        # 1 ≤ |pos_a − pos_b| ≤ slop+1. One two-sided searchsorted window
        # probe of b's packed keys into a's — symmetric by construction,
        # same-doc enforced by clamping the window at the doc's key range.
        ka = _occ_keys(src, toks[0], cand)
        kb = _occ_keys(src, toks[1], cand)
        if ka is None or kb is None:
            return _EMPTY
        base = (kb >> _PHRASE_POS_BITS) << _PHRASE_POS_BITS
        ceil = base | ((np.int64(1) << _PHRASE_POS_BITS) - np.int64(1))
        lo = np.maximum(kb - win, base)
        hi = np.minimum(kb + win, ceil)
        n_in = np.searchsorted(ka, hi, side="right") - np.searchsorted(ka, lo, side="left")
        if toks[0] == toks[1]:
            # a same-term pair needs a DISTINCT second occurrence
            p = np.searchsorted(ka, kb)
            self_hit = (p < len(ka)) & (ka[np.minimum(p, len(ka) - 1)] == kb)
            n_in = n_in - self_hit.astype(np.int64)
        return np.unique(kb[n_in > 0] >> _PHRASE_POS_BITS).astype(np.int64)

    # windowed chain over packed (doc<<21 | pos) keys: after term i, `state`
    # holds the occurrences of toks[i] that END a valid ordered chain of
    # toks[:i+1] with every adjacent gap ≤ slop+1 (slop=0 ≡ exact phrase).
    # Each step is two searchsorted passes — no per-doc python.
    state: np.ndarray | None = None
    for t in toks:
        k = _occ_keys(src, t, cand)
        if k is None:
            return _EMPTY
        if state is None:
            state = k
        else:
            # a predecessor exists in [pos-win, pos-1] of the SAME doc:
            # clamp the window's low edge at the doc's pos-0 key
            lo = np.maximum(k - win, (k >> _PHRASE_POS_BITS) << _PHRASE_POS_BITS)
            left = np.searchsorted(state, lo, side="left")
            right = np.searchsorted(state, k, side="left")
            state = k[right > left]
        if len(state) == 0:
            return _EMPTY
    return np.unique(state >> _PHRASE_POS_BITS)


def eval_filter_np(
    filt: Filter,
    src: PostingSource,
    n_docs: int,
    collector: dict[tuple[str, str], int] | None,
    term_in: bool = True,
) -> np.ndarray:
    """filterInOut over sorted int64 docId arrays
    (MiruAggregateUtil.java:1123-1202). The extra ``phrase`` op (no
    reference analogue — LuceneBackedQueryParser.java:106-109 throws on
    PhraseQuery) verifies token adjacency against the positional index."""
    if filt.op == "phrase":
        return _eval_phrase(filt, src, collector, term_in)
    operands: list[np.ndarray] = []
    if filt.inclusive:
        operands.append(np.arange(n_docs, dtype=np.int64))
    for ff in filt.field_filters:
        field_term_in = (not term_in) if (filt.op == "pButNotQ" and operands) else term_in
        terms = []
        for v in ff.values:
            terms.extend(src.expand(ff.field, v))
        if collector is not None:
            inc = 1 if field_term_in else -1
            for t in terms:
                key = (ff.field, t)
                collector[key] = collector.get(key, 0) + inc
        if filt.op == "and" and not terms:
            return _EMPTY
        if terms:
            arrs = [src.docs(ff.field, t) for t in terms]
            arrs = [a for a in arrs if len(a)]
            if len(arrs) == 0:
                operands.append(_EMPTY)
            elif len(arrs) == 1:
                operands.append(arrs[0])
            else:
                operands.append(np.unique(np.concatenate(arrs)))
    for sub in filt.sub_filters:
        sub_term_in = (not term_in) if (filt.op == "pButNotQ" and operands) else term_in
        operands.append(eval_filter_np(sub, src, n_docs, collector, sub_term_in))
    if not operands:
        return _EMPTY
    if filt.op == "and":
        r = operands[0]
        for o in operands[1:]:
            if len(r) == 0:
                return _EMPTY
            r = np.intersect1d(r, o, assume_unique=True)
        return r
    if filt.op == "or":
        nonempty = [o for o in operands if len(o)]
        if not nonempty:
            return _EMPTY
        if len(nonempty) == 1:
            return nonempty[0]
        return np.unique(np.concatenate(nonempty))
    if filt.op == "pButNotQ":
        r = operands[0]
        for o in operands[1:]:
            if len(r) == 0:
                return _EMPTY
            if len(o):
                r = np.setdiff1d(r, o, assume_unique=True)
        return r
    raise ValueError(filt.op)


# ------------------------------------------------------------ partition task


# per-process authz mask cache: composed allowed-docs set per
# (partition, epoch, expression) — the MiruAuthzCache analogue
# (miru-service/.../auth/MiruAuthzCache.java): an authz expression's mask
# is reused across queries until the partition changes.
_AUTHZ_CACHE: dict[tuple, np.ndarray] = {}


def authz_mask(index_dir: str, part: int, authz: tuple[str, tuple[str, ...]],
               n_docs: int) -> np.ndarray:
    """Allowed docIds for an authz expression ``(field, allowed_values)``:
    the union of the values' postings (a doc is visible iff it carries at
    least one allowed label — the reference's composite authz bitmap,
    MiruAuthzIndex.java / MiruAuthzCache.java), cached per process."""
    field, values = authz
    key = (index_dir, part, _manifest_epoch(index_dir, part), field, tuple(sorted(values)))
    hit = _AUTHZ_CACHE.get(key)
    if hit is None:
        src = PostingSource(index_dir, part, [(field, v) for v in values], 0)
        arrs = [src.docs(field, v) for v in values]
        arrs = [a for a in arrs if len(a)]
        hit = np.unique(np.concatenate(arrs)) if arrs else _EMPTY
        if len(_AUTHZ_CACHE) > 1024:
            _AUTHZ_CACHE.clear()
        _AUTHZ_CACHE[key] = hit
    return hit


def expand_spec(index_dir: str, part: int, epoch: float, field: str,
                v: str) -> list[str]:
    """UNTRIMMED sorted term expansion of spec ``v`` (prefix ``x*``, range
    ``[lo TO hi]``, fuzzy ``x~N``, regexp ``/re/``), cached per
    (partition, epoch) in _EXPANSION_CACHE. A fuzzy/regexp spec derives
    from the cached field dictionary (≡ the "*" spec), so repeated
    dictionary-walking queries share one storage scan per epoch."""
    from .filters import fuzzy_value, range_term_bounds, regexp_value

    ck = (index_dir, part, epoch, field, v)
    hit = _EXPANSION_CACHE.get(ck)
    if hit is None:
        rx = regexp_value(v)
        fz = fuzzy_value(v) if rx is None else None
        bounds = range_term_bounds(v) if rx is None and fz is None else None
        if rx is not None:
            # regexp expansion: the field dictionary + one anchored RE2
            # pass (pyarrow match_substring_regex — vectorized)
            import pyarrow as pa
            import pyarrow.compute as pc

            cands = expand_spec(index_dir, part, epoch, field, "*")
            if cands:
                m = pc.match_substring_regex(
                    pa.array(cands, type=pa.string()), f"^(?:{rx})$"
                ).to_numpy(zero_copy_only=False)
                hit = [t for t, ok in zip(cands, m) if ok]
            else:
                hit = []
        elif fz is not None:
            hit = _fuzzy_filter(
                expand_spec(index_dir, part, epoch, field, "*"), fz[0], fz[1]
            )
        elif bounds is not None:
            lo, hi, lo_inc, hi_inc = bounds
            hit = read_term_between(index_dir, part, field, lo, hi, lo_inc, hi_inc)
        else:
            hit = read_term_range(index_dir, part, field, v[:-1])
        if len(_EXPANSION_CACHE) > _EXPANSION_CACHE_CAP:
            _EXPANSION_CACHE.clear()
        _EXPANSION_CACHE[ck] = hit
    return hit


def _after_mask(part: int, answer: np.ndarray, scores: np.ndarray,
                ts_all: np.ndarray, after: tuple) -> np.ndarray:
    """Strictly-after-the-cursor mask in the realized total answer order
    (score desc, ts desc, part desc, doc_id desc). The cursor's score is
    compared in fp32 — the engine's own score dtype — so a Hit handed back
    verbatim always resumes exactly where the page ended."""
    a_s, a_ts, a_p, a_d = after
    a_s = F32(a_s)
    lt = scores < a_s
    eq = scores == a_s
    ts_lt = ts_all < a_ts
    if part < a_p:
        within = ts_all == a_ts
    elif part == a_p:
        within = (ts_all == a_ts) & (answer < a_d)
    else:
        within = np.zeros(len(answer), dtype=bool)
    return lt | (eq & (ts_lt | within))


def search_partition(
    index_dir: str,
    part: int,
    query: str,
    k: int,
    scoring: str = "ref_tfidf",
    time_range: tuple[int, int] | None = None,
    constraint: Filter | None = None,
    max_wild: int = DEFAULT_MAX_WILDCARD_EXPANSION,
    use_stopwords: bool = False,
    prune: bool = True,
    authz: tuple[str, tuple[str, ...]] | None = None,
    min_score: float | None = None,
    below_min: int = 0,
    after: tuple[float, int, int, int] | None = None,
    synonyms: dict[str, list[str]] | None = None,
    collapse: str | None = None,
    group_by: tuple[str, tuple, int] | None = None,
) -> dict:
    """One partition's answer with absent report. Returns plain arrays (ray
    task friendly). ``prune=False`` forces the full-evaluation path (used by
    tests to cross-check the block-max pruned path).

    ``collapse`` — field collapsing (Lucene CollapsingTopDocsCollector):
    at most one hit per distinct value of the named forward field
    (``conv_id`` or ``role``), each group represented by its best-ordered
    doc — (score desc, docId desc) under relevance scorers, the newest doc
    under TIME. The partition returns its top-k DISTINCT keys; the engine
    merge dedups keys across partitions (the better-ordered occurrence
    wins, so the survivor is the per-key global best). ``found`` still
    counts the uncollapsed match set, like Lucene's totalHits.

    ``after`` = (score, ts, part, doc_id) — deep-pagination cursor (Lucene
    IndexSearcher.searchAfter): only docs strictly AFTER the cursor in the
    engine's realized total answer order (score desc, ts desc, part desc,
    doc_id desc — the per-partition heap tie-break plus the merge's
    tie-to-current rule) are admitted to the top-k. ``found`` still counts
    the full match set (Lucene reports totalHits the same way)."""
    if collapse is not None:
        if collapse not in ("conv_id", "role"):
            raise ValueError("collapse supports the forward fields 'conv_id'/'role'")
        if scoring == "match":
            raise ValueError("collapse applies to ranked queries, not match")
        if after is not None or min_score is not None:
            raise ValueError("collapse composes with neither searchAfter nor "
                             "the serial report mode")
    if group_by is not None:
        if collapse is not None or scoring == "match" or after is not None \
                or min_score is not None:
            raise ValueError("group_by composes with ranked scorers only "
                             "(no collapse/match/after/serial report)")
    manifest = _cached_manifest(index_dir, part)
    n_docs = manifest["metrics"]["n_docs"]
    avg_dl = manifest["metrics"].get("avg_dl") or (
        manifest["metrics"]["total_tokens"] / max(1, n_docs)
    )
    total_tokens = float(manifest["metrics"].get("total_tokens") or avg_dl * n_docs)
    filt = parse_query(query, use_stopwords=use_stopwords,
                       analyzer=_analyzer_name(index_dir))
    if synonyms:
        from .filters import expand_synonyms

        filt = expand_synonyms(filt, synonyms,
                               analyzer=_analyzer_name(index_dir))
    if _has_phrase(filt) and not _index_has_positions(index_dir):
        raise ValueError(
            'phrase queries ("...") need an index built with positions=True '
            "(the positional occurrence streams are opt-in)"
        )
    specs: list[tuple[str, str]] = []
    _collect_term_specs(filt, specs)
    if constraint is not None:
        _collect_term_specs(constraint, specs)
    src = PostingSource(index_dir, part, specs, max_wild)

    from .segments import read_tombstones

    removed = read_tombstones(index_dir, part)
    if (
        prune
        and scoring in ("ref_tfidf", "bm25")
        and constraint is None
        and time_range is None
        and authz is None
        and len(removed) == 0
        and k > 0
        and min_score is None
        and after is None
        and collapse is None  # group reps may rank below the global top-k
        and group_by is None
    ):
        from .wand import conjunctive_terms, disjunctive_terms, wand_topk

        mode = "or"
        occ = disjunctive_terms(filt)
        if occ is None:
            occ = conjunctive_terms(filt)
            mode = "and"
        if occ is not None:
            # block-max pruned path (exact; rank-identical by construction)
            counts: dict[tuple[str, str], int] = {}
            for key in occ:
                counts[key] = counts.get(key, 0) + 1
            fwd = forward_columns(index_dir, part)
            docs_w, scores_w, found, _pruned = wand_topk(
                src, counts, k, scoring, n_docs, avg_dl, fwd["dl"], mode=mode
            )
            if len(docs_w) > k:
                # selection before the exact sort (argpartition + widen to
                # ties) — the flat-gated path returns the whole scored
                # domain, and lexsorting it all costs more than selection
                part_idx = np.argpartition(scores_w, len(scores_w) - k)[len(scores_w) - k:]
                kth = scores_w[part_idx].min()
                cand = np.flatnonzero(scores_w >= kth)
            else:
                cand = np.arange(len(docs_w))
            order = cand[np.lexsort((-docs_w[cand], -scores_w[cand]))[:k]]
            sel_docs, sel_scores = docs_w[order], scores_w[order]
            ts_top = fwd["ts"][sel_docs]
            final = np.lexsort((-ts_top, -sel_scores))
            return _gather(fwd, part, sel_docs[final], sel_scores[final], found)

    collector: dict[tuple[str, str], int] = {}
    answer = eval_filter_np(filt, src, n_docs, collector)
    if len(removed) and len(answer):
        # index mask: universe minus the removal index (buildIndexMask,
        # MiruBitmapsRoaring.java:492-503)
        answer = np.setdiff1d(answer, removed, assume_unique=True)
    if constraint is not None:
        answer = np.intersect1d(
            answer, eval_filter_np(constraint, src, n_docs, None), assume_unique=True
        )
    if authz is not None and len(answer):
        # authz mask ANDed in after constraints, before the time range —
        # the askLocal mask order (FullTextCustomQuestion.java:105-111)
        answer = np.intersect1d(
            answer, authz_mask(index_dir, part, authz, n_docs), assume_unique=True
        )
    fwd = forward_columns(index_dir, part)
    if time_range is not None and len(answer):
        lo, hi = time_range
        ts_a = fwd["ts"][answer]
        answer = answer[(ts_a >= lo) & (ts_a <= hi)]
    found = int(len(answer))

    if scoring == "match":
        # filter-only evaluation: ALL matching docs, doc-ascending, score 0
        # (the reference's filter path without a scorer — the answer bitmap
        # itself, FullTextCustomQuestion.java:89-114 before getActivityScores)
        return _gather(fwd, part, answer, np.zeros(len(answer), np.float32), found)

    if scoring == "time":
        sel = answer
        if after is not None and len(sel):
            keep = _after_mask(
                part, sel, np.zeros(len(sel), np.float32), fwd["ts"][sel], after
            )
            sel = sel[keep]
        if group_by is not None:
            gkey, gkeys, gm = group_by
            pos, gvals = _group_pick(
                sel, np.zeros(len(sel), np.float32), fwd, gkey, gkeys, gm
            )
            res = _gather(fwd, part, sel[pos], np.zeros(len(pos), np.float32), found)
            res["group"] = gvals
            return res
        if collapse is not None and len(sel):
            sel = sel[_collapse_pick(sel, np.zeros(len(sel), np.float32), fwd, collapse)]
        top = sel[-k:][::-1] if k > 0 else sel[:0]
        scores = np.zeros(len(top), dtype=np.float32)
        return _gather(fwd, part, top, scores, found)

    # multipliers in sorted term order (deterministic fp32 accumulation)
    scores = np.zeros(len(answer), dtype=np.float32)
    dl_answer = None
    lmd_qlen = 0
    for (field, term), c in sorted(collector.items()):
        if scoring == "ref_tfidf":
            g = src.ttf.get((field, term), 0)
            if g <= 0:
                continue
            m = F32(F32(c) / F32(g))
        elif scoring == "bm25":
            df = src.df.get((field, term), 0)
            if df <= 0 or c <= 0:
                continue
            idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            m = F32(F32(c) * F32(idf))
        elif scoring == "lmd":
            # Dirichlet-smoothed query likelihood (Zhai & Lafferty 2004),
            # rank-equivalent sum form: c·ln(1 + tf·T/(μ·ttf)) per term,
            # plus one dl-dependent prior term after the loop. Terms absent
            # from the partition dictionary contribute nothing (and are
            # excluded from the prior's query length, mirroring the fp64
            # oracle chain).
            g = src.ttf.get((field, term), 0)
            if g <= 0 or c <= 0:
                continue
            lmd_qlen += c
            m = F32(c)
        else:
            raise ValueError(scoring)
        docs = src.docs(field, term)
        pos = np.searchsorted(answer, docs)
        valid = (pos < len(answer)) & (answer[np.minimum(pos, len(answer) - 1)] == docs) if len(answer) else np.zeros(0, bool)
        pos = pos[valid]
        tf_i = src.tf_at(field, term, np.flatnonzero(valid))
        tf_v = tf_i.astype(np.float32)
        if scoring == "ref_tfidf":
            scores[pos] += F32(m) * tf_v
        elif scoring == "lmd":
            g = src.ttf[(field, term)]
            scores[pos] += F32(m) * np.log(
                1.0 + (tf_i.astype(np.float64) * total_tokens) / (LMD_MU * g)
            ).astype(np.float32)
        else:
            if dl_answer is None:
                dl_answer = fwd["dl"][answer].astype(np.float64)
            denom = (tf_i + BM25_K1 * (1.0 - BM25_B + BM25_B * dl_answer[pos] / avg_dl)).astype(np.float32)
            scores[pos] += F32(m) * (tf_v / denom)
    if scoring == "lmd" and len(answer):
        if dl_answer is None:
            dl_answer = fwd["dl"][answer].astype(np.float64)
        scores += F32(lmd_qlen) * np.log(LMD_MU / (dl_answer + LMD_MU)).astype(np.float32)

    if min_score is not None and len(answer):
        # serial-report admission (FullText.java:134-141 batchTfIdf): docs
        # scoring > lastReport.lowestScore always enter the queue; docs at
        # or below it are admitted in docId (iterator) order only while the
        # acceptableBelowMin budget (desired - alreadyScoredCount) lasts
        above = scores > np.float32(min_score)
        admit = above.copy()
        budget = max(0, int(below_min))
        if budget:
            admit[np.flatnonzero(~above)[:budget]] = True
        answer = answer[admit]
        scores = scores[admit]

    if after is not None and len(answer):
        keep = _after_mask(part, answer, scores, fwd["ts"][answer], after)
        answer = answer[keep]
        scores = scores[keep]

    if group_by is not None:
        gkey, gkeys, gm = group_by
        pos, gvals = _group_pick(answer, scores, fwd, gkey, gkeys, gm)
        res = _gather(fwd, part, answer[pos], scores[pos], found)
        res["group"] = gvals
        return res

    if collapse is not None and len(answer):
        keep = _collapse_pick(answer, scores, fwd, collapse)
        answer = answer[keep]
        scores = scores[keep]

    if k <= 0 or len(answer) == 0:
        return _gather(fwd, part, answer[:0], scores[:0], found)
    # top-k by (score desc, docId desc); answer is doc-ascending so lexsort
    # with -answer secondary gives the heap's tie-break (RawBitScore)
    if len(answer) > k:
        part_idx = np.argpartition(scores, len(scores) - k)[len(scores) - k :]
        # argpartition boundary can split equal scores arbitrarily — widen to
        # all docs with score >= kth value, then exact-sort
        kth = scores[part_idx].min()
        cand = np.flatnonzero(scores >= kth)
    else:
        cand = np.arange(len(answer))
    order = np.lexsort((-answer[cand], -scores[cand]))[:k]
    sel = cand[order]
    # answer ordering: (score desc, ts desc) — ActivityScore.compareTo
    top_docs = answer[sel]
    top_scores = scores[sel]
    ts_top = fwd["ts"][top_docs]
    final = np.lexsort((-ts_top, -top_scores))
    return _gather(fwd, part, top_docs[final], top_scores[final], found)


def _group_pick(answer: np.ndarray, scores: np.ndarray, fwd: dict,
                key: str, keys: tuple, m: int) -> tuple[np.ndarray, list]:
    """Positions (into ``answer``) of each selected key's top-m docs by
    (score desc, docId desc — zero scores degenerate to newest-first), plus
    the key value per kept row. One gather + dictionary encode + lexsort +
    run-rank; no per-row Python."""
    import pyarrow as pa
    import pyarrow.compute as pc

    col = fwd[key].take(pa.array(answer))
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    mask = pc.is_in(col, value_set=pa.array(list(keys))).to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(mask)
    if len(idx) == 0:
        return idx, []
    enc = col.take(pa.array(idx)).dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((-answer[idx], -scores[idx], codes))
    c = codes[order]
    starts = np.flatnonzero(np.concatenate([[True], c[1:] != c[:-1]]))
    rank = np.arange(len(c)) - np.repeat(starts, np.diff(np.append(starts, len(c))))
    sel = order[rank < m]
    pos = idx[sel]
    return pos, col.take(pa.array(pos)).to_pylist()


def _collapse_pick(answer: np.ndarray, scores: np.ndarray, fwd: dict,
                   key: str) -> np.ndarray:
    """Ascending index subset keeping the best doc per collapse-key value:
    (score desc, docId desc) — the in-heap tie-break, which under TIME's
    all-zero scores degenerates to the newest doc. One vectorized gather +
    dictionary encode + lexsort; no per-row Python."""
    import pyarrow as pa

    col = fwd[key].take(pa.array(answer))
    codes = col.dictionary_encode()
    if isinstance(codes, pa.ChunkedArray):
        codes = codes.combine_chunks()
    codes = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((-answer, -scores, codes))
    first = np.concatenate([[True], codes[order][1:] != codes[order][:-1]])
    return np.sort(order[first])


def _gather(fwd: dict, part: int, docs: np.ndarray, scores: np.ndarray, found: int) -> dict:
    docs = np.asarray(docs, dtype=np.int64)
    take = docs if len(docs) else np.empty(0, np.int64)
    import pyarrow as pa

    idx = pa.array(take)
    return {
        "part": part,
        "found": found,
        "doc_id": docs.astype(np.int64),
        "score": np.asarray(scores, dtype=np.float32),
        "ts": fwd["ts"][take] if len(take) else np.empty(0, np.int64),
        "conv_id": fwd["conv_id"].take(idx).to_pylist() if len(take) else [],
        "turn_idx": fwd["turn_idx"][take] if len(take) else np.empty(0, np.int32),
        "role": fwd["role"].take(idx).to_pylist() if len(take) else [],
    }


def _export_match_partition(index_dir: str, query: str, out_dir: str,
                            time_range, authz, use_stopwords: bool,
                            part: int) -> dict:
    """One partition of export_match: match → forward gather → one parquet
    file, atomic and idempotent (present file == done)."""
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as _pq

    path = _os.path.join(out_dir, f"part-{part:05d}.parquet")
    if _os.path.exists(path):
        return {"part": part, "rows": _pq.read_metadata(path).num_rows,
                "skipped": True}
    r = search_partition(
        index_dir, part, query, k=0, scoring="match", time_range=time_range,
        authz=authz, use_stopwords=use_stopwords,
    )
    fwd = forward_columns(index_dir, part)
    docs = np.asarray(r["doc_id"], dtype=np.int64)
    idx = pa.array(docs)
    out = pa.table(
        {
            "part": pa.array(np.full(len(docs), part, dtype=np.int32)),
            "doc_id": pa.array(docs),
            "conv_id": fwd["conv_id"].take(idx),
            "turn_idx": pa.array(np.asarray(fwd["turn_idx"])[docs], pa.int32()),
            "role": fwd["role"].take(idx),
            "tool": fwd["tool"].take(idx),
            "ts": pa.array(np.asarray(fwd["ts"])[docs], pa.int64()),
        }
    )
    tmp = path + ".tmp"
    _pq.write_table(out, tmp)
    _os.replace(tmp, path)
    return {"part": part, "rows": out.num_rows, "skipped": False}


# ----------------------------------------------------------------- the engine


def _merge_two(merged: list[Hit], cur: list[Hit], k: int) -> list[Hit]:
    """FullTextAnswerMerger.merge two-pointer (ties → current)."""
    out: list[Hit] = []
    i = j = 0
    while (i < len(merged) or j < len(cur)) and len(out) < k:
        if i >= len(merged):
            out.append(cur[j]); j += 1
        elif j >= len(cur):
            out.append(merged[i]); i += 1
        elif _sort_key(merged[i]) < _sort_key(cur[j]):
            out.append(merged[i]); i += 1
        else:
            out.append(cur[j]); j += 1
    return out


def _merge_collapse_two(merged: list[Hit], cur: list[Hit], k: int, key: str) -> list[Hit]:
    """The ordered two-pointer merge with collapse-key dedup: the
    better-ordered occurrence of a key wins and later ones are skipped
    without consuming k. Each input list carries its partitions' per-key
    BEST rep (search_partition collapses first), so the survivor of a
    cross-partition dup is the key's global best — and a key outside one
    partition's top-k is dominated there by k distinct better keys, so the
    merged top-k-distinct-keys answer is exact."""
    out: list[Hit] = []
    seen: set = set()
    i = j = 0
    while (i < len(merged) or j < len(cur)) and len(out) < k:
        if i >= len(merged):
            h = cur[j]; j += 1
        elif j >= len(cur):
            h = merged[i]; i += 1
        elif _sort_key(merged[i]) < _sort_key(cur[j]):
            h = merged[i]; i += 1
        else:
            h = cur[j]; j += 1
        kv = getattr(h, key)
        if kv in seen:
            continue
        seen.add(kv)
        out.append(h)
    return out


class PartitionSearcher:
    """Ray actor owning a fixed slice of partitions — the reference's
    reader-node partition context (MiruLocalHostedPartition): forward
    tables, manifests and hot postings stay resident in the actor between
    queries. One call answers all owned partitions serially (they are few);
    actors run in parallel."""

    def __init__(self, index_dir: str, parts: list[int]):
        self.index_dir = index_dir
        self.parts = list(parts)
        from .segments import forward_columns

        for p in self.parts:  # warm forward + manifest
            _cached_manifest(index_dir, p)
            forward_columns(index_dir, p)

    def search_many(self, kwargs: dict) -> list[dict]:
        return [search_partition(self.index_dir, p, **kwargs) for p in self.parts]

    def search_parts(self, parts: list[int], kwargs: dict) -> list[dict]:
        """Answer only the named owned partitions (zone-pruned queries and
        TIME early-exit waves)."""
        return [search_partition(self.index_dir, p, **kwargs) for p in parts]


def _hits_of(r: dict) -> list[Hit]:
    return [
        Hit(
            score=float(r["score"][i]),
            ts=int(r["ts"][i]),
            doc_id=int(r["doc_id"][i]),
            part=r["part"],
            conv_id=r["conv_id"][i],
            turn_idx=int(r["turn_idx"][i]),
            role=r["role"][i],
        )
        for i in range(len(r["doc_id"]))
    ]


class SearchEngine:
    """Query API over a built index. The scatter-gather driver: one task per
    partition (Ray tasks when Ray is up, serial otherwise), ordered merge.
    The reference analogue is Miru.askAndMerge (MiruService.java:101-194).

    ``use_actors=True`` starts a partition-pinned actor pool (reader-node
    pattern): segment state stays resident across queries, cutting repeat
    latency ~10×. Actors are created lazily on the first query.

    Partition pruning: every partition manifest records a ts zone map
    (``ts_min``/``ts_max``). Queries with a ``time_range`` skip partitions
    whose zone misses the range (sound under ANY partitioning — a pruned
    partition contributes no in-range doc). TIME-scored queries
    additionally short-circuit the newest→oldest walk once k hits are in
    hand and every remaining partition's ts_max is strictly older than the
    kth hit — the reference's answer-evaluator early exit
    (FullTextAnswerEvaluator.java:18-35), sound here because the check is
    against the zone maps, not an assumed partition order; with hash
    partitioning the zones overlap and the walk degrades to asking all
    partitions, with range partitioning it stops after the first wave.
    ``last_parts_asked`` exposes how many partitions the last search hit."""

    def __init__(self, index_dir: str, use_actors: bool = False, n_actors: int | None = None,
                 replicas: list[str] | None = None, race: bool = True):
        from collections import deque

        from .segments import _fire_lifecycle

        self.index_dir = index_dir
        self.meta = read_global_manifest(index_dir)
        _check_tokenizer_compat(self.meta, index_dir)
        self.parts = sorted(completed_parts(index_dir), reverse=True)  # newest→oldest
        # replica failover (the MiruLowestLatencySolver.java:50-205 analogue,
        # failure-triggered instead of latency-raced): byte-verified replica
        # dirs (sync.sync_index) answer a partition when the primary's task
        # raises. With replicas configured, the expected part set comes from
        # the manifest too, so a partition whose DIRECTORY vanished from the
        # primary is still asked (and failed over) rather than silently
        # dropped from the answer.
        self.replicas = list(replicas or [])
        if self.replicas:
            # expected parts = the build's + every extend epoch's (range
            # rollover can open partitions parts_built never saw), MINUS
            # every partition the expire history aged out — expire leaves
            # parts_built untouched, so without the subtraction a replica
            # that still holds an expired partition would resurrect its
            # aged-out docs (retention violation), and a replica that
            # doesn't would fail the whole query (ADVICE r4)
            expected = set(self.meta.get("parts_built", []))
            epochs = self.meta.get("epochs", [])
            for e in epochs:
                expected.update(e.get("parts_updated", []))
            for x in self.meta.get("expired", []):
                dead = set(x.get("parts", []))
                # a partition an epoch re-opened AFTER this expiry ran is
                # live again — only subtract parts not touched since
                # (after_epoch = the epoch count at expiry time)
                cut = x.get("after_epoch")
                if cut is not None:
                    for e in epochs[cut:]:
                        dead.difference_update(e.get("parts_updated", []))
                expected.difference_update(dead)
            self.parts = sorted(set(self.parts) | expected, reverse=True)
        # replica RACING (MiruLowestLatencySolver.java:50-205): when the
        # primary's ask for a partition runs past the suggested timeout —
        # a high percentile of recently observed ask latencies — the same
        # question is fired at a replica and the first answer wins.
        # Failover (re-ask on failure) is always on; racing additionally
        # bounds tail latency on a congested primary. No suggestion exists
        # until enough samples accumulate, so cold engines never race.
        self.race = bool(race)
        self._lat: "deque[float]" = deque(maxlen=256)
        self.use_actors = use_actors
        self.n_actors = n_actors
        self._actors: list | None = None
        self._actor_parts: list[list[int]] = []
        self._actor_of: dict[int, int] = {}
        self.last_parts_asked = 0
        _fire_lifecycle("open", index_dir)  # IndexOpenCallback analogue

    def _ts_bounds(self, part: int) -> tuple[int, int] | None:
        """(ts_min, ts_max) from the partition manifest zone map, or None
        for indexes built before the zone map existed (no pruning then) —
        or whose manifest is unreadable on the primary (a vanished
        partition dir): the partition then stays active and fails over to
        a replica at ask time instead of crashing the prune walk."""
        m = _cached_manifest(self.index_dir, part)
        if m is None:
            for rep in self.replicas:
                m = _cached_manifest(rep, part)
                if m is not None:
                    break
        if m is None:
            return None
        met = m.get("metrics", {})
        if met.get("ts_min") is None or met.get("ts_max") is None:
            return None
        return int(met["ts_min"]), int(met["ts_max"])

    def _active_parts(self, time_range: tuple[int, int] | None) -> list[int]:
        if time_range is None:
            return self.parts
        lo, hi = time_range
        out = []
        for p in self.parts:
            b = self._ts_bounds(p)
            if b is None or (b[0] <= hi and b[1] >= lo):
                out.append(p)
        return out

    def close(self) -> None:
        """Release query actors and fire the close lifecycle callbacks
        (IndexCloseCallback analogue)."""
        from .segments import _fire_lifecycle

        if self._actors:
            import ray

            for a in self._actors:
                ray.kill(a)
            self._actors = None
        _fire_lifecycle("close", self.index_dir)

    def _ensure_actors(self):
        if self._actors is not None:
            return
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
        # leave headroom for the driver on big boxes; never request more
        # actors than CPUs (pending actors on a saturated box would hang
        # the all-actor fan-out)
        n = self.n_actors or min(len(self.parts), max(1, cpus - 2) if cpus > 2 else cpus)
        cls = ray.remote(num_cpus=1)(PartitionSearcher)
        self._actor_parts = [self.parts[i::n] for i in range(n)]
        self._actor_parts = [p for p in self._actor_parts if p]
        self._actors = [
            cls.remote(self.index_dir, parts) for parts in self._actor_parts
        ]
        self._actor_of = {
            p: i for i, parts in enumerate(self._actor_parts) for p in parts
        }

    def search(
        self,
        query: str,
        k: int = 10,
        scoring: str = "ref_tfidf",
        time_range: tuple[int, int] | None = None,
        constraint: Filter | None = None,
        max_wild: int = DEFAULT_MAX_WILDCARD_EXPANSION,
        parallel: bool | None = None,
        prune: bool = True,
        authz: tuple[str, list[str]] | None = None,
        early_exit: bool = True,
        after: "Hit | tuple[float, int, int, int] | None" = None,
        synonyms: dict[str, list[str]] | None = None,
        collapse: str | None = None,
    ) -> tuple[list[Hit], int]:
        """``collapse`` — field collapsing (one best hit per distinct
        ``conv_id`` or ``role`` value; see search_partition). Exact across
        partitions: partitions return per-key bests, the merge dedups keys
        keeping the better-ordered occurrence. ``found`` stays uncollapsed.

        ``early_exit`` (TIME scoring only): stop the newest→oldest walk
        once the zone maps prove no remaining partition can contribute —
        the reference's evaluator short-circuit. Like the reference's,
        the returned ``found`` then counts only the partitions actually
        asked; pass early_exit=False for an exhaustive ``found``.

        ``after`` — deep-pagination cursor (Lucene searchAfter): the last
        Hit of the previous page (or its (score, ts, part, doc_id) tuple);
        the returned page holds the k answers strictly after it in the
        answer order. ``found`` still reports the full match count."""
        use_stop = bool(self.meta.get("tokenizer", {}).get("stopwords"))
        if authz is not None:
            authz = (authz[0], tuple(authz[1]))
        if isinstance(after, Hit):
            after = (after.score, after.ts, after.part, after.doc_id)
        kwargs = dict(
            query=query, k=k, scoring=scoring, time_range=time_range,
            constraint=constraint, max_wild=max_wild, use_stopwords=use_stop,
            prune=prune, authz=authz, after=after, synonyms=synonyms,
            collapse=collapse,
        )
        active = self._active_parts(time_range)
        if scoring == "time" and k > 0 and len(active) > 1 and early_exit:
            return self._time_walk(kwargs, parallel, active, k)
        self.last_parts_asked = len(active)
        results = self._fan_out(kwargs, parallel, parts=active)
        merged: list[Hit] = []
        found = 0
        first = True
        for r in results:  # already in partition walk order
            hits = _hits_of(r)
            found += r["found"]
            if first:
                merged = hits[:k]
                first = False
            elif collapse is not None:
                merged = _merge_collapse_two(merged, hits, k, collapse)
            else:
                merged = _merge_two(merged, hits, k)
        return merged, found

    def _time_walk(
        self, kwargs: dict, parallel: bool | None, active: list[int], k: int
    ) -> tuple[list[Hit], int]:
        """Newest→oldest TIME walk in parallel waves with zone-map early
        exit (FullTextAnswerEvaluator.java:18-35 isDone). Stop condition is
        strict (kth ts > every remaining ts_max): an equal-ts doc in an
        older partition could still displace a hit under the merge's
        tie-to-current rule, so ties keep walking. ``found`` counts only
        the partitions actually asked — the reference's short-circuited
        evaluator reports the same way."""
        # suffix max of ts_max over the walk order; unknown bounds = +inf
        # (those partitions can never be skipped past)
        INF = (1 << 63) - 1
        bmax = [
            (self._ts_bounds(p) or (0, INF))[1] for p in active
        ]
        rest_max = [0] * len(active)
        run = -INF
        for i in range(len(active) - 1, -1, -1):
            rest_max[i] = run
            run = max(run, bmax[i])
        wave = max(1, self._wave_width(parallel, len(active)))
        # collapse keeps the exit sound: remaining partitions' hits have
        # strictly older ts, so they can neither enter the top-k nor win a
        # key dedup against a kept (newer) rep
        collapse = kwargs.get("collapse")
        merged: list[Hit] = []
        found = 0
        first = True
        asked = 0
        for w0 in range(0, len(active), wave):
            chunk = active[w0 : w0 + wave]
            for r in self._fan_out(kwargs, parallel, parts=chunk):
                hits = _hits_of(r)
                found += r["found"]
                if first:
                    merged = hits[:k]
                    first = False
                elif collapse is not None:
                    merged = _merge_collapse_two(merged, hits, k, collapse)
                else:
                    merged = _merge_two(merged, hits, k)
            asked += len(chunk)
            last = w0 + len(chunk) - 1
            if len(merged) >= k and merged[k - 1].ts > rest_max[last]:
                break
        self.last_parts_asked = asked
        return merged, found

    def _wave_width(self, parallel: bool | None, n_active: int) -> int:
        """Parallelism of one early-exit wave: all workers busy, but no
        bigger — a full fan-out would defeat the exit."""
        try:
            import ray

            use_ray = ray.is_initialized() if parallel is None else parallel
        except ImportError:
            use_ray = False
        if not use_ray:
            return 1
        if self.use_actors and n_active > 1:
            self._ensure_actors()
            return max(1, len(self._actors or []))
        import ray

        return max(1, int(ray.cluster_resources().get("CPU", 8)) - 2)

    def search_serial(
        self,
        query: str,
        k: int = 10,
        scoring: str = "ref_tfidf",
        time_range: tuple[int, int] | None = None,
        constraint: Filter | None = None,
        max_wild: int = DEFAULT_MAX_WILDCARD_EXPANSION,
        authz: tuple[str, list[str]] | None = None,
    ) -> tuple[list[Hit], int]:
        """The reference's SERIAL solver mode with report carry-forward
        (MiruSolver non-parallel path; FullTextCustomQuestion.createReport
        :128-143 → FullText.collectTfIdf :114-135): partitions are asked
        one at a time newest→oldest; each ask after the first carries the
        running answer's report (scoredActivities, lowestScore), and the
        partition admits candidates scoring at or below lowestScore only
        while the acceptableBelowMin budget (desired − alreadyScored)
        lasts. Cheaper per partition than the parallel fan-out (older
        partitions prune their scored sets against the carried threshold)
        at the cost of latency; the answer can legitimately differ from
        the parallel mode below the kth score — the reference makes the
        same trade (fulltext registers the parallel question by default,
        MiruService.java:410-414)."""
        if scoring not in ("ref_tfidf", "bm25"):
            raise ValueError("serial report mode applies to relevance scorers")
        use_stop = bool(self.meta.get("tokenizer", {}).get("stopwords"))
        if authz is not None:
            authz = (authz[0], tuple(authz[1]))
        base = dict(
            query=query, k=k, scoring=scoring, time_range=time_range,
            constraint=constraint, max_wild=max_wild, use_stopwords=use_stop,
            authz=authz,
        )
        active = self._active_parts(time_range)
        self.last_parts_asked = len(active)
        merged: list[Hit] = []
        found = 0
        report: tuple[int, float] | None = None  # (scoredActivities, lowestScore)
        for p in active:
            kw = dict(base)
            if report is not None:
                kw["min_score"] = report[1]
                kw["below_min"] = max(0, k - report[0])
            r = self._ask_serial(p, kw)
            hits = _hits_of(r)
            found += r["found"]
            merged = hits[:k] if report is None else _merge_two(merged, hits, k)
            report = (
                len(merged),
                min((h.score for h in merged), default=float("inf")),
            )
        return merged, found

    def count(
        self,
        query: str,
        time_range: tuple[int, int] | None = None,
        constraint: Filter | None = None,
        authz: tuple[str, list[str]] | None = None,
        parallel: bool | None = None,
    ) -> int:
        """Match count without gathering any rows (Lucene
        IndexSearcher.count): the k=0 TIME path evaluates the filter +
        masks per partition and returns only ``found`` — no scoring, no
        forward gather, no tf decode (the lazy-tf postings never touch tf
        bytes on this path)."""
        return self.search(
            query, k=0, scoring="time", time_range=time_range,
            constraint=constraint, authz=authz, parallel=parallel,
            early_exit=False,
        )[1]

    def group_topk(
        self,
        query: str,
        n_groups: int = 5,
        per_group: int = 3,
        key: str = "role",
        scoring: str = "ref_tfidf",
        time_range: tuple[int, int] | None = None,
        constraint: Filter | None = None,
        max_wild: int = DEFAULT_MAX_WILDCARD_EXPANSION,
        parallel: bool | None = None,
        authz: tuple[str, list[str]] | None = None,
    ) -> tuple[list[tuple[str, list[Hit]]], int]:
        """Two-pass grouped top-k (Lucene grouping / Solr group=true / ES
        top_hits): the top ``n_groups`` key values each with their top
        ``per_group`` hits. Pass 1 selects the group keys via the collapse
        machinery (exact across partitions); pass 2 broadcasts the selected
        keys in the query plan and every partition returns its per-key top
        ``per_group`` docs, merged per key by the ordered two-pointer rule
        — the classic distributed top-k argument applied within each key,
        so the per-group lists are exact too. A single-pass grouped fan-out
        cannot be exact: a key outside one partition's local group ranking
        may still own globally ranked docs there, which is why Solr/ES
        distributed grouping use the same two round trips. Returns
        ([(key_value, [Hit...]) in group rank order], uncollapsed found)."""
        if authz is not None:
            authz = (authz[0], tuple(authz[1]))
        reps, found = self.search(
            query, k=n_groups, scoring=scoring, time_range=time_range,
            constraint=constraint, max_wild=max_wild, parallel=parallel,
            authz=authz, collapse=key, early_exit=False,
        )
        key_order = [getattr(h, key) for h in reps]
        if not key_order:
            return [], found
        use_stop = bool(self.meta.get("tokenizer", {}).get("stopwords"))
        kwargs = dict(
            query=query, k=per_group, scoring=scoring, time_range=time_range,
            constraint=constraint, max_wild=max_wild, use_stopwords=use_stop,
            authz=authz, group_by=(key, tuple(key_order), per_group),
        )
        active = self._active_parts(time_range)
        per_key: dict[str, list[Hit]] = {kv: [] for kv in key_order}
        for r in self._fan_out(kwargs, parallel, parts=active):
            hits = _hits_of(r)
            by: dict[str, list[Hit]] = {}
            for g, h in zip(r["group"], hits):
                by.setdefault(g, []).append(h)
            for kv, lst in by.items():
                cur = per_key.get(kv)
                if cur is None:
                    continue
                per_key[kv] = lst[:per_group] if not cur else _merge_two(cur, lst, per_group)
        return [(kv, per_key[kv]) for kv in key_order], found

    def match(
        self,
        query: str,
        time_range: tuple[int, int] | None = None,
        constraint: Filter | None = None,
        max_wild: int = DEFAULT_MAX_WILDCARD_EXPANSION,
        parallel: bool | None = None,
        authz: tuple[str, list[str]] | None = None,
        synonyms: dict[str, list[str]] | None = None,
    ) -> list[dict]:
        """Filter-only evaluation: every matching doc from every partition
        (no top-k, no scores). Returns the raw per-partition result dicts."""
        use_stop = bool(self.meta.get("tokenizer", {}).get("stopwords"))
        if authz is not None:
            authz = (authz[0], tuple(authz[1]))
        kwargs = dict(
            query=query, k=0, scoring="match", time_range=time_range,
            constraint=constraint, max_wild=max_wild, use_stopwords=use_stop,
            authz=authz, synonyms=synonyms,
        )
        active = self._active_parts(time_range)
        self.last_parts_asked = len(active)
        return self._fan_out(kwargs, parallel, parts=active)

    def export_match(
        self,
        query: str,
        out_dir: str,
        time_range: tuple[int, int] | None = None,
        authz: tuple[str, list[str]] | None = None,
        parallel: bool | None = None,
    ) -> dict:
        """Materialize a filter query's FULL answer as partitioned parquet
        — the corpus-extraction sink ("every turn matching Q" → a dataset
        a training pipeline joins back to the raw text by (conv_id,
        turn_idx); raw text itself never left the input files, by the
        build's own design). One file per index partition, written
        atomically (tmp+rename) and SKIPPED when already present — a
        failed export resumes where it stopped, never rewrites finished
        partitions. Columns: part, doc_id, conv_id, turn_idx, role, tool,
        ts.

        Resume is gated on a ``_EXPORT.json`` marker recording the exact
        (query, time_range, authz) the dir holds — re-exporting a DIFFERENT
        question into the same dir raises instead of silently serving the
        old answer under the new name."""
        import json as _json
        import os as _os

        _os.makedirs(out_dir, exist_ok=True)
        use_stop = bool(self.meta.get("tokenizer", {}).get("stopwords"))
        if authz is not None:
            authz = (authz[0], tuple(authz[1]))
        spec = {"query": query,
                "time_range": list(time_range) if time_range else None,
                "authz": [authz[0], list(authz[1])] if authz else None}
        marker = _os.path.join(out_dir, "_EXPORT.json")
        if _os.path.exists(marker):
            with open(marker) as f:
                prev = _json.load(f)
            if prev != spec:
                raise ValueError(
                    f"{out_dir} holds the export of {prev!r}; refusing to "
                    f"resume it as {spec!r} — use a fresh out_dir"
                )
        else:
            tmp = marker + ".tmp"
            with open(tmp, "w") as f:
                _json.dump(spec, f)
            _os.replace(tmp, marker)
        active = self._active_parts(time_range)
        args = (self.index_dir, query, out_dir, time_range, authz, use_stop)
        try:
            import ray

            use_ray = ray.is_initialized() if parallel is None else parallel
        except ImportError:
            use_ray = False
        if use_ray and len(active) > 1:
            import ray

            fn = _REMOTE_FNS.get(_export_match_partition)
            if fn is None:
                fn = ray.remote(num_cpus=1)(_export_match_partition)
                _REMOTE_FNS[_export_match_partition] = fn
            results = ray.get([fn.remote(*args, p) for p in active])
        else:
            results = [_export_match_partition(*args, p) for p in active]
        return {
            "out_dir": out_dir,
            "files": len(results),
            "rows": sum(r["rows"] for r in results),
            "skipped": sorted(r["part"] for r in results if r["skipped"]),
        }

    def stats(self) -> dict:
        """Index inspection (the reference's ops/inspection endpoints —
        reader inspect UIs, MiruManage): global build config + totals +
        per-partition metrics, all from manifests (no posting reads)."""
        per_part = {
            p: dict(_cached_manifest(self.index_dir, p).get("metrics", {}))
            for p in self.parts
        }
        return {
            "n_parts": len(self.parts),
            "partitioning": self.meta.get("partitioning"),
            "codec": self.meta.get("codec", "varbyte"),
            "positions": bool(self.meta.get("positions")),
            "analyzer": (self.meta.get("tokenizer") or {}).get("analyzer", "default"),
            "n_epochs": len(self.meta.get("epochs", [])),
            "totals": dict(self.meta.get("totals", {})),
            "per_part": per_part,
        }

    def explain(self, query: str, scoring: str = "ref_tfidf",
                part: int | None = None,
                max_wild: int = DEFAULT_MAX_WILDCARD_EXPANSION) -> dict:
        """Query debugging (Lucene IndexSearcher.explain spirit): the parsed
        spec list, each spec's expansion on one partition (newest by
        default), per-term posting stats (df, Σtf, block count, lazy-tf),
        and which execution strategy the gate would choose."""
        from .wand import conjunctive_terms, disjunctive_terms

        p = self.parts[0] if part is None else part
        use_stop = bool(self.meta.get("tokenizer", {}).get("stopwords"))
        filt = parse_query(query, use_stopwords=use_stop,
                           analyzer=_analyzer_name(self.index_dir))
        specs: list[tuple[str, str]] = []
        _collect_term_specs(filt, specs)
        src = PostingSource(self.index_dir, p, specs, max_wild)
        terms: dict[str, dict] = {}
        for field, v in specs:
            for t in src.expand(field, v):
                blocks = src.blocks.get((field, t))
                post = src.post.get((field, t))
                terms[f"{field}:{t}"] = {
                    "df": src.df.get((field, t), 0),
                    "ttf": src.ttf.get((field, t), 0),
                    "n_blocks": len(blocks["first"]) if blocks else 0,
                    "lazy_tf": bool(post is not None and post[1] is None),
                }
        occ, mode = disjunctive_terms(filt), "or"
        if occ is None:
            occ, mode = conjunctive_terms(filt), "and"
        wand_ok = occ is not None and scoring in ("ref_tfidf", "bm25")
        return {
            "part": p,
            "query": query,
            "scoring": scoring,
            "strategy": f"block-max-wand-{mode}" if wand_ok else "full-eval",
            "has_phrase": _has_phrase(filt),
            "expansions": {
                f"{f}:{v}": list(ts) for (f, v), ts in src.expansions.items()
            },
            "terms": terms,
        }

    def suggest(
        self, term: str, k: int = 5, max_dist: int = 2, field: str = "text"
    ) -> list[tuple[str, int, int]]:
        """Did-you-mean spell correction (Lucene DirectSpellChecker
        analogue): dictionary terms within Levenshtein distance
        ``max_dist`` of the analyzed ``term``, ranked by (global df desc,
        distance asc, term asc) — Lucene's docFreq-then-score order.
        Expansion reuses the per-partition fuzzy machinery (the epoch-keyed
        expansion cache + vectorized DP); df sums across partitions, so
        the rank reflects the whole corpus. The exact term itself (distance
        0) is included when indexed — callers drop it for pure correction.
        Interactive API: partitions are read serially; the df read is a
        metadata-only pushdown (term + df columns — posting BYTES are
        never touched: a 2M-doc candidate posting costs the same as a
        2-doc one)."""
        from .analyzers import get_analyzer
        from .filters import levenshtein

        # analyze with the INDEX's analyzer (Lucene DirectSpellChecker
        # analyzes the input): on a stemmed index the dictionary holds
        # stems, so the probe must be the stem too
        toks = get_analyzer(_analyzer_name(self.index_dir)).scalar(term)
        if not toks:
            return []
        body = toks[-1]
        if not 1 <= max_dist <= 2:
            raise ValueError("max_dist must be 1 or 2 (LevenshteinAutomata cap)")
        df = self._global_dfs(field, f"{body}~{max_dist}")
        ranked = sorted(
            ((t, n, levenshtein(t, body)) for t, n in df.items()),
            key=lambda x: (-x[1], x[2], x[0]),
        )
        return ranked[:k]

    def suggest_prefix(
        self, prefix: str, k: int = 10, field: str = "text"
    ) -> list[tuple[str, int]]:
        """Autocomplete (Lucene TermsComponent / prefix TermsEnum
        analogue): dictionary terms starting with ``prefix``, ranked by
        (global df desc, term asc). Same interactive-path discipline as
        ``suggest``: the per-(partition, epoch) expansion cache feeds a
        metadata-only df pushdown — posting bytes are never read."""
        from .tokenize import py_tokenize

        toks = py_tokenize(prefix)
        if not toks:
            return []
        df = self._global_dfs(field, toks[-1] + "*")
        return sorted(df.items(), key=lambda x: (-x[1], x[0]))[:k]

    def _global_dfs(self, field: str, spec: str) -> dict[str, int]:
        """Corpus-level df per dictionary term matching ``spec``: the
        epoch-cached expansion + the term+df-only pushdown read, df summed
        across partitions (shared by suggest / suggest_prefix)."""
        from .segments import read_term_dfs

        def one(d: str, part: int) -> dict:
            epoch = _manifest_epoch(d, part)
            terms = expand_spec(d, part, epoch, field, spec)
            return read_term_dfs(d, part, [field + FIELD_SEP + t for t in terms])

        df: dict[str, int] = {}
        sep_len = len(field) + 1
        for part in self.parts:
            try:
                dfs = one(self.index_dir, part)
            except Exception:  # noqa: BLE001 — replica failover (suggest path)
                if not self.replicas:
                    raise
                dfs = None
                last = None
                for rep in self.replicas:
                    try:
                        dfs = one(rep, part)
                        break
                    except Exception as e:  # noqa: BLE001
                        last = e
                if dfs is None:
                    raise last
            for key, n in dfs.items():
                t = key[sep_len:]
                df[t] = df.get(t, 0) + n
        return df

    def _replica_answer(self, p: int, kwargs: dict, cause: Exception) -> dict:
        """Re-ask partition ``p`` on each replica dir in order (the
        reference races replicas for latency, MiruLowestLatencySolver;
        here replicas answer on primary FAILURE — same availability
        contract, no duplicate work on the common path)."""
        last: Exception = cause
        for rep in self.replicas:
            try:
                return search_partition(rep, p, **kwargs)
            except Exception as e:  # noqa: BLE001 — try the next replica
                last = e
        raise last

    def _ask_serial(self, p: int, kwargs: dict) -> dict:
        import time as _time

        t0 = _time.monotonic()
        try:
            if not self.replicas:
                return search_partition(self.index_dir, p, **kwargs)
            try:
                return search_partition(self.index_dir, p, **kwargs)
            except Exception as e:  # noqa: BLE001
                return self._replica_answer(p, kwargs, e)
        finally:
            self._lat.append(_time.monotonic() - t0)

    def _suggested_timeout(self) -> float | None:
        """The racing trigger (MiruLowestLatencySolver.java:84-193): 3×
        the p95 of recently observed per-partition ask latencies, floored
        at 50 ms; None (no racing) until 16 samples exist — a cold engine
        has no basis for declaring the primary slow. Samples are serial
        asks and each gather's FIRST completion (the closest observable
        to one ask's true latency — later completions include queue wait
        behind the worker pool and would inflate the trigger until it
        never fired)."""
        if not self.race or len(self._lat) < 16:
            return None
        arr = sorted(self._lat)
        return max(3.0 * arr[min(len(arr) - 1, int(0.95 * len(arr)))], 0.05)

    def _gather_raced(self, parts: list[int], futs: list, kwargs: dict) -> list[dict]:
        """Collect primary partition futures; racing triggers as a STALL
        detector — when no completion arrives for a suggested-timeout
        interval, the stragglers are RACED against the replicas (same
        question fired at each replica dir, first successful answer wins,
        losers cancelled best-effort). The stall form keeps a fan-out
        wider than the worker pool from racing merely-queued partitions:
        while completions keep flowing the clock resets. A primary that
        fails outright still takes the failover path."""
        import time as _time

        import ray

        timeout = self._suggested_timeout()
        t0 = _time.monotonic()
        by_fut = {f: p for f, p in zip(futs, parts)}
        results: dict[int, dict] = {}
        pending = list(futs)
        first_done = False
        deadline = None if timeout is None else t0 + timeout
        while pending:
            remain = None if deadline is None else max(0.0, deadline - _time.monotonic())
            done, pending = ray.wait(pending, num_returns=1, timeout=remain)
            if not done:
                break  # stalled for a full suggested timeout — race
            now = _time.monotonic()
            if not first_done:
                first_done = True
                self._lat.append(now - t0)
            if deadline is not None:
                deadline = now + timeout  # completion arrived: reset the stall clock
            p = by_fut[done[0]]
            try:
                results[p] = ray.get(done[0])
            except Exception as e:  # noqa: BLE001
                results[p] = self._replica_answer(p, kwargs, e)
        if pending:
            fn = _remote_search_partition()
            for fut in pending:
                p = by_fut[fut]
                racing = [fut] + [fn.remote(rep, p, **kwargs) for rep in self.replicas]
                res, last = None, None
                while racing and res is None:
                    done, racing = ray.wait(racing, num_returns=1)
                    try:
                        res = ray.get(done[0])
                    except Exception as e:  # noqa: BLE001
                        last = e
                if res is None:
                    raise last
                for f in racing:  # best-effort: stop the losers
                    try:
                        ray.cancel(f, force=False)
                    except Exception:  # noqa: BLE001
                        pass
                results[p] = res
        return [results[p] for p in parts]

    def _fan_out(
        self, kwargs: dict, parallel: bool | None, parts: list[int] | None = None
    ) -> list[dict]:
        parts = self.parts if parts is None else parts
        try:
            import ray

            use_ray = ray.is_initialized() if parallel is None else parallel
        except ImportError:
            use_ray = False
        if use_ray and self.use_actors and len(self.parts) > 1:
            import ray

            self._ensure_actors()
            if len(parts) == len(self.parts):
                futs = [a.search_many.remote(kwargs) for a in self._actors]
                futs_parts = list(self._actor_parts)
            else:
                # subset fan-out (zone-pruned / early-exit wave): each
                # owning actor answers only its slice of the subset
                by_actor: dict[int, list[int]] = {}
                for p in parts:
                    by_actor.setdefault(self._actor_of[p], []).append(p)
                futs = [
                    self._actors[i].search_parts.remote(ps, kwargs)
                    for i, ps in by_actor.items()
                ]
                futs_parts = list(by_actor.values())
            by_part: dict[int, dict] = {}
            for fut, fparts in zip(futs, futs_parts):
                try:
                    res = ray.get(fut)
                except Exception as e:  # noqa: BLE001 — failed actor slice
                    if not self.replicas:
                        raise
                    res = [self._replica_answer(p, kwargs, e) for p in fparts]
                for r in res:
                    by_part[r["part"]] = r
            return [by_part[p] for p in parts]
        if use_ray and len(parts) > 1:
            import ray

            fn = _remote_search_partition()
            futs = [fn.remote(self.index_dir, p, **kwargs) for p in parts]
            if not self.replicas:
                return ray.get(futs)
            return self._gather_raced(parts, futs, kwargs)
        return [self._ask_serial(p, kwargs) for p in parts]


_REMOTE = None


def _remote_search_partition():
    global _REMOTE
    if _REMOTE is None:
        import ray

        _REMOTE = ray.remote(num_cpus=1)(search_partition)
    return _REMOTE

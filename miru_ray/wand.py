"""Block-max pruned top-k for disjunctive AND conjunctive queries (exact).

The north-star query engine prunes with block-max metadata (the per-block
``(first_doc, count, max_tf, min_dl)`` recorded by the codec — the same
role as the reference's per-posting ``lastId`` header and the block-max
WAND family, Ding & Suel 2011). This implementation is a *block-max
sweep*, vectorized instead of pointer-chasing:

1. per term, an upper bound for each posting block (max_tf, and for BM25
   min_dl — tf/(tf+K) is increasing in tf and decreasing in dl);
2. a boundary sweep over all blocks of all query terms yields docId
   segments with a total upper bound Σ_t ub_t(segment) and a coverage
   count (how many terms have a block over the segment);
3. segments are visited in descending upper-bound order; docs inside are
   scored EXACTLY (same fp32 term-sorted accumulation as the full scorer —
   identical float results, hence identical ranks); the sweep stops when
   the running k-th score (tie-break: docId desc) is ≥ every remaining
   segment's bound.

Conjunctive (AND) mode: a matching doc must appear in EVERY term, so only
segments with full coverage are live — everything else is skipped without
looking at a single docId — and candidates inside a live segment are the
per-segment intersection.

Exactness: any unscored doc lies in a segment with bound < kth score (or,
for AND, in a segment some term does not cover at all), so it cannot
displace the top k; bounds carry fp32-rounding headroom so adversarial
ties cannot slip past (see the epsilon note below).

Lazy tf: posting docIds decode once (the set algebra needs them), but tf
bytes of large postings decode per TOUCHED BLOCK only during scoring
(codec.decode_tf_range via PostingSource.tf_at) — the partial-decode
scale path for hot terms; search.DECODE_STATS reports the realized byte
savings.

``found`` (the reference's answer cardinality) is semantically the full
match count, so it is computed over the full docId sets (union /
intersection) regardless of pruning.
"""

from __future__ import annotations

import numpy as np

from .filters import Filter

F32 = np.float32
BM25_K1 = 1.2
BM25_B = 0.75


def _plain_leaf_values(f: Filter) -> list[tuple[str, str]] | None:
    """The (field, value) occurrences of a leaf AND filter with one plain
    (non-wildcard, non-range) field filter; None otherwise."""
    from .filters import RANGE_RE, fuzzy_value, regexp_value

    if f.inclusive or f.sub_filters or len(f.field_filters) != 1:
        return None
    ff = f.field_filters[0]
    if any(v.endswith("*") or RANGE_RE.match(v) or fuzzy_value(v) is not None
           or regexp_value(v) is not None for v in ff.values):
        return None
    return [(ff.field, v) for v in ff.values]


def disjunctive_terms(filt: Filter) -> list[tuple[str, str]] | None:
    """If ``filt`` is a pure positive disjunction (OR of plain terms, a
    single term, or one multi-value field filter — no NOT, no nesting
    beyond OR, no inclusive mask, no wildcards/ranges), return its
    (field, value) occurrence list (duplicates preserved: the signed
    collector counts them). Otherwise None."""
    if filt.op == "and" and not filt.sub_filters and not filt.inclusive:
        if len(filt.field_filters) != 1:
            return None
        return _plain_leaf_values(filt)
    if filt.op == "or" and not filt.inclusive and not filt.field_filters:
        out: list[tuple[str, str]] = []
        for sub in filt.sub_filters:
            if sub.op != "and":
                return None
            vals = _plain_leaf_values(sub)
            if vals is None:
                return None
            out.extend(vals)
        return out
    return None


def conjunctive_terms(filt: Filter) -> list[tuple[str, str]] | None:
    """If ``filt`` is a pure positive conjunction of plain single terms
    (AND of leaves, each one field filter with ONE value — multi-value
    field filters are OR-within-field and belong to the disjunctive path),
    return the (field, value) occurrences. Otherwise None."""
    if filt.op != "and" or filt.inclusive or filt.field_filters:
        return None
    if len(filt.sub_filters) < 2:
        return None
    out: list[tuple[str, str]] = []
    for sub in filt.sub_filters:
        if sub.op != "and":
            return None
        vals = _plain_leaf_values(sub)
        if vals is None or len(vals) != 1:
            return None
        out.extend(vals)
    return out


def wand_topk(
    src,
    term_counts: dict[tuple[str, str], int],
    k: int,
    scoring: str,
    n_docs: int,
    avg_dl: float,
    dl_arr: np.ndarray,
    mode: str = "or",
):
    """Exact pruned top-k over the union (``mode="or"``) or intersection
    (``mode="and"``) of the terms' postings.

    Returns (answer_docs_scored: int64[], scores: float32[], found: int,
    pruned_frac: float). Scores/tie-breaks are bit-identical to the full
    scorer's (same fp32 ops in the same sorted-term order).
    """
    terms = []
    for (field, term), c in sorted(term_counts.items()):
        p = src.post.get((field, term))
        if p is None:
            if mode == "and":
                # a missing term empties the whole conjunction
                return np.empty(0, np.int64), np.empty(0, np.float32), 0, 0.0
            continue
        docs = p[0]
        if mode == "and" and len(docs) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float32), 0, 0.0
        if scoring == "ref_tfidf":
            g = src.ttf.get((field, term), 0)
            if g <= 0:
                continue
            m = F32(F32(c) / F32(g))
        else:
            df = src.df.get((field, term), 0)
            if df <= 0 or c <= 0:
                continue
            idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            m = F32(F32(c) * F32(idf))
        blocks = src.blocks.get((field, term))
        terms.append(((field, term), m, docs, blocks))
    if not terms:
        return np.empty(0, np.int64), np.empty(0, np.float32), 0, 0.0

    if mode == "and":
        inter = terms[0][2]
        for t in terms[1:]:
            if len(inter) == 0:
                break
            inter = np.intersect1d(inter, t[2], assume_unique=True)
        found = int(len(inter))
        domain = inter
    else:
        union = np.unique(np.concatenate([t[2] for t in terms]))
        found = int(len(union))
        domain = union
    if found == 0:
        return np.empty(0, np.int64), np.empty(0, np.float32), 0, 0.0
    if found <= max(k, 256) * 4:
        # tiny domains: pruning overhead exceeds the scoring it saves
        scores = _score_exact(src, terms, domain, scoring, avg_dl, dl_arr)
        return domain, scores, found, 0.0

    # per-block upper bounds and [start, end) intervals
    starts_all, ends_all, ubs_all = [], [], []
    for _key, m, docs, blk in terms:
        first = blk["first"].astype(np.int64)
        ends = np.empty(len(first), dtype=np.int64)
        ends[:-1] = first[1:]
        ends[-1] = docs[-1] + 1
        max_tf = blk["max_tf"].astype(np.float64)
        if scoring == "ref_tfidf":
            ub = np.float64(m) * max_tf
        else:
            knorm = BM25_K1 * (1.0 - BM25_B + BM25_B * blk["min_dl"].astype(np.float64) / avg_dl)
            ub = np.float64(m) * (max_tf / (max_tf + knorm))
        starts_all.append(first)
        ends_all.append(ends)
        ubs_all.append(ub)
    # flatness gate: block-max pruning only pays when the bound landscape
    # has skew (some blocks promise much more than typical ones). On flat
    # corpora the sweep visits everything anyway and its machinery is pure
    # overhead — score the whole domain in one vectorized pass instead.
    tot_max = sum(float(u.max()) for u in ubs_all)
    tot_med = sum(float(np.median(u)) for u in ubs_all)
    if tot_max <= 2.0 * tot_med:
        scores = _score_exact(src, terms, domain, scoring, avg_dl, dl_arr)
        return domain, scores, found, 0.0

    starts = np.concatenate(starts_all)
    ends = np.concatenate(ends_all)
    ubs = np.concatenate(ubs_all)

    # sweep: boundary points; segment bound = Σ of covering blocks' ubs,
    # coverage = # of terms with a block over the segment
    bounds = np.unique(np.concatenate([starts, ends]))
    seg_ub = np.zeros(len(bounds), dtype=np.float64)
    seg_cov = np.zeros(len(bounds), dtype=np.int64)
    s_idx = np.searchsorted(bounds, starts)
    e_idx = np.searchsorted(bounds, ends)
    np.add.at(seg_ub, s_idx, ubs)
    np.add.at(seg_ub, e_idx, -ubs)
    np.add.at(seg_cov, s_idx, 1)
    np.add.at(seg_cov, e_idx, -1)
    seg_ub = np.cumsum(seg_ub)[:-1]  # bound over [bounds[i], bounds[i+1])
    seg_cov = np.cumsum(seg_cov)[:-1]
    seg_lo = bounds[:-1]
    seg_hi = bounds[1:]
    if mode == "and":
        # a matching doc needs every term: segments without full coverage
        # are dead — skipped without touching any docId
        live = seg_cov == len(terms)
    else:
        live = seg_ub > 0
    seg_lo, seg_hi, seg_ub = seg_lo[live], seg_hi[live], seg_ub[live]
    if len(seg_ub) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float32), found, 1.0
    # The exact scorer accumulates in fp32 while bounds are fp64: fp32
    # round-up can exceed the fp64 bound by a few ulps per term, letting a
    # "pruned" doc tie the kth score and win the docId-desc tie-break. Add
    # relative headroom scaled by term count (+ denormal floor) so pruning
    # stays strictly conservative.
    seg_ub = seg_ub * (1.0 + 4.0 * len(terms) * np.finfo(np.float32).eps) + 1e-30

    order = np.argsort(-seg_ub, kind="stable")
    seg_lo, seg_hi, seg_ub = seg_lo[order], seg_hi[order], seg_ub[order]

    top_docs = np.empty(0, np.int64)
    top_scores = np.empty(0, np.float32)
    threshold = -np.inf
    scored = 0
    i = 0
    batch = max(64, k)
    while i < len(seg_ub):
        if seg_ub[i] < threshold:
            break
        j = min(len(seg_ub), i + batch)
        sel = slice(i, j)
        lo_b, hi_b = seg_lo[sel], seg_hi[sel]
        if mode == "and":
            # candidates: the precomputed intersection restricted to the
            # batch's segments
            a = np.searchsorted(domain, lo_b)
            b = np.searchsorted(domain, hi_b)
            cand_parts = [domain[s:e] for s, e in zip(a, b) if e > s]
            cand = np.concatenate(cand_parts) if cand_parts else np.empty(0, np.int64)
            cand = np.unique(cand)
        else:
            cand_parts = []
            for _key, _m, docs, _blk in terms:
                a = np.searchsorted(docs, lo_b)
                b = np.searchsorted(docs, hi_b)
                for s, e in zip(a, b):
                    if e > s:
                        cand_parts.append(docs[s:e])
            cand = np.unique(np.concatenate(cand_parts)) if cand_parts else np.empty(0, np.int64)
        if len(cand):
            scored += len(cand)
            sc = _score_exact(src, terms, cand, scoring, avg_dl, dl_arr)
            top_docs = np.concatenate([top_docs, cand])
            top_scores = np.concatenate([top_scores, sc])
            if len(top_docs) > k:
                keep = np.lexsort((-top_docs, -top_scores))[:k]
                top_docs, top_scores = top_docs[keep], top_scores[keep]
            if len(top_docs) == k:
                threshold = float(top_scores.min())
        i = j
        batch = min(4096, batch * 2)
    pruned = 1.0 - scored / max(1, found)
    return top_docs, top_scores, found, pruned


def _score_exact(src, terms, answer: np.ndarray, scoring: str, avg_dl: float, dl_arr: np.ndarray) -> np.ndarray:
    """The full scorer's exact fp32 arithmetic restricted to ``answer``
    (sorted). Mirrors search.search_partition's accumulation bit-for-bit;
    tf values come through PostingSource.tf_at (block-partial decode for
    lazy-tf postings)."""
    scores = np.zeros(len(answer), dtype=np.float32)
    dl_answer = None
    for (field, term), m, docs, _blk in terms:
        pos = np.searchsorted(answer, docs)
        valid = (pos < len(answer)) & (answer[np.minimum(pos, len(answer) - 1)] == docs) if len(answer) else np.zeros(0, bool)
        pos = pos[valid]
        tf_i = src.tf_at(field, term, np.flatnonzero(valid))
        tf_v = tf_i.astype(np.float32)
        if scoring == "ref_tfidf":
            scores[pos] += F32(m) * tf_v
        else:
            if dl_answer is None:
                dl_answer = dl_arr[answer].astype(np.float64)
            denom = (
                tf_i + BM25_K1 * (1.0 - BM25_B + BM25_B * dl_answer[pos] / avg_dl)
            ).astype(np.float32)
            scores[pos] += F32(m) * (tf_v / denom)
    return scores

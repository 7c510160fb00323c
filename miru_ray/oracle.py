"""Brute-force pure-Python oracle engine (the pytest ground truth).

An independent, slow, dictionary-based implementation of the complete
reference query contract (SURVEY.md §3.3) used ONLY in tests, mirroring the
reference's semantics directly:

* partition routing + dense docId assignment: ``part = fnv1a64(conv_id) %
  P``; docId = rank within stable ``(conv_id, turn_idx)`` ascending order
  inside the partition (reference: doc ids allocated in stream order,
  miru-service/.../lab/LabTimeIdIndex.java:96);
* filter-tree evaluation with signed term collector
  (MiruAggregateUtil.java:1123-1241): per field filter OR the term doc-sets
  (wildcard values expand over the sorted term range, capped), ``and``
  short-circuits to empty on a fieldFilter with no terms, ``pButNotQ``
  flips the collector sign for operands after the first;
* TF_IDF scoring (FullText.java:99-220): multiplier_t = float32(c_t) /
  float32(Σtf_t^partition); score = Σ float32(multiplier * tf); fp32
  accumulation in sorted-term order; per-partition top-k heap by (score
  desc, docId desc); partition answer sorted (score desc, ts desc);
* TIME strategy (FullText.java:222-251): descending docId, k rows, score 0;
* BM25 mode (our engine's second scoring mode — same machinery, Robertson
  idf with k1/b over per-partition stats);
* cross-partition merge: partitions walked newest→oldest (descending part
  id — allQueryablePartitionsInOrder), two-pointer merge truncated to k
  taking from the running merge iff strictly less by (score desc, ts desc)
  (FullTextAnswerMerger.java:31-68: ties go to the CURRENT partition).

Every partition is queried with an ABSENT report: fulltext always uses the
parallel solver (FullTextAnswerEvaluator.java:38-40) and parallel solutions
are created with ``Optional.absent()`` report (MiruService.java:414), so
minScore = -FLOAT_MAX and the belowMin quota never triggers.
"""

from __future__ import annotations

import heapq
import math
from bisect import bisect_left, bisect_right
from dataclasses import dataclass

import numpy as np

from .filters import DEFAULT_MAX_WILDCARD_EXPANSION, FieldFilter, Filter, parse_query
from .hashing import fnv1a64_str
from .segments import numeric_lex
from .tokenize import py_tokenize

F32 = np.float32
FLOAT_MAX = np.float32(3.4028235e38)

BM25_K1 = 1.2
BM25_B = 0.75
LMD_MU = 1500.0


@dataclass
class OraclePartition:
    part: int
    # stable-ordered rows of this partition
    conv_id: list[str]
    turn_idx: list[int]
    ts: list[int]  # microseconds
    tokens: list[list[str]]  # per-doc token list of the `text` field
    fields: dict[str, list[str]]  # single-term fields: role, tool, conv_id

    def __post_init__(self):
        self.n_docs = len(self.conv_id)
        # postings: field -> term -> {docId: tf}
        self.post: dict[str, dict[str, dict[int, int]]] = {}
        text_post: dict[str, dict[int, int]] = {}
        for i, toks in enumerate(self.tokens):
            for t in toks:
                text_post.setdefault(t, {})[i] = text_post.setdefault(t, {}).get(i, 0) + 1
        self.post["text"] = text_post
        for fname, vals in self.fields.items():
            fp: dict[str, dict[int, int]] = {}
            for i, v in enumerate(vals):
                if v:
                    fp.setdefault(v, {})[i] = 1
            self.post[fname] = fp
        # pairedLatest bundle (MiruIndexPairedLatest.java): field "A^B",
        # term va → one docId per distinct co-occurring vb (the latest)
        for a, b in (("role", "tool"),):
            fa, fb = self.fields.get(a), self.fields.get(b)
            if fa is None or fb is None:
                continue
            latest: dict[tuple, int] = {}
            for i, (x, y) in enumerate(zip(fa, fb)):
                if x and y:
                    latest[(x, y)] = i  # docId order == row order: last wins
            plp: dict[str, dict[int, int]] = {}
            for (x, _y), i in latest.items():
                plp.setdefault(x, {})[i] = 1
            self.post[f"{a}^{b}"] = plp
        # composite fields (MiruSchema.java:32; MiruActivityInternExtern.java
        # :97-146): term = source values joined by \x1e, skipped when any
        # source value is missing
        for cname, sources in (("role_tool", ("role", "tool")),):
            cols = [self.fields.get(s) for s in sources]
            if any(c is None for c in cols):
                continue
            cp: dict[str, dict[int, int]] = {}
            for i, vals in enumerate(zip(*cols)):
                if all(vals):
                    cp.setdefault("\x1e".join(vals), {})[i] = 1
            self.post[cname] = cp
        self.sorted_terms = {f: sorted(p) for f, p in self.post.items()}
        # global Σtf per term (the reference's global cardinality row,
        # LabFieldIndex.java:473-476) and df
        self.ttf = {
            f: {t: sum(d.values()) for t, d in p.items()} for f, p in self.post.items()
        }
        self.df = {f: {t: len(d) for t, d in p.items()} for f, p in self.post.items()}
        self.total_tokens = sum(len(t) for t in self.tokens)
        self.avg_dl = self.total_tokens / self.n_docs if self.n_docs else 0.0
        self.dl = [len(t) for t in self.tokens]


def build_oracle_partitions(rows: list[dict], n_parts: int) -> dict[int, OraclePartition]:
    """rows: dicts with conv_id, turn_idx, role, text, tool, ts(us int)."""
    by_part: dict[int, list[dict]] = {}
    for r in rows:
        p = fnv1a64_str(r["conv_id"]) % n_parts
        by_part.setdefault(p, []).append(r)
    out = {}
    for p, rs in by_part.items():
        rs.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
        out[p] = OraclePartition(
            part=p,
            conv_id=[r["conv_id"] for r in rs],
            turn_idx=[int(r["turn_idx"]) for r in rs],
            ts=[int(r["ts"]) for r in rs],
            tokens=[py_tokenize(r["text"]) for r in rs],
            fields={
                "role": [r["role"] for r in rs],
                "tool": [r.get("tool", "") for r in rs],
                "conv_id": [r["conv_id"] for r in rs],
                # numeric field: lex-encoded terms (range-scannable)
                "turn_idx": [numeric_lex(int(r["turn_idx"])) for r in rs],
            },
        )
    return out


# ---------------------------------------------------------------- filter eval


def _lev(a: str, b: str) -> int:
    """Scalar byte-level Levenshtein — the oracle's own DP, independent of
    the engine's vectorized expansion (search._fuzzy_filter)."""
    xa, xb = a.encode(), b.encode()
    prev = list(range(len(xb) + 1))
    for i, ca in enumerate(xa, 1):
        cur = [i]
        for j, cb in enumerate(xb, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _expand_values(part: OraclePartition, ff: FieldFilter, max_wild: int) -> list[str]:
    import re as _re

    from .filters import fuzzy_value, range_term_bounds, regexp_value

    terms: list[str] = []
    for v in ff.values:
        rx = regexp_value(v)
        if rx is not None:
            pat = _re.compile(rx)  # python re — independent of the engine's RE2
            sel = [t for t in part.sorted_terms.get(ff.field, []) if pat.fullmatch(t)]
            terms.extend(sel[:max_wild] if max_wild > 0 else sel)
            continue
        fz = fuzzy_value(v)
        if fz is not None:
            body, k = fz
            sel = [t for t in part.sorted_terms.get(ff.field, []) if _lev(t, body) <= k]
            terms.extend(sel[:max_wild] if max_wild > 0 else sel)
            continue
        bounds = range_term_bounds(v)
        if bounds is not None:
            b_lo, b_hi, lo_inc, hi_inc = bounds
            st = part.sorted_terms.get(ff.field, [])
            lo = 0 if b_lo is None else (bisect_left if lo_inc else bisect_right)(st, b_lo)
            hi = len(st) if b_hi is None else (bisect_right if hi_inc else bisect_left)(st, b_hi)
            sel = st[lo:hi]
            terms.extend(sel[:max_wild] if max_wild > 0 else sel)
        elif v.endswith("*"):
            prefix = v[:-1]
            st = part.sorted_terms.get(ff.field, [])
            lo = bisect_left(st, prefix)
            hi = bisect_right(st, prefix + "￿")
            count = 0
            for t in st[lo:hi]:
                terms.append(t)
                count += 1
                if max_wild > 0 and count >= max_wild:
                    break
        else:
            terms.append(v)
    return terms


def eval_filter(
    part: OraclePartition,
    filt: Filter,
    collector: dict[tuple[str, str], int] | None,
    term_in: bool = True,
    max_wild: int = DEFAULT_MAX_WILDCARD_EXPANSION,
) -> set[int]:
    """filterInOut (MiruAggregateUtil.java:1123-1202), over python sets.
    The extra ``phrase`` op (beyond-reference) is a consecutive-subsequence
    scan over the per-doc token lists."""
    if filt.op == "phrase":
        ff = filt.field_filters[0]
        toks = ff.values
        if collector is not None:
            for t in toks:
                key = (ff.field, t)
                collector[key] = collector.get(key, 0) + (1 if term_in else -1)
        if ff.field != "text":
            # matches the engine: meta fields have no positional streams
            raise ValueError("phrase queries are supported on the 'text' field only")
        win = filt.slop + 1
        out: set[int] = set()
        if not filt.ordered:
            # unordered two-term near (`"a b"~~N`), mirroring
            # search._eval_phrase: a doc matches when some occurrence pair
            # satisfies 1 <= |pos_a - pos_b| <= slop+1; a same-term pair
            # needs two DISTINCT occurrences (a != b covers both rules).
            ta, tb = toks[0], toks[1]
            for i, seq in enumerate(part.tokens):
                pa = [j for j, x in enumerate(seq) if x == ta]
                pb = [j for j, x in enumerate(seq) if x == tb]
                if any(a != b and abs(a - b) <= win for a in pa for b in pb):
                    out.add(i)
            return out
        for i, seq in enumerate(part.tokens):
            state = [j for j, x in enumerate(seq) if x == toks[0]]
            for t in toks[1:]:
                prev = state
                state = [
                    j for j, x in enumerate(seq)
                    if x == t and any(j - win <= q < j for q in prev)
                ]
                if not state:
                    break
            if state:
                out.add(i)
        return out
    operands: list[set[int]] = []
    universe = set(range(part.n_docs))
    if filt.inclusive:
        operands.append(set(universe))
    for ff in filt.field_filters:
        field_term_in = (
            (not term_in) if (filt.op == "pButNotQ" and operands) else term_in
        )
        terms = _expand_values(part, ff, max_wild)
        for t in terms:
            if collector is not None:
                key = (ff.field, t)
                collector[key] = collector.get(key, 0) + (1 if field_term_in else -1)
        if filt.op == "and" and not terms:
            return set()
        if terms:
            s: set[int] = set()
            for t in terms:
                s |= set(part.post.get(ff.field, {}).get(t, {}))
            operands.append(s)
    for sub in filt.sub_filters:
        sub_term_in = (not term_in) if (filt.op == "pButNotQ" and operands) else term_in
        operands.append(eval_filter(part, sub, collector, sub_term_in, max_wild))
    if filt.op == "and":
        if not operands:
            return set()
        r = operands[0]
        for o in operands[1:]:
            r = r & o
        return r
    if filt.op == "or":
        r: set[int] = set()
        for o in operands:
            r = r | o
        return r
    if filt.op == "pButNotQ":
        if not operands:
            return set()
        r = operands[0]
        for o in operands[1:]:
            r = r - o
        return r
    raise ValueError(filt.op)


# ---------------------------------------------------------------- scoring


@dataclass
class Hit:
    score: float  # fp32 value
    ts: int
    doc_id: int
    part: int
    conv_id: str
    turn_idx: int


def _sort_key(h: Hit):
    # ActivityScore.compareTo: score desc, timestamp desc (FullTextAnswer.java:80-89)
    return (-F32(h.score), -h.ts)


def score_partition(
    part: OraclePartition,
    query: str,
    k: int,
    scoring: str = "ref_tfidf",
    time_range: tuple[int, int] | None = None,
    constraint: Filter | None = None,
    max_wild: int = DEFAULT_MAX_WILDCARD_EXPANSION,
    removed: set[int] | None = None,
    authz: tuple[str, tuple[str, ...]] | None = None,
) -> tuple[list[Hit], int]:
    """One partition's answer (FullTextCustomQuestion.askLocal +
    FullText.collectTfIdf), with absent report. Returns (hits, found)."""
    filt = parse_query(query)
    collector: dict[tuple[str, str], int] = {}
    answer = eval_filter(part, filt, collector, True, max_wild)
    if removed:
        # index mask = universe minus the removal index (buildIndexMask);
        # term stats are NOT decremented by REMOVE (reference behavior)
        answer -= removed
    if constraint is not None:
        answer &= eval_filter(part, constraint, None, True, max_wild)
    if authz is not None:
        allowed: set[int] = set()
        for v in authz[1]:
            allowed |= set(part.post.get(authz[0], {}).get(v, {}))
        answer &= allowed
    if time_range is not None:
        lo, hi = time_range
        # buildTimeRangeMask: inclusive [smallest, largest] over the time index
        answer &= {i for i in answer if lo <= part.ts[i] <= hi}
    found = len(answer)

    if scoring == "time":
        hits = []
        for i in sorted(answer, reverse=True)[:k]:
            hits.append(
                Hit(0.0, part.ts[i], i, part.part, part.conv_id[i], part.turn_idx[i])
            )
        return hits, found

    # multipliers (FullText.java:118-127); terms sorted for deterministic
    # fp32 accumulation (the reference's HashMap order is unspecified —
    # SURVEY.md §7.4(1))
    mult: list[tuple[str, str, np.float32]] = []
    n = part.n_docs
    lmd_qlen = 0
    for (field, term), c in sorted(collector.items()):
        if scoring == "ref_tfidf":
            g = part.ttf.get(field, {}).get(term, 0)
            if g > 0:
                mult.append((field, term, F32(F32(c) / F32(g))))
        elif scoring == "bm25":
            df = part.df.get(field, {}).get(term, 0)
            if df > 0 and c > 0:
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                mult.append((field, term, F32(F32(c) * F32(idf))))
        elif scoring == "lmd":
            # Dirichlet query likelihood: c·ln(1 + tf·T/(μ·ttf)) per term
            # plus one |q|·ln(μ/(dl+μ)) prior after the loop (terms absent
            # from the partition dictionary contribute to neither)
            g = part.ttf.get(field, {}).get(term, 0)
            if g > 0 and c > 0:
                lmd_qlen += c
                mult.append((field, term, F32(c)))
        else:
            raise ValueError(scoring)

    scores: dict[int, np.float32] = {i: F32(0.0) for i in answer}
    for field, term, m in mult:
        post = part.post.get(field, {}).get(term, {})
        for i in answer:
            tf = post.get(i, 0)
            if tf > 0:
                if scoring == "ref_tfidf":
                    scores[i] = F32(scores[i] + F32(m * F32(tf)))
                elif scoring == "lmd":
                    g = part.ttf[field][term]
                    log32 = F32(
                        math.log(1.0 + (float(tf) * float(part.total_tokens)) / (LMD_MU * g))
                    )
                    scores[i] = F32(scores[i] + F32(m * log32))
                else:
                    denom = F32(
                        tf + BM25_K1 * (1.0 - BM25_B + BM25_B * part.dl[i] / part.avg_dl)
                    )
                    scores[i] = F32(scores[i] + F32(m * F32(F32(tf) / denom)))
    if scoring == "lmd":
        q32 = F32(lmd_qlen)
        for i in answer:
            prior = F32(q32 * F32(math.log(LMD_MU / (part.dl[i] + LMD_MU))))
            scores[i] = F32(scores[i] + prior)

    # top-k heap by (score desc, docId desc) (FullText.RawBitScore.compareTo)
    best = heapq.nlargest(k, answer, key=lambda i: (F32(scores[i]), i))
    hits = [
        Hit(float(scores[i]), part.ts[i], i, part.part, part.conv_id[i], part.turn_idx[i])
        for i in best
    ]
    hits.sort(key=_sort_key)
    return hits, found


def merge_partitions(per_part: list[tuple[list[Hit], int]], k: int) -> tuple[list[Hit], int]:
    """FullTextAnswerMerger.merge: two-pointer, take from the running merge
    iff strictly less (ties → current partition); truncate to k; sum found."""
    merged: list[Hit] = []
    found = 0
    first = True
    for hits, f in per_part:
        found += f
        if first:
            merged = list(hits[:k])
            first = False
            continue
        out: list[Hit] = []
        i = j = 0
        while (i < len(merged) or j < len(hits)) and len(out) < k:
            if i >= len(merged):
                out.append(hits[j]); j += 1
            elif j >= len(hits):
                out.append(merged[i]); i += 1
            elif _sort_key(merged[i]) < _sort_key(hits[j]):
                out.append(merged[i]); i += 1
            else:
                out.append(hits[j]); j += 1
        merged = out
    return merged, found


def oracle_search(
    parts: dict[int, OraclePartition],
    query: str,
    k: int,
    scoring: str = "ref_tfidf",
    time_range: tuple[int, int] | None = None,
    constraint: Filter | None = None,
    removed: dict[int, set[int]] | None = None,
    authz: tuple[str, tuple[str, ...]] | None = None,
) -> tuple[list[Hit], int]:
    """Full query: all partitions newest→oldest (descending part id), merge."""
    per = [
        score_partition(parts[p], query, k, scoring, time_range, constraint,
                        removed=(removed or {}).get(p), authz=authz)
        for p in sorted(parts, reverse=True)
    ]
    return merge_partitions(per, k)

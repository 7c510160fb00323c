"""Text-analysis pipelines over a document corpus (Ray-Data-native).

Large-scale training-data operations on the ``documents`` table
(doc_id, text, ...): token counting, corpus term statistics, quality
scoring, language identification and winnowing document fingerprints.
Everything is a ``map_batches`` stage over zero-copy Arrow batches with
vectorized pyarrow/numpy kernels; the only shuffle is the (tiny,
pre-aggregated) term-stats groupby.

These extend the reference's surface (the reference has no text-quality /
langid / fingerprint operators — SURVEY.md §2.8 "Near-dup: none in
reference") with the operations a 100 TB training-data pipeline needs;
the term-stats pipeline is the same tokenize→invert→aggregate path as the
index build (MiruIndexPrimaryFields.java:52-92 analogue) expressed as a
standalone aggregate.

Determinism contract: every number here is reproducible in ANSI SQL (see
__ray_entry__.oracle_sql) — divisions are single fp64 ops on exact integer
counts, so Ray and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import fnv1a64, splitmix64
from .tokenize import STOPWORDS, token_counts, tokenize_flat

# language marker token sets — the langid heuristic's contract (deterministic,
# tiny; mirrored literally in the SQL oracle). Order = tie-break priority.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "les", "et", "est", "pas", "une", "dans"),
    "es": ("el", "los", "las", "y", "es", "no", "una", "como"),
}
LANG_ORDER = tuple(LANG_MARKERS)


def _docs_ds(sf_dir: str, columns: list[str]):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _ids(batch: pa.Table) -> pa.Array:
    c = batch["doc_id"]
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


# ------------------------------------------------------------- token counts


def _count_batch(batch: pa.Table) -> pa.Table:
    parents, _ = tokenize_flat(batch["text"])
    n = token_counts(parents, batch.num_rows)
    return pa.table(
        {"doc_id": pc.cast(_ids(batch), pa.int64()), "n_tokens": pa.array(n.astype(np.int64))}
    )


def token_count_ds(sf_dir: str):
    """(doc_id, n_tokens) per document."""
    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        _count_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# BPE-ish piece classes (re2, shared verbatim with the DuckDB oracle):
# letter runs, single digits (GPT-style digit splitting), non-space
# punctuation chars. The subword estimate greedily chops letter runs into
# ≤4-char pieces — count_substring_regex's non-overlapping leftmost matching
# makes count('[a-z]{1,4}') ≡ Σ ceil(run_len/4) with no per-match decode.
BPE_PIECE_RE = "[a-z]+|[0-9]|[^a-z0-9\\s]"
BPE_SUBWORD_RE = "[a-z]{1,4}|[0-9]|[^a-z0-9\\s]"


def _bpe_count_batch(batch: pa.Table) -> pa.Table:
    lower = pc.utf8_lower(batch["text"])
    return pa.table(
        {
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "n_pieces": pc.cast(pc.count_substring_regex(lower, BPE_PIECE_RE), pa.int64()),
            "n_subwords": pc.cast(
                pc.count_substring_regex(lower, BPE_SUBWORD_RE), pa.int64()
            ),
        }
    )


def bpe_token_count_ds(sf_dir: str):
    """(doc_id, n_pieces, n_subwords): BPE-ish tokenizer-cost estimate per
    document — pieces = letter runs + single digits + punctuation chars;
    subwords = the same with letter runs chopped into ≤4-char pieces (a
    deterministic stand-in for a learned BPE vocab's subword count). Pure
    count_substring_regex kernels; no token strings materialize."""
    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        _bpe_count_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# ------------------------------------------------------- deterministic split

# Hash-based sampling/splits: split(doc) is a pure function of doc_id, so
# the assignment is stable under re-runs, re-partitioning and incremental
# appends (a doc never migrates between train and eval as the corpus
# grows) — the property random_sample cannot give. Buckets come from the
# top bits of splitmix64(doc_id); fractions are exact over the 2^20 grid.
_SPLIT_GRID = 1 << 20


def _split_map(batch: pa.Table, bounds: list[tuple[str, int, int]]) -> pa.Table:
    from .hashing import splitmix64

    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    bucket = (splitmix64(ids) >> np.uint64(44)).astype(np.int64)  # 20 bits
    name = np.full(len(ids), "", dtype=object)
    for label, lo, hi in bounds:
        sel = (bucket >= lo) & (bucket < hi)
        name[sel] = label
    return pa.table(
        {
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "bucket": pa.array(bucket),
            "split": pa.array(name.tolist(), pa.string()),
        }
    )


def split_bounds(fractions: dict[str, float]) -> list[tuple[str, int, int]]:
    """[(label, lo, hi)) bucket ranges over the 2^20 grid, in insertion
    order; fractions must sum to ≤ 1 (the remainder is unlabeled → dropped
    — sub-sampling is the fractions-sum-<1 case of the same operator)."""
    total = sum(fractions.values())
    if total > 1 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    out, lo = [], 0
    labels = list(fractions)
    for i, label in enumerate(labels):
        hi = lo + int(round(fractions[label] * _SPLIT_GRID))
        # per-label rounding can leave the top bucket(s) unlabeled even when
        # fractions sum to exactly 1 (e.g. three thirds) — silent data loss.
        # The LAST label absorbs the grid remainder whenever the total is 1.
        if i == len(labels) - 1 and abs(total - 1.0) <= 1e-9:
            hi = _SPLIT_GRID
        out.append((label, lo, hi))
        lo = hi
    return out


def split_ds(sf_dir: str, fractions: dict[str, float] | None = None):
    """(doc_id, bucket, split): deterministic train/val/test assignment (or
    plain sub-sampling when the fractions sum below 1 — unlabeled rows are
    filtered). Pure map_batches; no shuffle, no state."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    bounds = split_bounds(fractions)
    ds = _docs_ds(sf_dir, ["doc_id"]).map_batches(
        lambda b: _split_map(b, bounds), batch_format="pyarrow", zero_copy_batch=True
    )
    return ds.map_batches(
        lambda b: b.filter(pc.not_equal(b["split"], pa.scalar(""))),
        batch_format="pyarrow",
    )


def _strat_partial(batch: pa.Table, by: str, n_per: int, seed: int) -> pa.Table:
    """Per-batch partial for stratified sampling: the ≤ n_per smallest
    (hash, doc_id) rows per stratum present in the batch — the combiner
    that bounds the shuffle at n_per rows per (stratum, batch)."""
    from .hashing import splitmix64

    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    h = splitmix64(ids ^ np.uint64(seed))
    t = pa.table(
        {
            "stratum": pc.cast(batch[by], pa.string()),
            "h": pa.array(h),
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
        }
    )
    idx = pc.sort_indices(
        t, sort_keys=[("stratum", "ascending"), ("h", "ascending"), ("doc_id", "ascending")]
    )
    t = t.take(idx)
    s = t["stratum"].to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.concatenate(([True], s[1:] != s[:-1])))
    rank = np.arange(len(s)) - np.repeat(starts, np.diff(np.append(starts, len(s))))
    return t.filter(pa.array(rank < n_per))


def _strat_top(group: pa.Table, n_per: int) -> pa.Table:
    idx = pc.sort_indices(
        group, sort_keys=[("h", "ascending"), ("doc_id", "ascending")]
    )[:n_per]
    return group.take(idx)


def stratified_sample_ds(sf_dir: str, by: str = "source", n_per: int = 50,
                         seed: int = 0):
    """(doc_id, stratum): exactly min(n_per, |stratum|) docs per stratum,
    chosen as the n_per smallest splitmix64(doc_id ^ seed) — the
    deterministic analogue of per-stratum uniform sampling (the "cap every
    source/language at N docs" curation primitive). Hash-ranked selection
    is stable under re-runs, re-partitioning and corpus growth *within* the
    kept set (a kept doc is only ever displaced by a new smaller-hash doc,
    never reshuffled). Per-batch partials bound the shuffle at n_per rows
    per (stratum, batch); the groupby reduce sees answer-sized input."""
    ds = _docs_ds(sf_dir, ["doc_id", by]).map_batches(
        lambda b: _strat_partial(b, by, n_per, seed),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = ds.groupby("stratum").map_groups(
        lambda g: _strat_top(g, n_per), batch_format="pyarrow"
    )
    return out.select_columns(["doc_id", "stratum"])


def _budget_rows(batch: pa.Table, seed: int, bits: int) -> pa.Table:
    """Fixed-width sampling rows: (source, bucket, h, doc_id, n_tokens).
    bucket = the TOP ``bits`` bits of the doc's splitmix64 draw, so
    (bucket asc, h asc) ≡ global hash order — bucket boundaries can never
    change the selection, only the exchange's group sizes."""
    from .hashing import splitmix64

    ids = pc.cast(_ids(batch), pa.int64()).to_numpy(zero_copy_only=False)
    h = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
    parents, _ = tokenize_flat(batch["text"])
    ntok = token_counts(parents, batch.num_rows).astype(np.int64)
    return pa.table(
        {
            "source": pc.cast(batch["source"], pa.string()),
            "bucket": pa.array((h >> np.uint64(64 - bits)).astype(np.int64)),
            "h": pa.array(h),
            "doc_id": pa.array(ids),
            "n_tokens": pa.array(ntok),
        }
    )


def _budget_bucket_partial(batch: pa.Table, seed: int, bits: int) -> pa.Table:
    rows = _budget_rows(batch, seed, bits)
    idx = pc.sort_indices(rows, sort_keys=[("source", "ascending"), ("bucket", "ascending")])
    rows = rows.take(idx)
    key = rows["source"].to_numpy(zero_copy_only=False)
    bkt = rows["bucket"].to_numpy(zero_copy_only=False)
    new = np.concatenate(([True], (key[1:] != key[:-1]) | (bkt[1:] != bkt[:-1])))
    starts = np.flatnonzero(new)
    tok = rows["n_tokens"].to_numpy(zero_copy_only=False)
    sums = np.add.reduceat(tok, starts)
    return pa.table(
        {
            "source": rows["source"].take(pa.array(starts)),
            "bucket": rows["bucket"].take(pa.array(starts)),
            "n_tokens": pa.array(sums.astype(np.int64)),
        }
    )


def _budget_cut(group: pa.Table, bases: dict, budget: int) -> pa.Table:
    """One (source, bucket) group: within-bucket exclusive prefix in
    (h, doc_id) order + the bucket's broadcast base = the doc's exact
    global tokens-before; keep while it is under the budget (the crossing
    doc is kept — the pack_ds convention)."""
    if group.num_rows == 0:
        return group.drop_columns(["h", "bucket"])
    src = group["source"][0].as_py()
    bkt = int(group["bucket"][0].as_py())
    base = bases.get((src, bkt), 0)
    h = group["h"].to_numpy(zero_copy_only=False)
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    tok = group["n_tokens"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, h))
    before = base + np.concatenate(([0], np.cumsum(tok[order])[:-1]))
    keep_pos = order[before < budget]
    out = group.take(pa.array(np.sort(keep_pos)))
    tb = np.empty(len(order), dtype=np.int64)
    tb[order] = before
    return pa.table(
        {
            "doc_id": out["doc_id"],
            "source": out["source"],
            "n_tokens": out["n_tokens"],
            "tokens_before": pa.array(tb[np.sort(keep_pos)]),
        }
    )


def _epoch_cut(group: pa.Table, bases: dict, totals: dict, budget: int) -> pa.Table:
    """Epoch variant of _budget_cut: the whole source repeats
    ⌊budget/total⌋ times, plus one more for the hash-order prefix covering
    the remainder. Emits (doc_id, source, n_tokens, n_epochs) for docs
    with n_epochs > 0."""
    if group.num_rows == 0:
        return pa.table({
            "doc_id": pa.array([], pa.int64()),
            "source": pa.array([], pa.string()),
            "n_tokens": pa.array([], pa.int64()),
            "n_epochs": pa.array([], pa.int64()),
        })
    src = group["source"][0].as_py()
    bkt = int(group["bucket"][0].as_py())
    total = totals.get(src, 0)
    full = budget // total if total else 0
    rem = budget % total if total else 0
    base = bases.get((src, bkt), 0)
    h = group["h"].to_numpy(zero_copy_only=False)
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    tok = group["n_tokens"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, h))
    before = base + np.concatenate(([0], np.cumsum(tok[order])[:-1]))
    n_epochs = np.full(len(order), full, dtype=np.int64)
    n_epochs[before < rem] += 1
    keep = n_epochs > 0
    pos = order[keep]
    ne = n_epochs[keep]
    back = np.argsort(pos, kind="stable")
    srt = np.sort(pos)
    out = group.take(pa.array(srt))
    return pa.table(
        {
            "doc_id": out["doc_id"],
            "source": out["source"],
            "n_tokens": out["n_tokens"],
            "n_epochs": pa.array(ne[back]),
        }
    )


def token_budget_epochs_ds(sf_dir: str, budget: int = 2000, seed: int = 5,
                           bucket_bits: int = 8):
    """(doc_id, source, n_tokens, n_epochs): epoch-aware token-budget
    mixing — when a source's budget exceeds its total token count, every
    doc repeats ⌊budget/total⌋ times and the deterministic hash-order
    prefix covering the remainder gets one repeat more (how real mixing
    configs over-sample small high-quality sources at >1 epoch). Same
    two-phase bucketed prefix machinery and scale story as
    token_budget_sample_ds; with budget ≤ total it degenerates to that
    selection with n_epochs=1."""
    ds1 = _docs_ds(sf_dir, ["doc_id", "text", "source"]).map_batches(
        lambda b: _budget_bucket_partial(b, seed, bucket_bits),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    sums: dict[tuple[str, int], int] = {}
    for b in ds1.groupby(["source", "bucket"]).sum("n_tokens").iter_batches(
        batch_format="pyarrow"
    ):
        for s, k, n in zip(
            b["source"].to_pylist(), b["bucket"].to_pylist(),
            b["sum(n_tokens)"].to_pylist(),
        ):
            sums[(s, int(k))] = int(n)
    bases: dict[tuple[str, int], int] = {}
    totals: dict[str, int] = {}
    for s in {k[0] for k in sums}:
        run = 0
        for k in sorted(b for (s2, b) in sums if s2 == s):
            bases[(s, k)] = run
            run += sums[(s, k)]
        totals[s] = run
    rows = _docs_ds(sf_dir, ["doc_id", "text", "source"]).map_batches(
        lambda b: _budget_rows(b, seed, bucket_bits),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return rows.groupby(["source", "bucket"]).map_groups(
        lambda g: _epoch_cut(g, bases, totals, budget), batch_format="pyarrow"
    )


def token_budget_sample_ds(sf_dir: str, budget: int = 600, seed: int = 5,
                           bucket_bits: int = 8):
    """(doc_id, source, n_tokens, tokens_before): token-budget corpus
    mixing — for every source, keep documents in deterministic
    splitmix64(doc_id ^ seed) order until the source's cumulative token
    count reaches ``budget`` (the doc crossing the boundary is kept; its
    exclusive prefix is still under budget). This is the data-mixing
    primitive of pre-training runs ("N tokens of source X"), made
    deterministic and exact.

    Scale story (the pack_ds two-phase offset pattern, keyed by hash
    buckets instead of files): pass 1 streams one per-(source, bucket)
    token sum per batch to a tiny groupby (source × 2^bucket_bits rows on
    the driver — bucket = the hash's top bits, so bucket order IS hash
    order and the boundaries cannot affect selection); the driver takes
    exclusive prefixes over buckets; pass 2 exchanges fixed-width sampling
    rows grouped by (source, bucket) — group size is corpus/(sources ×
    buckets), tunable via ``bucket_bits`` — and each group resolves its
    members' exact global tokens-before locally. Nothing text-sized ever
    shuffles; the corpus is read twice (like decontaminate_ds), tokenized
    twice, held nowhere."""
    ds1 = _docs_ds(sf_dir, ["doc_id", "text", "source"]).map_batches(
        lambda b: _budget_bucket_partial(b, seed, bucket_bits),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    sums: dict[tuple[str, int], int] = {}
    for b in ds1.groupby(["source", "bucket"]).sum("n_tokens").iter_batches(
        batch_format="pyarrow"
    ):
        for s, k, n in zip(
            b["source"].to_pylist(), b["bucket"].to_pylist(),
            b["sum(n_tokens)"].to_pylist(),
        ):
            sums[(s, int(k))] = int(n)
    bases: dict[tuple[str, int], int] = {}
    for s in {k[0] for k in sums}:
        run = 0
        for k in sorted(b for (s2, b) in sums if s2 == s):
            bases[(s, k)] = run
            run += sums[(s, k)]
    rows = _docs_ds(sf_dir, ["doc_id", "text", "source"]).map_batches(
        lambda b: _budget_rows(b, seed, bucket_bits),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return rows.groupby(["source", "bucket"]).map_groups(
        lambda g: _budget_cut(g, bases, budget), batch_format="pyarrow"
    )


def _hh_partial(batch: pa.Table, cap: int) -> pa.Table:
    """Per-batch Misra-Gries compression: exact within-batch counts, then
    subtract the (cap+1)-th largest and drop non-positives — ≤ cap counter
    rows leave the batch, and the per-term underestimate across the whole
    corpus is bounded by Σ_b n_b/(cap+1) = N/(cap+1). A reserved ""-term
    row carries the batch's exact token total (no token is empty)."""
    parents, tokens = tokenize_flat(batch["text"])
    n_tok = len(parents)
    if n_tok == 0:
        return pa.table({"term": pa.array([""]), "n": pa.array([0], pa.int64())})
    vc = pc.value_counts(tokens)
    vals, cnt = vc.field("values"), vc.field("counts").to_numpy(zero_copy_only=False)
    if len(cnt) > cap:
        s = np.partition(cnt, -cap - 1)[-cap - 1]
        keep = cnt - s > 0
        vals = vals.filter(pa.array(keep))
        cnt = cnt[keep] - s
    return pa.table(
        {
            "term": pa.concat_arrays([pc.cast(vals, pa.string()).combine_chunks()
                                      if isinstance(vals, pa.ChunkedArray) else
                                      pc.cast(vals, pa.string()), pa.array([""])]),
            "n": pa.array(np.concatenate([cnt.astype(np.int64), [n_tok]])),
        }
    )


def _hh_exact_partial(batch: pa.Table, cand_ref) -> pa.Table:
    import ray

    cand = ray.get(cand_ref)
    parents, tokens = tokenize_flat(batch["text"])
    if len(parents) == 0:
        return pa.table({"term": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    sel = pc.is_in(tokens, value_set=cand)
    vc = pc.value_counts(tokens.filter(sel))
    return pa.table(
        {
            "term": pc.cast(vc.field("values"), pa.string()),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        }
    )


def heavy_hitters_ds(sf_dir: str, frac_num: int = 1, frac_den: int = 100,
                     cap: int = 400) -> pa.Table:
    """(term, count) for every token whose corpus frequency strictly
    exceeds frac_num/frac_den of all tokens — EXACT answers from a
    bounded-memory sketch pipeline (the 100-TB path where a full
    term-stats groupby is unnecessary):

    pass 1 streams ≤ ``cap`` Misra-Gries counter rows per batch to a tiny
    groupby; the merged counters' underestimate is ≤ N/(cap+1), so with
    cap+1 > frac_den/frac_num every true heavy hitter survives as a
    candidate (guaranteed superset — the classic two-pass heavy-hitters
    argument). pass 2 broadcasts the candidate set and counts it exactly.
    The exchanges carry O(cap) rows per batch and O(candidates) total —
    never vocabulary-sized."""
    if cap + 1 <= frac_den / max(1, frac_num):
        raise ValueError("cap must exceed frac_den/frac_num for the superset guarantee")
    import ray

    agg: dict[str, int] = {}
    ds1 = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: _hh_partial(b, cap), batch_format="pyarrow", zero_copy_batch=True,
    )
    for b in ds1.groupby("term").sum("n").iter_batches(batch_format="pyarrow"):
        for t, n in zip(b["term"].to_pylist(), b["sum(n)"].to_pylist()):
            agg[t] = agg.get(t, 0) + int(n)
    total = agg.pop("", 0)
    cand = pa.array(sorted(agg), type=pa.string())
    if len(cand) == 0 or total == 0:
        return pa.table({"term": pa.array([], pa.string()), "count": pa.array([], pa.int64())})
    ref = ray.put(cand)
    exact: dict[str, int] = {}
    ds2 = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: _hh_exact_partial(b, ref), batch_format="pyarrow", zero_copy_batch=True,
    )
    for b in ds2.groupby("term").sum("n").iter_batches(batch_format="pyarrow"):
        for t, n in zip(b["term"].to_pylist(), b["sum(n)"].to_pylist()):
            exact[t] = exact.get(t, 0) + int(n)
    terms = [t for t, n in sorted(exact.items()) if n * frac_den > total * frac_num]
    return pa.table(
        {
            "term": pa.array(terms, type=pa.string()),
            "count": pa.array([exact[t] for t in terms], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------- term stats


def _term_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial aggregate: token stream → (term, df, ttf). The
    combiner that shrinks the shuffle from one row per TOKEN to one row per
    distinct term per batch."""
    parents, tokens = tokenize_flat(batch["text"])
    t = pa.table({"term": tokens, "doc": pa.array(parents)})
    per_doc = t.group_by(["term", "doc"], use_threads=False).aggregate([([], "count_all")])
    agg = per_doc.group_by(["term"], use_threads=False).aggregate(
        [("doc", "count"), ("count_all", "sum")]
    )
    return pa.table(
        {
            "term": pc.cast(agg["term"], pa.string()),
            "df": pc.cast(agg["doc_count"], pa.int64()),
            "ttf": pc.cast(agg["count_all_sum"], pa.int64()),
        }
    )


def term_stats_ds(sf_dir: str):
    """(term, df, ttf) over the whole corpus.

    df is exact because each document lives in exactly one input batch
    (documents are rows, batches never split a row)."""
    from ray.data.aggregate import Sum

    ds = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        _term_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    out = ds.groupby("term").aggregate(Sum("df"), Sum("ttf"))
    return out.map_batches(
        lambda b: b.rename_columns(["term", "df", "ttf"]),
        batch_format="pyarrow",
    )


# ------------------------------------------------------------- quality score


def _quality_batch(batch: pa.Table) -> pa.Table:
    n_rows = batch.num_rows
    parents, tokens = tokenize_flat(batch["text"])
    n_tok = token_counts(parents, n_rows).astype(np.int64)
    tok_len = pc.utf8_length(tokens).to_numpy(zero_copy_only=False).astype(np.int64)
    len_sum = np.zeros(n_rows, dtype=np.int64)
    np.add.at(len_sum, parents, tok_len)
    stop_hit = pc.is_in(tokens, value_set=pa.array(sorted(STOPWORDS))).to_numpy(
        zero_copy_only=False
    )
    stop_sum = np.zeros(n_rows, dtype=np.int64)
    np.add.at(stop_sum, parents, stop_hit.astype(np.int64))
    n_chars = pc.utf8_length(pc.coalesce(batch["text"], "")).to_numpy(zero_copy_only=False).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_len = np.where(n_tok > 0, len_sum / np.maximum(n_tok, 1), 0.0)
        stop_ratio = np.where(n_tok > 0, stop_sum / np.maximum(n_tok, 1), 0.0)
    return pa.table(
        {
            "doc_id": pc.cast(_ids(batch), pa.int64()),
            "n_chars": pa.array(n_chars),
            "n_tokens": pa.array(n_tok),
            "mean_token_len": pa.array(mean_len, type=pa.float64()),
            "stopword_ratio": pa.array(stop_ratio, type=pa.float64()),
        }
    )


def quality_ds(sf_dir: str):
    """(doc_id, n_chars, n_tokens, mean_token_len, stopword_ratio)."""
    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        _quality_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def _wsample_batch(batch: pa.Table, weight: str, scale: float,
                   seed: int) -> pa.Table:
    from .hashing import splitmix64, u64_to_unit

    q = _quality_batch(batch)
    w = q[weight].to_numpy(zero_copy_only=False).astype(np.float64)
    keep_p = np.minimum(1.0, scale * w)
    ids = q["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    u = u64_to_unit(splitmix64(ids ^ np.uint64(seed)))
    keep = u < keep_p
    return pa.table(
        {
            "doc_id": q["doc_id"].filter(pa.array(keep)),
            "keep_p": pa.array(np.round(keep_p[keep], 6), type=pa.float64()),
        }
    )


def weighted_sample_ds(sf_dir: str, weight: str = "stopword_ratio",
                       scale: float = 2.0, seed: int = 0):
    """(doc_id, keep_p): quality-weighted importance resampling — keep a
    doc with probability min(1, scale·weight) where ``weight`` is one of
    the quality_ds signals, decided by the doc's own splitmix64 unit draw
    (DCLM-style quality resampling made deterministic: re-runs, appends
    and re-partitioning never flip a doc's fate). One map_batches pass —
    quality features, the hash draw and the filter fuse; nothing
    shuffles."""
    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: _wsample_batch(b, weight, scale, seed),
        batch_format="pyarrow", zero_copy_batch=True,
    )


# ------------------------------------------------- repetition quality rules


def _ngram_doc_stats(
    parents: np.ndarray, tokens: pa.Array, n_rows: int, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-doc token n-gram stats: (total, distinct, max_count), each an
    int64[n_rows] array. Grams never span doc boundaries. Exact strings
    (dictionary-encoded), not hashes — the SQL oracle mirrors them."""
    total = np.zeros(n_rows, dtype=np.int64)
    dist = np.zeros(n_rows, dtype=np.int64)
    mx = np.zeros(n_rows, dtype=np.int64)
    m = len(parents)
    if m < k:
        return total, dist, mx
    valid = parents[k - 1 :] == parents[: m - k + 1]
    if not valid.any():
        return total, dist, mx
    gram = tokens.slice(0, m - k + 1)
    for i in range(1, k):
        gram = pc.binary_join_element_wise(gram, tokens.slice(i, m - k + 1), " ")
    vmask = pa.array(valid)
    gp = parents[: m - k + 1][valid]
    enc = gram.filter(vmask).dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((codes, gp))
    sg, sc = gp[order], codes[order]
    new = np.concatenate([[True], (sg[1:] != sg[:-1]) | (sc[1:] != sc[:-1])])
    starts = np.flatnonzero(new)
    cnt = np.diff(np.append(starts, len(sg)))
    grp_doc = sg[starts]
    total += np.bincount(gp, minlength=n_rows).astype(np.int64)
    np.add.at(dist, grp_doc, 1)
    np.maximum.at(mx, grp_doc, cnt)
    return total, dist, mx


def _repetition_batch(batch: pa.Table) -> pa.Table:
    n_rows = batch.num_rows
    parents, tokens = tokenize_flat(batch["text"])
    cols = {"doc_id": pc.cast(_ids(batch), pa.int64())}
    for k, name in ((2, "bigram"), (3, "trigram")):
        total, dist, mx = _ngram_doc_stats(parents, tokens, n_rows, k)
        safe = np.maximum(total, 1)
        dup = np.where(total > 0, (total - dist) / safe, 0.0)
        top = np.where(total > 0, mx / safe, 0.0)
        cols[f"n_{name}s"] = pa.array(total)
        cols[f"dup_{name}_frac"] = pa.array(dup, type=pa.float64())
        cols[f"top_{name}_frac"] = pa.array(top, type=pa.float64())
    return pa.table(cols)


def repetition_ds(sf_dir: str):
    """Gopher/MassiveText-style within-doc repetition signals (Rae et al.
    2021 §A1.1 "repetitious text" filters, token-n-gram variant): per doc,
    the fraction of duplicate n-grams and the share of the single most
    frequent n-gram, for n ∈ {2, 3}. A pure per-doc map — no shuffle at any
    scale; real pipelines threshold on these columns to drop loops and
    boilerplate."""
    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        _repetition_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# -------------------------------------------------------------- language id


def _langid_batch(batch: pa.Table) -> pa.Table:
    n_rows = batch.num_rows
    parents, tokens = tokenize_flat(batch["text"])
    hits = np.zeros((n_rows, len(LANG_ORDER)), dtype=np.int64)
    for j, lang in enumerate(LANG_ORDER):
        m = pc.is_in(tokens, value_set=pa.array(list(LANG_MARKERS[lang]))).to_numpy(
            zero_copy_only=False
        )
        np.add.at(hits[:, j], parents, m.astype(np.int64))
    best = np.argmax(hits, axis=1)  # first max wins — LANG_ORDER priority
    maxv = hits[np.arange(n_rows), best]
    pred = np.where(maxv > 0, np.array(LANG_ORDER, dtype=object)[best], "und")
    cols = {"doc_id": pc.cast(_ids(batch), pa.int64())}
    for j, lang in enumerate(LANG_ORDER):
        cols[f"{lang}_hits"] = pa.array(hits[:, j])
    cols["pred_lang"] = pa.array(pred.tolist(), type=pa.string())
    return pa.table(cols)


def langid_ds(sf_dir: str):
    """(doc_id, <lang>_hits..., pred_lang) — marker-token language ID."""
    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        _langid_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# -------------------------------------------------- winnowing fingerprints


def gram_hashes(parents: np.ndarray, tok_hash: np.ndarray, k: int):
    """Rolling hash of token k-grams. Returns (gram_parent, gram_hash) for
    every within-doc window of k consecutive tokens."""
    n = len(tok_hash)
    if n < k:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    h = tok_hash.copy()
    with np.errstate(over="ignore"):
        for j in range(1, k):
            h = splitmix64(h * np.uint64(0x100000001B3))
            h[: n - j] ^= tok_hash[j:]
    # valid gram starts: positions whose k-th token is in the same doc
    valid = parents[: n - k + 1] == parents[k - 1 :]
    return parents[: n - k + 1][valid], h[: n - k + 1][valid]


def _gram_starts(parents: np.ndarray, tok_hash: np.ndarray, k: int):
    """gram_hashes plus the flat START index of each valid gram (needed to
    gather the gram's token strings in the recovery pass)."""
    n = len(tok_hash)
    if n < k:
        return np.empty(0, np.int64), np.empty(0, np.uint64), np.empty(0, np.int64)
    gp, gh = gram_hashes(parents, tok_hash, k)
    valid = parents[: n - k + 1] == parents[k - 1 :]
    return gp, gh, np.flatnonzero(valid).astype(np.int64)


# ----------------------------------------- corpus-wide frequent n-grams
#
# Boilerplate detection: the k most frequent token n-grams across the whole
# corpus. Two-pass hash/recover so NOTHING vocabulary-sized ever reaches the
# driver: pass 1 counts 64-bit rolling gram HASHES (per-batch partial counts
# → one groupby sum → per-block top-k-with-ties, so the driver sees at most
# k·n_blocks candidate rows); pass 2 broadcasts the winning hash set and
# recovers the gram TEXT from a second scan. Assumes no 64-bit collisions
# among the top grams (2^-64-scale risk; a collision would merge two gram
# counts). Final order: (count desc, gram asc) — deterministic, mirrored in
# the SQL oracle.


def _gram_count_partial(batch: pa.Table, n: int) -> pa.Table:
    parents, tokens = tokenize_flat(batch["text"])
    if len(parents) == 0:
        return pa.table({"h": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
    th = fnv1a64(tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens)
    _, gh = gram_hashes(parents, th, n)
    t = pa.table({"h": pa.array(gh.view(np.int64))})
    agg = t.group_by(["h"], use_threads=False).aggregate([([], "count_all")])
    return pa.table({"h": agg["h"], "n": pc.cast(agg["count_all"], pa.int64())})


def _block_topk_ties(batch: pa.Table, k: int) -> pa.Table:
    """Rows whose count is ≥ the block's k-th largest (ties kept): the union
    over blocks is a superset of the global top-k after the groupby sum."""
    n = batch["n"].to_numpy(zero_copy_only=False)
    if len(n) <= k:
        return batch
    thr = np.partition(n, len(n) - k)[len(n) - k]
    return batch.filter(pa.array(n >= thr))


def _gram_recover(batch: pa.Table, n: int, want_ref) -> pa.Table:
    import ray

    want = ray.get(want_ref)  # sorted int64 hash array (answer-sized)
    parents, tokens = tokenize_flat(batch["text"])
    if len(parents) < n:
        return pa.table({"h": pa.array([], pa.int64()), "gram": pa.array([], pa.string())})
    tokens = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
    th = fnv1a64(tokens)
    _, gh, starts = _gram_starts(parents, th, n)
    h = gh.view(np.int64)
    idx = np.searchsorted(want, h)
    sel = np.flatnonzero((idx < len(want)) & (want[np.minimum(idx, len(want) - 1)] == h))
    if len(sel) == 0:
        return pa.table({"h": pa.array([], pa.int64()), "gram": pa.array([], pa.string())})
    s = starts[sel]
    parts = [tokens.take(pa.array(s + j)) for j in range(n)]
    gram = pc.binary_join_element_wise(*parts, " ")
    t = pa.table({"h": pa.array(h[sel]), "gram": gram})
    # dedupe within the batch (min == the string under the no-collision note)
    agg = t.group_by(["h"], use_threads=False).aggregate([("gram", "min")])
    return pa.table({"h": agg["h"], "gram": agg["gram_min"]})


def top_ngrams_ds(sf_dir: str, n: int = 3, k: int = 20) -> pa.Table:
    """(gram, n): the k most frequent token n-grams corpus-wide, count desc
    then gram asc. Returns an answer-sized in-memory table."""
    import ray
    from ray.data.aggregate import Sum

    counts = (
        _docs_ds(sf_dir, ["text"])
        .map_batches(_gram_count_partial, fn_kwargs={"n": n},
                     batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .aggregate(Sum("n"))
    )
    cand = counts.map_batches(
        lambda b: _block_topk_ties(
            pa.table({"h": b["h"], "n": pc.cast(b["sum(n)"], pa.int64())}), k
        ) if b.num_rows else pa.table({"h": pa.array([], pa.int64()),
                                       "n": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    ).take_all()  # ≤ k(+ties) rows per block — answer-sized
    if not cand:
        return pa.table({"gram": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    hs = np.array([r["h"] for r in cand], dtype=np.int64)
    ns = np.array([r["n"] for r in cand], dtype=np.int64)
    if len(ns) > k:
        thr = np.partition(ns, len(ns) - k)[len(ns) - k]
        keep = ns >= thr
        hs, ns = hs[keep], ns[keep]
    order = np.argsort(hs)
    hs, ns = hs[order], ns[order]
    want_ref = ray.put(hs)
    rec = (
        _docs_ds(sf_dir, ["text"])
        .map_batches(_gram_recover, fn_kwargs={"n": n, "want_ref": want_ref},
                     batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    text_of = {r["h"]: r["gram"] for r in rec}
    rows = sorted(
        ((text_of[int(h)], int(c)) for h, c in zip(hs, ns)),
        key=lambda x: (-x[1], x[0]),
    )[:k]
    return pa.table(
        {"gram": pa.array([g for g, _ in rows], pa.string()),
         "n": pa.array([c for _, c in rows], pa.int64())}
    )


def _colloc_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial: within-doc adjacent token bigrams → (bigram, n).
    The combiner: the shuffle carries one row per DISTINCT bigram per
    batch, never one per occurrence — the term-stats scale story."""
    parents, tokens = tokenize_flat(batch["text"])
    m = len(parents)
    empty = pa.table(
        {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )
    if m < 2:
        return empty
    valid = parents[1:] == parents[:-1]
    big = pc.binary_join_element_wise(
        tokens.slice(0, m - 1), tokens.slice(1, m), " "
    ).filter(pa.array(valid))
    if len(big) == 0:
        return empty
    agg = pa.table({"bigram": big}).group_by(
        ["bigram"], use_threads=False
    ).aggregate([([], "count_all")])
    return pa.table(
        {
            "bigram": pc.cast(agg["bigram"], pa.string()),
            "n": pc.cast(agg["count_all"], pa.int64()),
        }
    )


def _colloc_block_cand(batch: pa.Table, min_count: int, cap: int) -> pa.Table:
    """Per-block candidate cut: bigrams with n ≥ min_count, top-``cap`` by
    (n desc, bigram asc) with ties kept — the union over blocks is a
    superset of the global cut."""
    t = pa.table(
        {"bigram": pc.cast(batch["bigram"], pa.string()),
         "n": pc.cast(batch["sum(n)"], pa.int64())}
    )
    t = t.filter(pc.greater_equal(t["n"], pa.scalar(min_count)))
    return _block_topk_ties(t, cap)


def collocations_ds(sf_dir: str, k: int = 20, min_count: int = 5,
                    cand_cap: int = 100_000) -> pa.Table:
    """(bigram, n, pmi): the k strongest within-doc adjacent-bigram
    collocations by pointwise mutual information, PMI = ln((c_xy/N_bi) /
    ((c_x/N_uni)·(c_y/N_uni))), among bigrams with count ≥ ``min_count``
    — classic phrase mining over the corpus. Two corpus passes (bigram
    partial counts → groupby; one cheap token-total pass) plus an
    answer-sized unigram lookup for the candidate terms (broadcast isin
    filter on the term-stats partials). Candidates are cut to the
    ``cand_cap`` highest-count bigrams per block before PMI — a
    deterministic, DECLARED cap (logged when it binds; mirror it in any
    oracle), since PMI order isn't count order."""
    import ray
    from ray.data.aggregate import Sum

    # corpus totals: N_uni = Σ tokens, N_bi = Σ max(tokens-1, 0) per doc
    tot = token_count_ds(sf_dir).map_batches(
        lambda b: pa.table(
            {
                "u": pa.array([int(pc.sum(b["n_tokens"]).as_py() or 0)]),
                "b": pa.array([int(
                    pc.sum(pc.max_element_wise(
                        pc.subtract(b["n_tokens"], pa.scalar(1, pa.int64())),
                        pa.scalar(0, pa.int64()))).as_py() or 0)]),
            }
        ),
        batch_format="pyarrow",
    )
    n_uni = tot.sum("u")
    n_bi = tot.sum("b")

    cand_rows = (
        _docs_ds(sf_dir, ["text"])
        .map_batches(_colloc_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bigram")
        .aggregate(Sum("n"))
        .map_batches(
            lambda b: _colloc_block_cand(b, min_count, cand_cap)
            if b.num_rows else pa.table(
                {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )
    if not cand_rows:
        return pa.table(
            {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64()),
             "pmi": pa.array([], pa.float64())}
        )
    bigs = np.array([r["bigram"] for r in cand_rows], dtype=object)
    ns = np.array([r["n"] for r in cand_rows], dtype=np.int64)
    if len(ns) > cand_cap:
        thr = np.partition(ns, len(ns) - cand_cap)[len(ns) - cand_cap]
        keep = ns >= thr
        dropped = int((~keep).sum())
        print(f"[collocations] cand_cap={cand_cap} binding: dropped {dropped} bigrams")
        bigs, ns = bigs[keep], ns[keep]

    terms = sorted({t for b in bigs for t in b.split(" ")})
    want_ref = ray.put(terms)

    def _uni_filter(batch: pa.Table) -> pa.Table:
        want = ray.get(want_ref)  # answer-sized broadcast, zero-copy per task
        t = _term_partial(batch)
        return t.filter(pc.is_in(t["term"], value_set=pa.array(want)))

    uni = (
        _docs_ds(sf_dir, ["doc_id", "text"])
        .map_batches(_uni_filter, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("ttf"))
        .take_all()
    )
    c_uni = {r["term"]: int(r["sum(ttf)"]) for r in uni}
    cx = np.array([c_uni[b.split(" ")[0]] for b in bigs], dtype=np.float64)
    cy = np.array([c_uni[b.split(" ")[1]] for b in bigs], dtype=np.float64)
    pmi = np.round(
        np.log((ns.astype(np.float64) / n_bi) / ((cx / n_uni) * (cy / n_uni))), 6
    )
    order = np.lexsort((bigs, -pmi))[:k]
    return pa.table(
        {
            "bigram": pa.array([str(b) for b in bigs[order]], pa.string()),
            "n": pa.array(ns[order], pa.int64()),
            "pmi": pa.array(pmi[order], pa.float64()),
        }
    )


def winnow(gp: np.ndarray, gh: np.ndarray, w: int):
    """Winnowing (Schleimer, Wilkerson, Aiken 2003): per doc, the min hash of
    every window of ``w`` consecutive k-gram hashes, deduplicated. Returns
    (doc:int64, fingerprint:uint64) sorted by doc."""
    if len(gh) == 0 or w <= 1:
        order = np.argsort(gp, kind="stable")
        return _dedup_pairs(gp[order], gh[order])
    from numpy.lib.stride_tricks import sliding_window_view

    if len(gh) < w:
        out_p = np.empty(0, np.int64)
        out_h = np.empty(0, np.uint64)
    else:
        wins = sliding_window_view(gh, w).min(axis=1)
        same = gp[: len(wins)] == gp[w - 1 :]
        out_p, out_h = gp[: len(wins)][same], wins[same]
    # short docs (fewer than w grams): every window spans a doc boundary and
    # is masked out above — emit the doc's global min gram hash instead
    short_docs = np.setdiff1d(np.unique(gp), np.unique(out_p))
    if len(short_docs):
        sel = np.isin(gp, short_docs)
        sp, sh = gp[sel], gh[sel]
        order = np.argsort(sp, kind="stable")
        sp, sh = sp[order], sh[order]
        starts = np.flatnonzero(np.concatenate([[True], sp[1:] != sp[:-1]]))
        mins = np.minimum.reduceat(sh, starts)
        out_p = np.concatenate([out_p, sp[starts]])
        out_h = np.concatenate([out_h, mins])
    order = np.argsort(out_p, kind="stable")
    return _dedup_pairs(out_p[order], out_h[order])


def _dedup_pairs(p: np.ndarray, h: np.ndarray):
    if len(p) == 0:
        return p.astype(np.int64), h
    key = np.stack([p.astype(np.int64), h.view(np.int64)], axis=1)
    uniq = np.unique(key, axis=0)
    return uniq[:, 0], uniq[:, 1].view(np.uint64)


class FingerprintStage:
    """Actor-pool map_batches stage: per-doc winnowing fingerprints summary.
    k/w fixed per actor in __init__ (stateful-stage pattern)."""

    def __init__(self, k: int = 3, w: int = 4):
        self.k = k
        self.w = w

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        parents, tokens = tokenize_flat(batch["text"])
        th = fnv1a64(tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens)
        gp, gh = gram_hashes(parents, th, self.k)
        n_grams = np.bincount(gp, minlength=n_rows).astype(np.int64) if len(gp) else np.zeros(n_rows, np.int64)
        fp_doc, fp_hash = winnow(gp, gh, self.w)
        n_fp = np.bincount(fp_doc, minlength=n_rows).astype(np.int64) if len(fp_doc) else np.zeros(n_rows, np.int64)
        fp_xor = np.zeros(n_rows, dtype=np.uint64)
        if len(fp_doc):
            np.bitwise_xor.at(fp_xor, fp_doc, fp_hash)
        return pa.table(
            {
                "doc_id": pc.cast(_ids(batch), pa.int64()),
                "n_grams": pa.array(n_grams),
                "n_fingerprints": pa.array(n_fp),
                "fp_xor": pa.array(fp_xor.view(np.int64)),
            }
        )


def _doc_term_tf(batch: pa.Table) -> pa.Table:
    """(doc_id, term, tf) per batch — exact per doc (batches never split a
    row), the same combiner shape as the index build's posting compose."""
    parents, tokens = tokenize_flat(batch["text"])
    ids = pc.cast(_ids(batch), pa.int64()).to_numpy(zero_copy_only=False)
    t = pa.table({"doc_id": pa.array(ids[parents]), "term": tokens})
    agg = t.group_by(["doc_id", "term"], use_threads=False).aggregate([([], "count_all")])
    return pa.table(
        {
            "doc_id": agg["doc_id"],
            "term": pc.cast(agg["term"], pa.string()),
            "tf": pc.cast(agg["count_all"], pa.int64()),
        }
    )


def keywords_ds(sf_dir: str, k: int = 3):
    """Per-doc TF-IDF keyword extraction: the top-k terms of each document
    by tf·ln(N/df) (score rounded 1e-6, ties → term asc). The doc-tagging /
    topic-labeling primitive of a curation pipeline.

    Two exchanges, both over (doc_id, term, tf) rows pre-aggregated per
    batch: groupby(term) attaches the exact global df (df = the group's row
    count — one row per containing doc), then groupby(doc_id) ranks. Skew
    note: a term present in every doc makes its df group corpus-sized; at
    true 100-TB vocabularies pre-drop stopword-class terms (they can never
    be keywords) with a df cap before the first exchange — kept exact here
    for the SQL oracle."""
    import pyarrow.dataset as pads

    n_docs = pads.dataset(os.path.join(sf_dir, "documents.parquet")).count_rows()

    def _attach_df(g: pa.Table) -> pa.Table:
        return g.append_column(
            "df", pa.array(np.full(g.num_rows, g.num_rows, dtype=np.int64))
        )

    def _topk(g: pa.Table) -> pa.Table:
        tf = g["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = g["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        score = np.round(tf * np.log(float(n_docs) / df), 6)
        terms = np.asarray(g["term"].to_pylist(), dtype=object)
        order = sorted(range(len(score)), key=lambda i: (-score[i], terms[i]))[:k]
        return pa.table(
            {
                "doc_id": g["doc_id"].take(pa.array(order)),
                "term": g["term"].take(pa.array(order)),
                "score": pa.array(score[order], type=pa.float64()),
            }
        )

    triples = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        _doc_term_tf, batch_format="pyarrow", zero_copy_batch=True
    )
    with_df = triples.groupby("term").map_groups(_attach_df, batch_format="pyarrow")
    return with_df.groupby("doc_id").map_groups(_topk, batch_format="pyarrow")


def fingerprint_ds(sf_dir: str, k: int = 3, w: int = 4):
    """(doc_id, n_grams, n_fingerprints, fp_xor) winnowing summary."""
    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        FingerprintStage,
        fn_constructor_kwargs={"k": k, "w": w},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 2),
    )


# ------------------------------------------------- char-bigram LM quality

# Perplexity-proxy quality filtering (the CCNet/Gopher-style signal) over a
# SELF-TRAINED character bigram LM: normalize each doc to its token stream
# joined by single spaces (the exact tokenizer contract — so the LM sees
# the same bytes the index does), estimate add-one-smoothed bigram
# probabilities over the corpus (alphabet [a-z0-9 ] → 37² counts, a
# broadcast-sized model), then score each doc by the mean natural log
# probability of its bigrams. Low scores ⇒ unnatural character statistics
# (boilerplate, encoding garbage, non-language). Both passes are plain
# map_batches; the model is 1369 floats via ray.put.

_LM_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "
_LM_V = len(_LM_ALPHABET)  # 37
_LM_CODE = np.full(256, -1, dtype=np.int64)
for _i, _c in enumerate(_LM_ALPHABET):
    _LM_CODE[ord(_c)] = _i


def _doc_streams(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Per batch: (doc_lengths, concatenated normalized byte codes) — each
    doc's tokens joined by single spaces, coded into the 37-symbol
    alphabet. Vectorized: one gather builds the padded token+space buffer."""
    parents, tokens = tokenize_flat(batch["text"])
    n_rows = batch.num_rows
    if len(parents) == 0:
        return np.zeros(n_rows, np.int64), np.empty(0, np.int64)
    toks = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
    joined = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(np.bincount(parents, minlength=n_rows))]).astype(np.int32)),
            toks,
        ),
        pa.scalar(" "),
    )
    lens = np.zeros(n_rows, dtype=np.int64)
    bufs = []
    for i, s in enumerate(joined.to_pylist()):
        b = (s or "").encode()
        lens[i] = len(b)
        bufs.append(np.frombuffer(b, dtype=np.uint8))
    flat = np.concatenate(bufs) if bufs else np.empty(0, np.uint8)
    return lens, _LM_CODE[flat]


def _bigram_partial(batch: pa.Table) -> pa.Table:
    lens, codes = _doc_streams(batch)
    counts = np.zeros(_LM_V * _LM_V, dtype=np.int64)
    if len(codes):
        ends = np.cumsum(lens)
        valid = np.ones(len(codes) - 1, dtype=bool) if len(codes) > 1 else np.zeros(0, bool)
        # bigrams never span doc boundaries (guard: a zero-length doc makes
        # ends-1 wrap to -1 / duplicate — only real boundary positions mask)
        b = ends[:-1] - 1
        b = b[(b >= 0) & (b < len(valid))]
        valid[b] = False
        if valid.any():
            bg = codes[:-1][valid] * _LM_V + codes[1:][valid]
            counts += np.bincount(bg, minlength=_LM_V * _LM_V)
    live = np.flatnonzero(counts)
    return pa.table({"bg": pa.array(live), "n": pa.array(counts[live])})


def train_char_lm(sf_dir: str) -> np.ndarray:
    """(V, V) add-one-smoothed ln-probability matrix from one distributed
    counting pass."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    rows = (
        _docs_ds(sf_dir, ["text"])
        .map_batches(_bigram_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bg")
        .aggregate(Sum("n"))
        .take_all()
    )
    counts = np.zeros(_LM_V * _LM_V, dtype=np.float64)
    for r in rows:
        counts[int(r["bg"])] = float(r["sum(n)"])
    m = counts.reshape(_LM_V, _LM_V)
    return np.log((m + 1.0) / (m.sum(axis=1, keepdims=True) + _LM_V))


class CharLmScorer:
    """Pass-2 stage: model from the object store once per actor, per-doc
    mean ln bigram probability (0.0 for docs with no bigram)."""

    def __init__(self, lm_ref):
        import ray

        self.lp = (ray.get(lm_ref) if not isinstance(lm_ref, np.ndarray) else lm_ref).reshape(-1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lens, codes = _doc_streams(batch)
        n_rows = batch.num_rows
        score = np.zeros(n_rows, dtype=np.float64)
        nbg = np.maximum(lens - 1, 0)
        if len(codes) > 1:
            ends = np.cumsum(lens)
            valid = np.ones(len(codes) - 1, dtype=bool)
            b = ends[:-1] - 1
            b = b[(b >= 0) & (b < len(valid))]
            valid[b] = False
            lp = self.lp[codes[:-1] * _LM_V + codes[1:]]
            lp[~valid] = 0.0
            doc_of = np.searchsorted(ends, np.arange(len(codes) - 1), side="right")
            sums = np.bincount(doc_of, weights=lp, minlength=n_rows)
            nz = nbg > 0
            score[nz] = sums[nz] / nbg[nz]
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_bigrams": pa.array(nbg),
                "lm_score": pa.array(np.round(score, 6), type=pa.float64()),
            }
        )


def charlm_score_ds(sf_dir: str):
    """(doc_id, n_bigrams, lm_score): mean ln P(c₂|c₁) of each doc under
    the corpus's own character bigram LM."""
    import ray
    import ray.data as rd

    lm = train_char_lm(sf_dir)
    ref = ray.put(lm)
    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        CharLmScorer,
        fn_constructor_kwargs={"lm_ref": ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 2),
    )


# ------------------------------------------------------- decontamination

# Benchmark decontamination (the GPT-3 appendix-C / PaLM procedure): a
# training document is contaminated if it shares any token k-gram with the
# evaluation set. The eval side of a real pipeline is tiny (benchmarks are
# thousands of documents against a 100 TB corpus), so its distinct gram-hash
# set is the canonical broadcast small side: computed once, ray.put once,
# binary-searched inside every map_batches task. Production uses k=13;
# the tiny synthetic fixtures exercise the machinery at k=3 (the gram-hash
# chain already mirrored in the SQL oracles).


def eval_gram_set(sf_dir: str, eval_max_doc_id: int, k: int) -> np.ndarray:
    """Distinct k-gram hashes of the eval slice (doc_id < eval_max_doc_id),
    sorted uint64. Streams only the eval rows (row filter at the read); the
    result is benchmark-sized by construction."""
    ds = _docs_ds(sf_dir, ["doc_id", "text"]).filter(
        expr=f"doc_id < {int(eval_max_doc_id)}"
    )

    def _grams(batch: pa.Table) -> pa.Table:
        parents, tokens = tokenize_flat(batch["text"])
        th = fnv1a64(tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens)
        _, gh = gram_hashes(parents, th, k)
        return pa.table({"g": pa.array(np.unique(gh))})

    parts = [
        b["g"].to_numpy(zero_copy_only=False)
        for b in ds.map_batches(_grams, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    return np.unique(np.concatenate(parts)) if parts else np.empty(0, np.uint64)


class DecontamStage:
    """Actor-pool stage: per-doc count of DISTINCT k-gram hashes shared with
    the broadcast eval gram set. The eval array is fetched from the object
    store once per actor (zero-copy shared-memory view), never per batch."""

    def __init__(self, eval_ref, k: int):
        import ray

        self.k = k
        self.eval_grams = ray.get(eval_ref)  # sorted uint64

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        parents, tokens = tokenize_flat(batch["text"])
        th = fnv1a64(tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens)
        gp, gh = gram_hashes(parents, th, self.k)
        n_hits = np.zeros(n_rows, dtype=np.int64)
        if len(gp) and len(self.eval_grams):
            # per-doc distinct grams, then sorted-set membership
            order = np.lexsort((gh, gp))
            gp, gh = gp[order], gh[order]
            keep = np.concatenate([[True], (gp[1:] != gp[:-1]) | (gh[1:] != gh[:-1])])
            gp, gh = gp[keep], gh[keep]
            idx = np.searchsorted(self.eval_grams, gh)
            idx[idx == len(self.eval_grams)] = 0
            hit = self.eval_grams[idx] == gh
            if hit.any():
                np.add.at(n_hits, gp[hit], 1)
        return pa.table(
            {
                "doc_id": pc.cast(_ids(batch), pa.int64()),
                "n_hits": pa.array(n_hits),
                "contaminated": pa.array(n_hits > 0),
            }
        )


def decontaminate_ds(sf_dir: str, eval_max_doc_id: int, k: int = 3):
    """(doc_id, n_hits, contaminated) for every TRAINING doc (doc_id ≥
    eval_max_doc_id): n_hits = distinct token k-grams shared with the eval
    slice (doc_id < eval_max_doc_id). The eval gram set rides the object
    store as one broadcast array; the training scan is embarrassingly
    parallel — no shuffle anywhere."""
    import ray

    ref = ray.put(eval_gram_set(sf_dir, eval_max_doc_id, k))
    return (
        _docs_ds(sf_dir, ["doc_id", "text"])
        .filter(expr=f"doc_id >= {int(eval_max_doc_id)}")
        .map_batches(
            DecontamStage,
            fn_constructor_kwargs={"eval_ref": ref, "k": k},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 2),
        )
    )


# ------------------------------------------- sequence chunking and packing

# Training-sequence preparation: (1) chunk each document's token stream into
# consecutive windows of ≤ max_tokens (what a trainer feeds a fixed-context
# model after re-tokenizing), and (2) assign documents to fixed-budget
# training sequences ("linear packing": concatenate in doc_id order, cut
# every `budget` tokens — a document starts in pack ⌊tokens-before/budget⌋;
# overflow is handled downstream by the chunker). Chunking is embarrassingly
# parallel. Packing needs a GLOBAL prefix sum over doc order — the same
# two-phase offset pattern as the index build (build.py phase 1): one tiny
# per-file counting pass, an exclusive prefix over file totals on the
# driver (one int per FILE, never per doc), then a parallel second pass
# where every task computes exact global offsets by local cumsum + its
# file's base.


def _chunk_batch(batch: pa.Table, max_tokens: int) -> pa.Table:
    n_rows = batch.num_rows
    parents, tokens = tokenize_flat(batch["text"])
    if len(parents) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
            }
        )
    toks = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
    counts = np.bincount(parents, minlength=n_rows).astype(np.int64)
    doc_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(parents), dtype=np.int64) - doc_starts[parents]
    cidx = pos // np.int64(max_tokens)
    new_chunk = np.concatenate(
        [[True], (parents[1:] != parents[:-1]) | (cidx[1:] != cidx[:-1])]
    )
    coff = np.flatnonzero(new_chunk)
    offsets = np.concatenate([coff, [len(parents)]]).astype(np.int32)
    chunk_text = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets), toks), pa.scalar(" ")
    )
    ids = pc.cast(_ids(batch), pa.int64()).to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(ids[parents[coff]]),
            "chunk_idx": pa.array(cidx[coff]),
            "n_tokens": pa.array(np.diff(offsets).astype(np.int64)),
            "chunk_text": chunk_text,
        }
    )


def chunk_ds(sf_dir: str, max_tokens: int = 64):
    """(doc_id, chunk_idx, n_tokens, chunk_text): each doc's token stream in
    consecutive ≤max_tokens windows; chunk_text is the tokens joined by a
    single space (the tokenizer-normalized stream). Zero-token docs emit no
    chunks. One map_batches pass — no shuffle."""
    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        _chunk_batch,
        fn_kwargs={"max_tokens": max_tokens},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _file_token_counts(path: str):
    """Packing pass 1: one file's (sorted-doc_id check, first/last ids,
    per-doc token counts). Returns ``(meta, counts)`` as TWO task returns so
    the per-doc counts array stays in the object store — the driver fetches
    only the tiny meta dicts; pass 2 fetches each file's counts by ref and
    never re-reads or re-tokenizes the text. Counting-only tokenize
    (``with_tokens=False``) skips the token-string gather entirely."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["doc_id", "text"], use_threads=False)
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(ids) > 1 and not bool(np.all(np.diff(ids) > 0)):
        raise ValueError(f"{path}: doc_id not strictly sorted — packing needs doc order")
    parents, _ = tokenize_flat(t["text"], with_tokens=False)
    counts = token_counts(parents, t.num_rows).astype(np.int64)
    meta = {
        "total": int(counts.sum()),
        "first": int(ids[0]) if len(ids) else -1,
        "last": int(ids[-1]) if len(ids) else -1,
        "rows": t.num_rows,
    }
    return meta, counts


class PackStage:
    """Packing pass 2 (actor-pool, one file per task): the file's per-doc
    token counts (fetched by object ref — pass 1's output, no second text
    read) → exact global tokens-before by local exclusive cumsum + the
    file's broadcast base offset → pack_id = before // budget."""

    def __init__(self, bases: dict[int, int], budget: int, counts_refs: list):
        self.bases = bases
        self.budget = budget
        self.counts_refs = counts_refs

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        import ray

        out = []
        for i in range(batch.num_rows):
            fidx = int(batch["fidx"][i].as_py())
            t = pq.read_table(
                batch["path"][i].as_py(), columns=["doc_id"], use_threads=False
            )
            n = np.asarray(ray.get(self.counts_refs[fidx]), dtype=np.int64)
            if len(n) == 0:
                continue
            before = self.bases[fidx] + np.concatenate([[0], np.cumsum(n)[:-1]])
            out.append(
                pa.table(
                    {
                        "doc_id": pc.cast(t["doc_id"], pa.int64()),
                        "n_tokens": pa.array(n),
                        "pack_id": pa.array(before // np.int64(self.budget)),
                    }
                )
            )
        if not out:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "pack_id": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(out)


def pack_ds(sf_dir: str, budget: int = 512):
    """(doc_id, n_tokens, pack_id): linear sequence packing — documents in
    doc_id order are concatenated and cut every `budget` tokens; a doc
    belongs to the pack its first token lands in. One tokenize pass over
    the text (pass 2 reuses pass 1's per-doc counts via object refs); the
    only driver state is one meta dict per FILE. Files are ordered by their
    first doc_id (not filename — ``shard-10`` sorts before ``shard-2``
    lexically), then validated as globally non-overlapping."""
    import glob as _glob

    import ray
    import ray.data as rd

    path = os.path.join(sf_dir, "documents.parquet")
    files = sorted(_glob.glob(path)) if "*" in path else (
        sorted(_glob.glob(os.path.join(path, "*.parquet"))) if os.path.isdir(path) else [path]
    )
    count = ray.remote(num_cpus=1, num_returns=2)(_file_token_counts)
    pairs = [count.remote(f) for f in files]
    metas = ray.get([m for m, _ in pairs])
    counts_refs = [c for _, c in pairs]
    # doc order = first-doc_id order; empty shards (no order info) last
    order = sorted(
        range(len(files)),
        key=lambda i: (metas[i]["rows"] == 0, metas[i]["first"]),
    )
    files = [files[i] for i in order]
    metas = [metas[i] for i in order]
    counts_refs = [counts_refs[i] for i in order]
    spans = [(m["first"], m["last"]) for m in metas if m["rows"]]
    if any(b[0] <= a[1] for a, b in zip(spans, spans[1:])):
        raise ValueError("documents files not globally sorted by doc_id")
    totals = np.array([m["total"] for m in metas], dtype=np.int64)
    bases = {i: int(b) for i, b in enumerate(np.concatenate([[0], np.cumsum(totals)[:-1]]))}
    items = [{"path": f, "fidx": i} for i, f in enumerate(files)]
    return rd.from_items(items).map_batches(
        PackStage,
        fn_constructor_kwargs={"bases": bases, "budget": budget, "counts_refs": counts_refs},
        batch_size=1,
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


# ------------------------------------------------------- pattern redaction

# PII / pattern scrubbing: apply an ordered {label: regex} map to each doc —
# count matches, then replace them with "<label>" — in ONE vectorized
# map_batches pass (RE2 kernels; counts are taken on the text state each
# pattern sees, i.e. after the previous labels' replacements, which the SQL
# oracle mirrors by nesting regexp_replace). The synthetic corpus contains
# no real PII, so the driver query exercises the machinery with
# corpus-firing patterns; these presets are the production defaults.
PII_PRESETS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{6,}[0-9]",
    "ipv4": r"([0-9]{1,3}\.){3}[0-9]{1,3}",
}


def _redact_batch(batch: pa.Table, patterns: dict[str, str]) -> pa.Table:
    text = batch["text"]
    cur = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    cols: dict = {"doc_id": pc.cast(_ids(batch), pa.int64())}
    for label, pat in patterns.items():
        cols[f"n_{label}"] = pc.cast(pc.count_substring_regex(cur, pat), pa.int64())
        cur = pc.replace_substring_regex(cur, pat, f"<{label}>")
    cols["redacted_text"] = cur
    return pa.table(cols)


def redact_ds(sf_dir: str, patterns: dict[str, str] | None = None):
    """(doc_id, n_<label>..., redacted_text): per-doc match counts and the
    scrubbed text under the ordered pattern map (default: the PII presets).
    Stateless vectorized scan — no shuffle, no actor state."""
    patterns = dict(patterns or PII_PRESETS)
    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        _redact_batch,
        fn_kwargs={"patterns": patterns},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ------------------------------------------------------- per-source stats

def _source_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial: exact integer sums per source (docs, tokens,
    stopword hits, chars) — the shuffle carries one row per (source,
    batch)."""
    n_rows = batch.num_rows
    parents, tokens = tokenize_flat(batch["text"])
    n_tok = token_counts(parents, n_rows).astype(np.int64)
    stop_hit = pc.is_in(tokens, value_set=pa.array(sorted(STOPWORDS))).to_numpy(
        zero_copy_only=False
    )
    n_stop = np.zeros(n_rows, dtype=np.int64)
    if len(parents):
        np.add.at(n_stop, parents, stop_hit.astype(np.int64))
    n_chars = pc.utf8_length(pc.coalesce(batch["text"], "")).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    t = pa.table(
        {
            "source": pc.cast(batch["source"], pa.string()),
            "ntok": pa.array(n_tok),
            "nstop": pa.array(n_stop),
            "nchars": pa.array(n_chars),
        }
    )
    agg = t.group_by("source", use_threads=False).aggregate(
        [("ntok", "sum"), ("nstop", "sum"), ("nchars", "sum"), ([], "count_all")]
    )
    return pa.table(
        {
            "source": agg["source"],
            "n_docs": pc.cast(agg["count_all"], pa.int64()),
            "n_tokens": pc.cast(agg["ntok_sum"], pa.int64()),
            "n_stopwords": pc.cast(agg["nstop_sum"], pa.int64()),
            "n_chars": pc.cast(agg["nchars_sum"], pa.int64()),
        }
    )


def source_stats_ds(sf_dir: str):
    """(source, n_docs, n_tokens, n_stopwords, n_chars, mean_tokens,
    stopword_ratio): the per-source corpus quality report — exact integer
    sums through the shuffle, ratios computed once from the final sums
    (single fp64 ops on exact ints, so Ray and DuckDB agree
    bit-for-bit)."""
    from ray.data.aggregate import Sum

    ds = _docs_ds(sf_dir, ["source", "text"]).map_batches(
        _source_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    out = ds.groupby("source").aggregate(
        Sum("n_docs"), Sum("n_tokens"), Sum("n_stopwords"), Sum("n_chars")
    )
    empty = pa.schema(
        [
            ("source", pa.string()),
            ("n_docs", pa.int64()),
            ("n_tokens", pa.int64()),
            ("n_stopwords", pa.int64()),
            ("n_chars", pa.int64()),
            ("mean_tokens", pa.float64()),
            ("stopword_ratio", pa.float64()),
        ]
    ).empty_table()

    def finish(b: pa.Table) -> pa.Table:
        # zero-row inputs reach here schemaless (Ray hash aggregate)
        if len(b.schema) != 5:
            return empty
        nd = b["sum(n_docs)"].to_numpy(zero_copy_only=False).astype(np.int64)
        nt = b["sum(n_tokens)"].to_numpy(zero_copy_only=False).astype(np.int64)
        ns = b["sum(n_stopwords)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "source": pc.cast(b["source"], pa.string()),
                "n_docs": pa.array(nd),
                "n_tokens": pa.array(nt),
                "n_stopwords": pa.array(ns),
                "n_chars": pc.cast(b["sum(n_chars)"], pa.int64()),
                "mean_tokens": pa.array(np.round(nt / np.maximum(nd, 1), 6)),
                "stopword_ratio": pa.array(
                    np.round(ns / np.maximum(nt, 1), 6)
                ),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------- naive-Bayes domain classifier

# Self-trained multinomial naive-Bayes document classifier (the
# domain/topic-classification stage of curation pipelines, fastText-style
# but with exactly mirrorable math): classes = the corpus's own `source`
# labels, features = the top-V corpus tokens (count desc, token asc — the
# deterministic vocab cap; out-of-vocab tokens are ignored), add-one
# smoothing over the restricted vocab. Training is two bounded passes —
# (1) distinct-token partials → distributed sort+limit picks the vocab
# (the driver never sees more than V rows), (2) per-(source, token)
# counts filtered to the vocab (≤ C×V rows). Scoring broadcasts the
# (C, V) log-likelihood matrix via ray.put and is one matmul per batch.


def _class_token_partial(batch: pa.Table) -> pa.Table:
    """(source, tok, n) occurrence counts for one batch."""
    parents, tokens = tokenize_flat(batch["text"])
    src = batch["source"].combine_chunks() if isinstance(batch["source"], pa.ChunkedArray) else batch["source"]
    if len(parents) == 0:
        return pa.table(
            {"source": pa.array([], pa.string()), "tok": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}
        )
    t = pa.table({"source": src.take(pa.array(parents)), "tok": tokens})
    agg = t.group_by(["source", "tok"], use_threads=False).aggregate([([], "count_all")])
    return pa.table(
        {"source": agg["source"], "tok": agg["tok"],
         "n": pc.cast(agg["count_all"], pa.int64())}
    )


def train_nb_model(sf_dir: str, vocab_size: int = 16):
    """Returns (classes, class_ln_prior, vocab, ln_lik) — classes and vocab
    sorted ascending; ln_lik is (C, V) float64."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    rows = _docs_ds(sf_dir, ["source", "text"]).map_batches(
        _class_token_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    vocab_rows = (
        rows.groupby("tok")
        .aggregate(Sum("n"))
        .map_batches(
            lambda b: b.rename_columns(["tok", "n"]), batch_format="pyarrow"
        )
        .sort(["n", "tok"], descending=[True, False])
        .limit(vocab_size)
        .take_all()
    )
    vocab = np.array(sorted(r["tok"] for r in vocab_rows))
    cls_rows = (
        _docs_ds(sf_dir, ["source"])
        .map_batches(
            lambda b: pa.table(
                {
                    "source": (g := b.group_by(["source"], use_threads=False)
                               .aggregate([([], "count_all")]))["source"],
                    "d": pc.cast(g["count_all"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("source")
        .aggregate(Sum("d"))
        .take_all()
    )
    classes = np.array(sorted(r["source"] for r in cls_rows))
    docs = {r["source"]: int(r["sum(d)"]) for r in cls_rows}
    n_total = sum(docs.values())
    ln_prior = np.log(np.array([docs[c] for c in classes], dtype=np.float64) / n_total)

    vocab_pa = pa.array(vocab.tolist(), type=pa.string())
    cond_rows = (
        rows.map_batches(
            lambda b: b.filter(pc.is_in(b["tok"], value_set=vocab_pa)),
            batch_format="pyarrow",
        )
        .groupby(["source", "tok"])
        .aggregate(Sum("n"))
        .take_all()
    )
    C, V = len(classes), len(vocab)
    cidx = {c: i for i, c in enumerate(classes.tolist())}
    tidx = {t: i for i, t in enumerate(vocab.tolist())}
    cnt = np.zeros((C, V), dtype=np.float64)
    for r in cond_rows:
        cnt[cidx[r["source"]], tidx[r["tok"]]] = float(r["sum(n)"])
    ln_lik = np.log((cnt + 1.0) / (cnt.sum(axis=1, keepdims=True) + vocab_size))
    return classes, ln_prior, vocab, ln_lik


class NbScorer:
    """Pass-2 stage: model from the object store once per actor; per doc
    argmax_c [ln prior_c + Σ_tok∈vocab ln_lik_c,tok] (ties → class asc)."""

    def __init__(self, model_ref):
        import ray

        m = ray.get(model_ref) if not isinstance(model_ref, tuple) else model_ref
        self.classes, self.ln_prior, self.vocab, self.ln_lik = m
        self.vocab_pa = pa.array(self.vocab.tolist(), type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        parents, tokens = tokenize_flat(batch["text"])
        scores = np.broadcast_to(self.ln_prior, (n_rows, len(self.classes))).copy()
        if len(parents):
            toks = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
            idx = pc.fill_null(
                pc.index_in(toks, value_set=self.vocab_pa), -1
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            hit = idx >= 0
            if hit.any():
                counts = np.zeros((n_rows, len(self.vocab)), dtype=np.float64)
                np.add.at(counts, (parents[hit], idx[hit]), 1.0)
                scores = scores + counts @ self.ln_lik.T
        pred = self.classes[np.argmax(scores, axis=1)]
        src = batch["source"].combine_chunks() if isinstance(batch["source"], pa.ChunkedArray) else batch["source"]
        return pa.table(
            {
                "doc_id": pc.cast(_ids(batch), pa.int64()),
                "source": src,
                "pred_source": pa.array(pred),
                "hit": pc.equal(src, pa.array(pred)),
            }
        )


def nb_classify_ds(sf_dir: str, vocab_size: int = 16):
    """(doc_id, source, pred_source, hit) under the corpus-trained
    naive-Bayes source classifier."""
    import ray

    model = train_nb_model(sf_dir, vocab_size)
    ref = ray.put(model)
    return _docs_ds(sf_dir, ["doc_id", "source", "text"]).map_batches(
        NbScorer,
        fn_constructor_kwargs={"model_ref": ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 2),
    )


# -------------------------------------------------------------- BPE training
#
# True byte-pair-encoding merge training (Sennrich et al. 2016 §3.2): start
# from characters, repeatedly merge the most frequent adjacent symbol pair.
# The corpus-scale part is ONE distributed word-count (the _term_partial
# combiner → groupby sum → distributed sort+limit), capped at a DECLARED
# top-``vocab_cap`` words by (count desc, word asc) — the standard trainer
# shape (HuggingFace trains from a pruned word-frequency table, not the
# token stream). The merge loop then runs on the driver over ≤ vocab_cap
# short words — answer-bounded work, independent of corpus size.
#
# Determinism (shared with the SQL mirror): best pair per step =
# (weighted count desc, left asc, right asc); each step re-segments every
# word with ONE greedy left-to-right non-overlapping pass (the semantics of
# SQL replace() on the space-separated piece string).


def bpe_train_ds(sf_dir: str, n_merges: int = 8, vocab_cap: int = 100) -> pa.Table:
    """(merge_rank, lhs, rhs, freq): the first ``n_merges`` BPE merge rules
    trained over the corpus word table (module note). freq is the pair's
    weighted adjacent-occurrence count at the step it won."""
    from ray.data.aggregate import Sum

    rows = (
        _docs_ds(sf_dir, ["doc_id", "text"])
        .map_batches(_term_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("ttf"))
        .map_batches(lambda b: b.rename_columns(["term", "n"]), batch_format="pyarrow")
        .sort(["n", "term"], descending=[True, False])
        .limit(vocab_cap)
        .take_all()
    )
    segs = [list(r["term"]) for r in rows]
    freqs = [int(r["n"]) for r in rows]
    out_rank, out_l, out_r, out_f = [], [], [], []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for seg, f in zip(segs, freqs):
            for i in range(len(seg) - 1):
                p = (seg[i], seg[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (lhs, rhs), freq = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out_rank.append(rank)
        out_l.append(lhs)
        out_r.append(rhs)
        out_f.append(freq)
        merged = lhs + rhs
        for w, seg in enumerate(segs):
            if lhs not in seg:
                continue
            new: list[str] = []
            i = 0
            while i < len(seg):
                if i + 1 < len(seg) and seg[i] == lhs and seg[i + 1] == rhs:
                    new.append(merged)
                    i += 2
                else:
                    new.append(seg[i])
                    i += 1
            segs[w] = new
    return pa.table(
        {
            "merge_rank": pa.array(out_rank, pa.int64()),
            "lhs": pa.array(out_l, pa.string()),
            "rhs": pa.array(out_r, pa.string()),
            "freq": pa.array(out_f, pa.int64()),
        }
    )


def bpe_segment(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply trained merges to one word in rank order (the tokenizer side of
    bpe_train_ds; same greedy left-to-right pass per rule)."""
    seg = list(word)
    for lhs, rhs in merges:
        new: list[str] = []
        i = 0
        while i < len(seg):
            if i + 1 < len(seg) and seg[i] == lhs and seg[i + 1] == rhs:
                new.append(lhs + rhs)
                i += 2
            else:
                new.append(seg[i])
                i += 1
        seg = new
    return seg


def bpe_replace_count(word: str, merges: list[tuple[str, str]]) -> int:
    """Token count of ``word`` under the trained merges, computed on the
    double-space-delimited piece string — the EXACT semantics the SQL
    oracle's chained ``replace()`` calls implement.

    Representation: ``' a  b  c '`` — every piece carries ONE space on each
    side, so pieces are separated by exactly two spaces. A merge (l, r)
    rewrites ``' l  r '`` → ``' lr '``: the pattern's outer single spaces can
    only match complete pieces (a piece mid-word is never space-adjacent),
    and the replacement restores them, so the invariant survives every
    rewrite and ``str.replace``'s left-to-right non-overlapping scan is
    precisely the greedy token-level pass of :func:`bpe_segment` — the
    equivalence is property-tested against random words in
    ``tests/test_new_op_properties.py``. Final token count = number of
    double-space separators + 1."""
    if not word:
        return 0
    s = " " + "  ".join(word) + " "
    for lhs, rhs in merges:
        s = s.replace(f" {lhs}  {rhs} ", f" {lhs}{rhs} ")
    return s.count("  ") + 1


class BpeEncoder:
    """Distributed tokenizer application: the trained merge table rides the
    object store once per actor; per batch the text is tokenized, the token
    column dictionary-encoded, and merges are applied ONCE per distinct
    word (memoized across batches in the actor — the per-actor cache is the
    point of the actor pool: at corpus scale each worker segments the
    vocabulary it sees once, not the token stream)."""

    def __init__(self, merges_ref):
        import ray

        self.merges = (
            ray.get(merges_ref) if not isinstance(merges_ref, list) else merges_ref
        )
        self.cache: dict[str, int] = {}

    def _count(self, word: str) -> int:
        c = self.cache.get(word)
        if c is None:
            c = self.cache[word] = bpe_replace_count(word, self.merges)
        return c

    def __call__(self, batch: pa.Table) -> pa.Table:
        parents, tokens = tokenize_flat(batch["text"])
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_words": pa.array([], pa.int64()),
                "n_bpe": pa.array([], pa.int64()),
            }
        )
        if len(parents) == 0:
            return empty
        toks = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
        d = toks.dictionary_encode()
        # merge application runs over the batch's DISTINCT words only
        lens = np.fromiter(
            (self._count(w) for w in d.dictionary.to_pylist()),
            dtype=np.int64,
            count=len(d.dictionary),
        )
        per_tok = lens[d.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
        n_rows = batch.num_rows
        n_bpe = np.bincount(parents, weights=per_tok, minlength=n_rows).astype(np.int64)
        n_words = np.bincount(parents, minlength=n_rows).astype(np.int64)
        keep = n_words > 0  # zero-token docs don't appear (mirrors the SQL)
        return pa.table(
            {
                "doc_id": pc.cast(_ids(batch), pa.int64()).filter(pa.array(keep)),
                "n_words": pa.array(n_words[keep]),
                "n_bpe": pa.array(n_bpe[keep]),
            }
        )


def bpe_encode_ds(sf_dir: str, n_merges: int = 8, vocab_cap: int = 100):
    """Apply :func:`bpe_train_ds`'s merges to the whole corpus: per doc
    ``(doc_id, n_words, n_bpe)`` — the word count and the total BPE token
    count after the merges. Train-then-apply in one call: training is the
    answer-bounded driver loop over the capped word table; application is a
    streaming actor-pool pass with the merge list broadcast via ray.put."""
    import ray

    tbl = bpe_train_ds(sf_dir, n_merges=n_merges, vocab_cap=vocab_cap)
    merges = list(zip(tbl["lhs"].to_pylist(), tbl["rhs"].to_pylist()))
    ref = ray.put(merges)
    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        BpeEncoder,
        fn_constructor_kwargs={"merges_ref": ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------- TextRank

# Corpus-level TextRank (Mihalcea & Tarau 2004): PageRank over the
# undirected adjacent-token co-occurrence graph, the classic
# graph-centrality keyword extractor (complements txt_keywords' tf-idf).
# All arithmetic is INTEGER — ranks live in micro-units (UNIT = 1e12),
# each node's outflow is rank // degree (floor division) and the damping
# update is (15·UNIT)//100 + (85·inflow)//100 — so every groupby sum is an
# exact int64 sum (order-free) and Ray and the unrolled DuckDB mirror
# agree bit-for-bit; no float summation order to defend.

TEXTRANK_UNIT = 10**12


def _textrank_edge_partial(batch: pa.Table) -> pa.Table:
    """Per-batch DISTINCT undirected co-occurrence edges, both directions.
    The combiner: the shuffle carries one row per distinct directed edge
    per batch, never one per occurrence."""
    parents, tokens = tokenize_flat(batch["text"])
    m = len(parents)
    empty = pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
    if m < 2:
        return empty
    valid = pa.array(parents[1:] == parents[:-1])
    a = tokens.slice(0, m - 1).filter(valid)
    b = tokens.slice(1, m).filter(valid)
    neq = pc.not_equal(a, b)
    a, b = a.filter(neq), b.filter(neq)
    if len(a) == 0:
        return empty
    t = pa.table(
        {
            "src": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a,
                                     b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b]),
            "dst": pa.concat_arrays([b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b,
                                     a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a]),
        }
    )
    return t.group_by(["src", "dst"], use_threads=False).aggregate([])


def _textrank_contrib_partial(batch: pa.Table) -> pa.Table:
    """(src, dst, d, r) join rows → per-batch partial inflow by dst."""
    d = batch["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    r = batch["r"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = pa.table({"dst": batch["dst"], "c": pa.array(r // d)})
    agg = t.group_by(["dst"], use_threads=False).aggregate([("c", "sum")])
    return pa.table(
        {"dst": pc.cast(agg["dst"], pa.string()), "s": pc.cast(agg["c_sum"], pa.int64())}
    )


def textrank_ds(sf_dir: str, k: int = 50, iters: int = 5,
                num_partitions: int = 8,
                small_graph_edges: int = 500_000) -> pa.Table:
    """(term, rank): the k most central terms of the corpus co-occurrence
    graph after ``iters`` integer-PageRank rounds, ranked (rank desc,
    term asc).

    Scale shape (the dd_clusters label-propagation story): the edge list
    and the rank table BOTH stay distributed Datasets end to end — each
    round is one hash join (edges ⋈ ranks on src, Ray Data's shuffling
    join) + per-batch partial inflow sums + a groupby(dst) int64 Sum; the
    driver never holds anything vocabulary-sized. Every node of the
    symmetric graph has degree ≥ 1, so the inner join is total. The final
    top-k cut is per-block (the comparator (rank desc, term asc) is a
    total order — block winners are a superset of the global winners),
    driver merge sees blocks×k rows. Int64 bound: 85·Σ inflow per node
    ≤ 85·N·UNIT — fine through vocabularies of 10^5; beyond that drop
    UNIT to 1e9 (documented, same semantics)."""
    from ray.data.aggregate import Count, Sum

    edges = (
        _docs_ds(sf_dir, ["text"])
        .map_batches(_textrank_edge_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby(["src", "dst"])
        .aggregate(Count())
        .select_columns(["src", "dst"])
        .materialize()  # the distinct edge list is reused by deg, the join
        # and every round — without this the corpus tokenize re-runs per use
    )
    deg = (
        edges.groupby("src")
        .aggregate(Count())
        .map_batches(
            lambda b: pa.table(
                {"src": pc.cast(b["src"], pa.string()),
                 "d": pc.cast(b["count()"], pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )
    from .joins import bucket_join

    edges_deg = bucket_join(
        edges, deg, on=("src",), key_types={"src": pa.string()},
        left_cols={"dst": pa.string()}, right_cols={"d": pa.int64()},
        num_buckets=num_partitions * 4,
    ).materialize()
    n_edges = edges_deg.count()
    if n_edges == 0:
        return pa.table({"term": pa.array([], pa.string()),
                         "rank": pa.array([], pa.int64())})
    if n_edges <= small_graph_edges:
        # small-graph fast path: below the DECLARED threshold the edge
        # list is answer-small — collect it once and run the identical
        # integer rounds locally (graphrank.integer_pagerank_local); the
        # distributed rounds' per-round join/groupby latency would dwarf
        # the work. Same integers by construction, pytest-gated.
        from .graphrank import integer_pagerank_local

        et = pa.Table.from_pylist(
            edges_deg.select_columns(["src", "dst"]).take_all()
        )
        srcs = et["src"].to_numpy(zero_copy_only=False)
        dsts = et["dst"].to_numpy(zero_copy_only=False)
        nodes, codes = np.unique(np.concatenate([srcs, dsts]), return_inverse=True)
        sc, dc = codes[: len(srcs)], codes[len(srcs):]
        r = integer_pagerank_local(sc, dc, len(nodes), iters, TEXTRANK_UNIT)
        order = np.lexsort((nodes, -r))[:k]
        return pa.table(
            {"term": pa.array(nodes[order], pa.string()),
             "rank": pa.array(r[order])}
        )
    ranks = deg.map_batches(
        lambda b: pa.table(
            {"src": b["src"],
             "r": pa.array(np.full(b.num_rows, TEXTRANK_UNIT, np.int64))}
        ),
        batch_format="pyarrow",
    ).materialize()
    base = (15 * TEXTRANK_UNIT) // 100
    for _ in range(iters):
        ranks = (
            bucket_join(
                edges_deg, ranks, on=("src",), key_types={"src": pa.string()},
                left_cols={"dst": pa.string(), "d": pa.int64()},
                right_cols={"r": pa.int64()},
                num_buckets=num_partitions * 4,
            )
            .map_batches(_textrank_contrib_partial, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("s"))
            .map_batches(
                lambda b: pa.table(
                    {
                        "src": pc.cast(b["dst"], pa.string()),
                        "r": pa.array(
                            base
                            + (85 * b[b.schema.names[-1]].to_numpy(
                                zero_copy_only=False).astype(np.int64)) // 100
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )

    def block_topk(b: pa.Table) -> pa.Table:
        r = b["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        terms = b["src"].to_numpy(zero_copy_only=False)
        order = np.lexsort((terms, -r))[:k]
        return pa.table(
            {"term": pa.array(terms[order], pa.string()),
             "rank": pa.array(r[order])}
        )

    rows = ranks.map_batches(block_topk, batch_format="pyarrow").take_all()
    rows.sort(key=lambda x: (-int(x["rank"]), x["term"]))
    rows = rows[:k]
    return pa.table(
        {
            "term": pa.array([x["term"] for x in rows], pa.string()),
            "rank": pa.array([int(x["rank"]) for x in rows], pa.int64()),
        }
    )


# ------------------------------------------------ DSIR importance weights

# Data Selection via Importance Resampling (Xie et al. 2023): score every
# document by how much more likely its tokens are under a TARGET domain's
# hashed-unigram LM than under the rest-of-corpus LM —
# w(doc) = Σ_tok ln( p_target(feature(tok)) / p_rest(feature(tok)) ),
# Laplace-smoothed. Features are token hashes modulo a FIXED bucket count
# (the paper's hashed n-gram trick), so the two count profiles are
# constant-size (n_buckets ints) regardless of corpus or vocabulary size —
# the broadcast side never grows, which is the whole scale story: pass 1
# is a term-stats-style partial count aggregate, pass 2 a stateless
# map_batches against the broadcast ln-ratio table. Weighted sampling on
# top of these weights = weighted_sample_ds's machinery.

DSIR_BUCKETS = 8192


def _dsir_partial(batch: pa.Table, target_source: str, n_buckets: int) -> pa.Table:
    """Per-batch partial: (bucket, ct, cr) counts of token-feature hits in
    target-source docs vs the rest; only non-zero buckets travel."""
    parents, tokens = tokenize_flat(batch["text"])
    empty = pa.table(
        {"bucket": pa.array([], pa.int64()), "ct": pa.array([], pa.int64()),
         "cr": pa.array([], pa.int64())}
    )
    if len(parents) == 0:
        return empty
    f = (fnv1a64(tokens) % np.uint64(n_buckets)).astype(np.int64)
    is_t = pc.equal(batch["source"], pa.scalar(target_source)).to_numpy(
        zero_copy_only=False
    )[parents]
    ct = np.bincount(f[is_t], minlength=n_buckets)
    cr = np.bincount(f[~is_t], minlength=n_buckets)
    nz = np.flatnonzero((ct > 0) | (cr > 0))
    return pa.table(
        {"bucket": pa.array(nz.astype(np.int64)), "ct": pa.array(ct[nz]),
         "cr": pa.array(cr[nz])}
    )


class DsirScorer:
    """Pass-2 stage: ln-ratio table from the object store once per actor;
    per-doc weight = one bincount over the doc's feature hits."""

    def __init__(self, lnr_ref, n_buckets: int):
        import ray

        self.lnr = ray.get(lnr_ref) if not isinstance(lnr_ref, np.ndarray) else lnr_ref
        self.n_buckets = n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        parents, tokens = tokenize_flat(batch["text"])
        n_rows = batch.num_rows
        ntok = token_counts(parents, n_rows).astype(np.int64)
        w = np.zeros(n_rows, dtype=np.float64)
        if len(parents):
            f = (fnv1a64(tokens) % np.uint64(self.n_buckets)).astype(np.int64)
            w = np.bincount(parents, weights=self.lnr[f], minlength=n_rows)
        return pa.table(
            {
                "doc_id": pc.cast(_ids(batch), pa.int64()),
                "n_tokens": pa.array(ntok),
                "dsir_weight": pa.array(np.round(w, 6), type=pa.float64()),
            }
        )


def dsir_weights_ds(sf_dir: str, target_source: str,
                    n_buckets: int = DSIR_BUCKETS):
    """(doc_id, n_tokens, dsir_weight) for every document.

    Determinism: counts are exact ints; each feature's ln-ratio is ONE
    fp64 expression evaluated identically in SQL (same parenthesization);
    per-doc sums round at 6dp (the charlm/PMI precedent)."""
    import ray
    from ray.data.aggregate import Sum

    rows = (
        _docs_ds(sf_dir, ["text", "source"])
        .map_batches(
            lambda b: _dsir_partial(b, target_source, n_buckets),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby("bucket")
        .aggregate(Sum("ct"), Sum("cr"))
        .take_all()
    )  # ≤ n_buckets rows by construction — a declared constant
    ct = np.zeros(n_buckets, dtype=np.int64)
    cr = np.zeros(n_buckets, dtype=np.int64)
    for r in rows:
        ct[int(r["bucket"])] = int(r["sum(ct)"])
        cr[int(r["bucket"])] = int(r["sum(cr)"])
    nt, nr = int(ct.sum()), int(cr.sum())
    lnr = np.log(
        ((ct + 1.0) / (nt + float(n_buckets)))
        / ((cr + 1.0) / (nr + float(n_buckets)))
    )
    ref = ray.put(lnr)
    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        DsirScorer,
        fn_constructor_kwargs={"lnr_ref": ref, "n_buckets": n_buckets},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    )


# ------------------------------------------------------------ triangle counts


def _lex_edges_ds(sf_dir: str):
    """DISTINCT lexicographically oriented (u < v) co-occurrence edges as a
    Dataset (the textrank_ds adjacent-token edge definition)."""

    def orient(b: pa.Table) -> pa.Table:
        m = pc.less(b["src"], b["dst"])
        return pa.table(
            {"u": pc.cast(b["src"].filter(m), pa.string()),
             "v": pc.cast(b["dst"].filter(m), pa.string())}
        )

    from ray.data.aggregate import Count

    return (
        _docs_ds(sf_dir, ["text"])
        .map_batches(_textrank_edge_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby(["src", "dst"])
        .aggregate(Count())
        .map_batches(orient, batch_format="pyarrow")
    )


def triangle_counts_ds(sf_dir: str, num_partitions: int = 8,
                       small_graph_edges: int = 500_000) -> pa.Table:
    """(term, triangles): per-term triangle participation counts of the
    corpus co-occurrence graph (graph-clustering signal — the local
    clustering coefficient's numerator; terms in no triangle are omitted).

    Scale shape: wedges are enumerated at each triangle's lowest-degree
    vertex (degree-ordered orientation — wedge mass Σ d⁺² is bounded by
    the graph degeneracy, the standard hot-node mitigation) and closed by
    a hash join against the lex-oriented edge set; edges, wedges and
    closures all stay distributed (two Dataset self-joins + one groupby).
    The per-vertex count is orientation-invariant, so the DuckDB mirror
    may use plain lexicographic wedges — outputs are defined equal. Below
    ``small_graph_edges`` the identical integers come from the vectorized
    local kernel (graphrank.triangle_counts_local, pytest-gated)."""
    from ray.data.aggregate import Count

    lex = _lex_edges_ds(sf_dir).materialize()
    n_edges = lex.count()
    empty = pa.table({"term": pa.array([], pa.string()),
                      "triangles": pa.array([], pa.int64())})
    if n_edges == 0:
        return empty
    if n_edges <= small_graph_edges:
        from .graphrank import triangle_counts_local

        et = pa.Table.from_pylist(lex.take_all())
        us = et["u"].to_numpy(zero_copy_only=False)
        vs = et["v"].to_numpy(zero_copy_only=False)
        nodes, codes = np.unique(np.concatenate([us, vs]), return_inverse=True)
        tri = triangle_counts_local(codes[: len(us)], codes[len(us):], len(nodes))
        keep = tri > 0
        return pa.table(
            {"term": pa.array(nodes[keep], pa.string()),
             "triangles": pa.array(tri[keep])}
        )

    # distributed path: degree-ordered orientation
    deg = lex.map_batches(
        lambda b: pa.table(
            {"t": pa.concat_arrays([b["u"].combine_chunks(), b["v"].combine_chunks()]),
             "n": pa.array(np.ones(2 * b.num_rows, np.int64))}
        ),
        batch_format="pyarrow",
    ).groupby("t").aggregate(Count())
    def _norm_deg(b: pa.Table) -> pa.Table:
        # empty groupby blocks can carry a degraded schema; the hash joins
        # resolve key columns by name, so normalize every block
        if b.num_rows == 0 or "t" not in b.schema.names:
            return pa.table({"t": pa.array([], pa.string()),
                             "d": pa.array([], pa.int64())})
        return pa.table({"t": pc.cast(b["t"], pa.string()),
                         "d": pc.cast(b[b.schema.names[-1]], pa.int64())})

    deg = deg.map_batches(_norm_deg, batch_format="pyarrow")
    from .joins import bucket_join

    deg_v = deg.map_batches(
        lambda b: pa.table({"t": b["t"], "d_v": b["d"]}), batch_format="pyarrow"
    )
    e1 = bucket_join(
        lex, deg, on=("u",), right_on=("t",), key_types={"u": pa.string()},
        left_cols={"v": pa.string()}, right_cols={"d": pa.int64()},
        num_buckets=num_partitions * 4,
    )
    e2 = bucket_join(
        e1, deg_v, on=("v",), right_on=("t",), key_types={"v": pa.string()},
        left_cols={"u": pa.string(), "d": pa.int64()},
        right_cols={"d_v": pa.int64()},
        num_buckets=num_partitions * 4,
    )

    def orient_deg(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "u" not in b.schema.names:
            return pa.table({"s": pa.array([], pa.string()),
                             "t": pa.array([], pa.string())})
        du = b["d"].to_numpy(zero_copy_only=False)
        dv = b["d_v"].to_numpy(zero_copy_only=False)
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        fwd = (du < dv) | ((du == dv) & (u < v))
        return pa.table(
            {"s": pa.array(np.where(fwd, u, v), pa.string()),
             "t": pa.array(np.where(fwd, v, u), pa.string())}
        )

    oriented = e2.map_batches(orient_deg, batch_format="pyarrow").materialize()
    def _as_right(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "s" not in b.schema.names:
            return pa.table({"s": pa.array([], pa.string()),
                             "t2": pa.array([], pa.string())})
        return pa.table({"s": b["s"], "t2": b["t"]})

    right = oriented.map_batches(_as_right, batch_format="pyarrow")
    def canon_wedge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "t" not in b.schema.names:
            return pa.table({"x": pa.array([], pa.string()),
                             "y": pa.array([], pa.string()),
                             "w": pa.array([], pa.string())})
        t = b["t"].to_numpy(zero_copy_only=False)
        t2 = b["t2"].to_numpy(zero_copy_only=False)
        s = b["s"].to_numpy(zero_copy_only=False)
        keep = t != t2  # each unordered wedge appears twice; keep one half
        lt = t < t2
        keep &= lt  # (t, t2) and (t2, t) both occur — the lt copy survives
        return pa.table(
            {"x": pa.array(t[keep], pa.string()),
             "y": pa.array(t2[keep], pa.string()),
             "w": pa.array(s[keep], pa.string())}
        )

    # many-to-many wedge enumeration: bucket_join emits every matching
    # pair (repeat/arange expansion), exactly like the hash join did
    wedges = bucket_join(
        oriented, right, on=("s",), key_types={"s": pa.string()},
        left_cols={"t": pa.string()}, right_cols={"t2": pa.string()},
        num_buckets=num_partitions * 4,
    ).map_batches(canon_wedge, batch_format="pyarrow")
    closed = bucket_join(
        wedges, lex, on=("x", "y"), right_on=("u", "v"),
        key_types={"x": pa.string(), "y": pa.string()},
        left_cols={"w": pa.string()}, right_cols={},
        num_buckets=num_partitions * 4,
    )
    def _verts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "w" not in b.schema.names:
            return pa.table({"term": pa.array([], pa.string())})
        return pa.table(
            {"term": pa.concat_arrays([
                b["w"].combine_chunks(), b["x"].combine_chunks(),
                b["y"].combine_chunks()])}
        )

    verts = closed.map_batches(_verts, batch_format="pyarrow")
    agg = verts.groupby("term").aggregate(Count())
    rows = agg.take_all()
    if not rows:
        return empty
    t = pa.Table.from_pylist(rows)
    return pa.table(
        {"term": pc.cast(t["term"], pa.string()),
         "triangles": pc.cast(t["count()"], pa.int64())}
    )


# ------------------------------------------------- lexical diversity / Heaps


def source_ttr_ds(sf_dir: str):
    """(source, n_tokens, n_types, ttr): per-source token count, distinct
    term count and type-token ratio (lexical-diversity curation signal).
    Per-batch partial (source, term) distinct + token partials → two small
    groupbys; ttr = one fp64 division of exact ints (round 6)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        parents, tokens = tokenize_flat(batch["text"])
        src = batch["source"].to_numpy(zero_copy_only=False)
        toks = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
        t = pa.table(
            {"source": pa.array(src[parents], pa.string()),
             "term": pc.cast(toks, pa.string())}
        )
        g = t.group_by(["source", "term"], use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(["source", "term", "n"])

    pairs = (
        _docs_ds(sf_dir, ["source", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "term"])
        .aggregate(Sum("n"))
        .materialize()  # reused by both reductions below
    )
    types = pairs.groupby("source").aggregate(Count())
    toks = pairs.map_batches(
        lambda b: pa.table(
            {"source": pc.cast(b["source"], pa.string()),
             "n": pc.cast(b[b.schema.names[-1]], pa.int64())}
        ),
        batch_format="pyarrow",
    ).groupby("source").aggregate(Sum("n"))
    tt = {str(r["source"]): int(r["sum(n)"]) for r in toks.take_all()}
    rows = types.take_all()  # answer-sized: one row per source
    srcs = sorted(str(r["source"]) for r in rows)
    ty = {str(r["source"]): int(r["count()"]) for r in rows}
    return pa.table(
        {
            "source": pa.array(srcs, pa.string()),
            "n_tokens": pa.array([tt[s] for s in srcs], pa.int64()),
            "n_types": pa.array([ty[s] for s in srcs], pa.int64()),
            "ttr": pa.array(
                [round(ty[s] / tt[s], 6) for s in srcs], pa.float64()
            ),
        }
    )


GROWTH_BUCKET_DOCS = 1 << 20  # docs per prefix-sum bucket


def vocab_growth_ds(sf_dir: str, bucket_docs: int = GROWTH_BUCKET_DOCS):
    """(doc_id, new_types, vocab_size): the corpus vocabulary-growth curve
    in doc_id order (Heaps' law audit — sublinear growth is the healthy
    shape; a linear tail flags unbounded noise/IDs). Distribution: per-term
    FIRST doc via term-stats-style partials (term, min doc) → groupby Min —
    the shuffle carries one row per distinct term per batch. The running
    vocab total is a DISTRIBUTED two-phase prefix sum (the token-packing
    precedent): bucket by doc_id range, driver holds only the per-bucket
    totals (n_docs / bucket_docs entries), exclusive bucket offsets are
    broadcast once, and each bucket's within-group cumsum runs in
    groupby(bucket).map_groups. Returns a Dataset — one row per doc that
    introduces new vocabulary, never collected on the driver."""
    import ray
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        parents, tokens = tokenize_flat(batch["text"])
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
        t = pa.table({"term": pc.cast(toks, pa.string()),
                      "doc": pa.array(ids[parents])})
        g = t.group_by(["term"], use_threads=False).aggregate([("doc", "min")])
        return g.rename_columns(["term", "doc"])

    firsts = (
        _docs_ds(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Min("doc"))
    )

    def _per_doc(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "term" not in b.schema.names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        ids = b[b.schema.names[-1]].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(ids),
             "n": pa.array(np.ones(b.num_rows, np.int64)),
             "bucket": pa.array(ids // bucket_docs)}
        )

    per_doc = (
        firsts.map_batches(_per_doc, batch_format="pyarrow")
        .groupby(["doc_id", "bucket"])
        .aggregate(Sum("n"))
        .map_batches(
            lambda b: pa.table(
                {"doc_id": pc.cast(b["doc_id"], pa.int64()),
                 "bucket": pc.cast(b["bucket"], pa.int64()),
                 "n": pc.cast(b[b.schema.names[-1]], pa.int64())}
            ) if b.num_rows and "doc_id" in b.schema.names else pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "bucket": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .materialize()  # consumed twice: bucket totals + the cumsum pass
    )
    # phase 1: per-bucket totals — the ONLY driver-side state
    # (n_docs / bucket_docs entries)
    totals: dict[int, int] = {}
    for b in (
        per_doc.groupby("bucket").aggregate(Sum("n"))
        .iter_batches(batch_format="pyarrow")
    ):
        if b.num_rows and "bucket" in b.schema.names:
            for bk, n in zip(
                b["bucket"].to_numpy(zero_copy_only=False),
                b[b.schema.names[-1]].to_numpy(zero_copy_only=False),
            ):
                totals[int(bk)] = totals.get(int(bk), 0) + int(n)
    offs: dict[int, int] = {}
    acc = 0
    for bk in sorted(totals):
        offs[bk] = acc
        acc += totals[bk]
    off_ref = ray.put(offs)

    def _finish(g: pa.Table, ref=off_ref) -> pa.Table:
        offsets = ray.get(ref) if not isinstance(ref, dict) else ref
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        ids, n = ids[order], n[order]
        base = offsets[int(g["bucket"][0].as_py())]
        return pa.table(
            {"doc_id": pa.array(ids), "new_types": pa.array(n),
             "vocab_size": pa.array(base + np.cumsum(n))}
        )

    return per_doc.groupby("bucket").map_groups(_finish, batch_format="pyarrow")

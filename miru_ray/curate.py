"""Composed pre-training curation pipeline: the standard LLM data recipe —
quality gate → language gate → repetition gate → benchmark decontamination →
exact dedup — as ONE streaming Ray Data pipeline with a per-document verdict.

Every signal the recipe thresholds on already exists as a standalone operator
(textstats.quality_ds / langid_ds / repetition_ds / decontaminate_ds,
dedup.exact_dedup_ds); this module is the composition a real curation run
would deploy, engineered so composing them costs ONE corpus pass instead of
five:

- **One read, one tokenize.** A single ``map_batches`` stage computes token
  counts, language-marker hits, bigram-repetition fractions and the k-gram
  contamination hits from ONE ``tokenize_flat`` call per batch. The text
  column is read once and never leaves the task.
- **The eval-slice gram set is broadcast once** (``ray.put`` →
  fetched per actor in ``__init__``), exactly like the standalone
  decontaminator (textstats.DecontamStage).
- **Nothing text-sized ever shuffles.** The only exchange is the exact-dedup
  groupby, and it carries fixed-width signal rows (~60 B/doc — doc_id, four
  small stats, a 64-bit text hash), ~10³× smaller than the corpus. Batch-local
  duplicate losers are eliminated BEFORE the exchange (a doc that loses to a
  smaller doc_id in its own batch can never be the global keeper), so
  duplicate-heavy corpora — the case where dedup matters — shrink in the
  partial, mirroring dedup._exact_partial's scale story.
- Dedup compares 64-bit FNV-1a text hashes, not text (the top_ngrams_ds
  acceptance: a 2⁻⁶⁴-scale collision would merge two dedup groups).

Verdict = the FIRST failing stage in the fixed order
``quality → language → repetition → contaminated → duplicate``, else
``kept``. Exact dedup therefore applies only among documents that passed
every per-document gate (the conventional recipe order: don't waste the
dedup exchange on documents already rejected), and the keeper of each
duplicate group is the smallest surviving doc_id. Documents with
``doc_id < eval_max_doc_id`` are the held-out eval slice (the contamination
reference) and are not curated — the output covers training docs only.

This is beyond the reference's own operator set (it has no corpus-curation
path); it composes the engine's training-data operators the way a 100-TB
pre-training pipeline would run them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import fnv1a64
from .textstats import (
    LANG_MARKERS,
    LANG_ORDER,
    _docs_ds,
    _ids,
    _ngram_doc_stats,
    eval_gram_set,
)
from .tokenize import token_counts, tokenize_flat

# verdicts in gate order; 'kept' is the survivor class
CURATE_VERDICTS = (
    "quality",
    "language",
    "repetition",
    "contaminated",
    "duplicate",
    "kept",
)


class CurateStage:
    """Actor-pool stage: every per-document curation signal from one
    tokenize pass, plus the batch-local exact-dedup partial. The broadcast
    eval-slice gram array is fetched from the object store once per actor."""

    def __init__(
        self,
        eval_ref,
        k: int,
        min_tokens: int,
        max_dup_bigram_frac: float,
        lang: str,
    ):
        import ray

        self.eval_grams = ray.get(eval_ref)  # sorted uint64
        self.k = k
        self.min_tokens = min_tokens
        self.max_dup = max_dup_bigram_frac
        self.lang = lang
        self.marker_sets = {
            l: pa.array(list(ms)) for l, ms in LANG_MARKERS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        ids = pc.cast(_ids(batch), pa.int64()).to_numpy(zero_copy_only=False)
        parents, tokens = tokenize_flat(batch["text"])
        tokens = (
            tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
        )
        n_tok = token_counts(parents, n_rows).astype(np.int64)

        # language-marker hits; first-max-wins over LANG_ORDER (= langid_ds)
        hits = np.zeros((n_rows, len(LANG_ORDER)), dtype=np.int64)
        for j, l in enumerate(LANG_ORDER):
            m = pc.is_in(tokens, value_set=self.marker_sets[l]).to_numpy(
                zero_copy_only=False
            )
            np.add.at(hits[:, j], parents, m.astype(np.int64))
        best = np.argmax(hits, axis=1)
        maxv = hits[np.arange(n_rows), best]
        pred = np.where(maxv > 0, np.array(LANG_ORDER, dtype=object)[best], "und")

        # bigram repetition fraction (= repetition_ds, n=2)
        total, dist, _ = _ngram_doc_stats(parents, tokens, n_rows, 2)
        dup_frac = np.where(total > 0, (total - dist) / np.maximum(total, 1), 0.0)

        # contamination: distinct k-gram hashes shared with the eval slice
        # (= textstats.DecontamStage)
        from .textstats import gram_hashes

        th = fnv1a64(tokens)
        gp, gh = gram_hashes(parents, th, self.k)
        n_hits = np.zeros(n_rows, dtype=np.int64)
        if len(gp) and len(self.eval_grams):
            order = np.lexsort((gh, gp))
            gp, gh = gp[order], gh[order]
            keep = np.concatenate([[True], (gp[1:] != gp[:-1]) | (gh[1:] != gh[:-1])])
            gp, gh = gp[keep], gh[keep]
            idx = np.searchsorted(self.eval_grams, gh)
            idx[idx == len(self.eval_grams)] = 0
            hit = self.eval_grams[idx] == gh
            if hit.any():
                np.add.at(n_hits, gp[hit], 1)

        # first failing gate (dedup is decided after the exchange)
        verdict = np.select(
            [
                n_tok < self.min_tokens,
                pred != self.lang,
                dup_frac > self.max_dup,
                n_hits > 0,
            ],
            ["quality", "language", "repetition", "contaminated"],
            default="kept",  # provisional: the dedup group may demote it
        ).astype(object)

        # batch-local dedup partial over gate survivors: a doc that loses to
        # a smaller doc_id in its own batch can never be the global keeper —
        # finalize it here so only one candidate per (batch, text) shuffles
        cand = verdict == "kept"
        thash = fnv1a64(batch["text"]).view(np.int64)
        pass_idx = np.flatnonzero(cand)
        if len(pass_idx):
            ph, pid = thash[pass_idx], ids[pass_idx]
            order = np.lexsort((pid, ph))
            first = np.concatenate([[True], ph[order][1:] != ph[order][:-1]])
            losers = pass_idx[order[~first]]
            verdict[losers] = "duplicate"
            cand[losers] = False

        # group key: text hash for candidates (dedup groups); the doc's own
        # id for finalized rows (singleton pass-through groups)
        gkey = np.where(cand, thash, ids)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_tokens": pa.array(n_tok),
                "pred_lang": pa.array(pred.tolist(), type=pa.string()),
                "dup_bigram_frac": pa.array(dup_frac, type=pa.float64()),
                "n_contam_hits": pa.array(n_hits),
                "verdict": pa.array(verdict.tolist(), type=pa.string()),
                "cand": pa.array(cand.astype(np.int64)),
                "gkey": pa.array(gkey),
            }
        )


def _curate_group(group: pa.Table) -> pa.Table:
    """Resolve one dedup group: smallest doc_id keeps 'kept', the rest
    become 'duplicate'. Non-candidate groups (already finalized) pass
    through untouched."""
    out = group.drop_columns(["cand", "gkey"])
    if group.num_rows == 0 or not group["cand"][0].as_py():
        return out
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    verdict = np.where(ids == ids.min(), "kept", "duplicate")
    return out.set_column(
        out.schema.get_field_index("verdict"),
        "verdict",
        pa.array(verdict.tolist(), type=pa.string()),
    )


def curate_ds(
    sf_dir: str,
    eval_max_doc_id: int = 25,
    k: int = 4,
    min_tokens: int = 20,
    max_dup_bigram_frac: float = 0.08,
    lang: str = "en",
):
    """(doc_id, n_tokens, pred_lang, dup_bigram_frac, n_contam_hits,
    verdict) for every training document (doc_id ≥ eval_max_doc_id):
    the full curation recipe in one streaming pass + one row-sized
    dedup exchange. See the module docstring for the gate order and the
    scale story."""
    import ray

    # autoscale the stage to the cluster: a fixed small cap would serialize
    # the one corpus pass on big boxes
    max_actors = max(2, int(ray.cluster_resources().get("CPU", 8)) - 1)
    ref = ray.put(eval_gram_set(sf_dir, eval_max_doc_id, k))
    sig = (
        _docs_ds(sf_dir, ["doc_id", "text"])
        .filter(expr=f"doc_id >= {int(eval_max_doc_id)}")
        .map_batches(
            CurateStage,
            fn_constructor_kwargs={
                "eval_ref": ref,
                "k": k,
                "min_tokens": min_tokens,
                "max_dup_bigram_frac": max_dup_bigram_frac,
                "lang": lang,
            },
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, max_actors),
        )
    )
    return sig.groupby(["cand", "gkey"]).map_groups(
        _curate_group, batch_format="pyarrow"
    )

"""The Ray-Data-native inverted-index build pipeline.

Re-expresses the reference's index build path (SURVEY.md §3.2:
WAL-paged batches → dedupe → dense id allocation → per-field posting
compose → per-(field,term) bitmap set → LSM merge → ready watermark;
reference: miru-service/.../partition/MiruPartitionAccessor.java:398-474,
miru-service/.../stream/MiruIndexer.java:47-126,
MiruIndexPrimaryFields.java:52-92) as ONE Ray Data pipeline with a single
all-to-all exchange:

    read_parquet(transcripts, pruned columns)
      → map_batches(route_partition)          # part = fnv1a64(conv_id) % P
      → groupby("part").map_groups(SegmentBuilder)   # actor-pool stage
      → (tiny manifest dataset) → global index.json

``SegmentBuilder`` is the stateful merger stage of the north star: inside
one task it (a) stably sorts the partition by (conv_id, turn_idx) and
assigns dense docIds 0..n-1 — the reference's "doc id = position in stream
order" invariant (LabTimeIdIndex.java:96); (b) processes the partition in
bounded CHUNKS: vectorized tokenize → (term_key, docId, tf) triples via an
Arrow group_by → delta+varbyte encoded posting *runs* per chunk (the
combiner: triples never leave the task uncompressed); (c) two-stage merges
the per-chunk runs into final postings by offset subsampling (codec.merge_runs
— the Ray-native analogue of LAB append+compact,
MiruLocalHostedPartition.java:1083-1101); (d) writes the immutable segment,
manifest last (checkpoint with lineage + metrics → resumable restarts).

Scale / skew notes (SURVEY.md §4, §7.3-7.4):
* The only shuffle key is ``part`` (uniform by conversation hash; hot TERMS
  are not shuffle keys at all — a hot term just produces one encoded run per
  chunk, merged in O(bytes), which is the salted-groupby/two-stage-merge
  answer to term skew without a second exchange).
* Choose ``n_parts`` so one partition ≈ a few hundred MB of text (reference
  partitions hold "millions of ordered documents", README.md:12); at 100 TB
  that is tens of thousands of partitions, each an independent map_groups
  task → embarrassingly parallel across a cluster.
* A restarted build passes ``resume=True`` (default): rows of partitions
  with complete manifests are dropped at the ROUTE stage, before the
  shuffle, so finished work is never re-shuffled.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .codec import RUNS_SCHEMA, encode_triples_to_runs, merge_runs
from .hashing import fnv1a64
from .segments import (
    FORWARD_SCHEMA,
    META_FIELDS,
    TEXT_FIELD,
    completed_parts,
    term_key,
    write_global_manifest,
    write_segment,
)
from .tokenize import token_counts, tokenize_flat

INPUT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
CHUNK_DOCS = 65_536  # docs tokenized per in-task chunk (bounds triple memory)

MANIFEST_ROW_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("n_docs", pa.int64()),
        ("n_terms", pa.int64()),
        ("total_tokens", pa.int64()),
        ("posting_bytes", pa.int64()),
        ("build_sec", pa.float64()),
        ("skipped", pa.bool_()),
    ]
)


def route_partition(batch: pa.Table, n_parts: int, skip_parts: frozenset[int]) -> pa.Table:
    """Add the ``part`` routing column; drop rows of already-built partitions
    (resume path) before the shuffle."""
    part = (fnv1a64(batch["conv_id"]) % np.uint64(n_parts)).astype(np.int32)
    batch = batch.append_column("part", pa.array(part, type=pa.int32()))
    if skip_parts:
        keep = ~np.isin(part, np.fromiter(skip_parts, dtype=np.int32))
        if not keep.all():
            batch = batch.filter(pa.array(keep))
    return batch


def _ts_to_us(ts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    arr = ts.combine_chunks() if isinstance(ts, pa.ChunkedArray) else ts
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.timestamp("us")).cast(pa.int64())
    else:
        arr = arr.cast(pa.int64())
    return arr.to_numpy(zero_copy_only=False)


def build_segment_table(group: pa.Table, use_stopwords: bool = False):
    """Pure function: one partition's rows → (postings:pa.Table(RUNS_SCHEMA),
    forward:pa.Table, stats:dict). Deterministic regardless of input row
    order or chunking (the parallelism-invariance contract, FIXTURES.md F4.6).
    """
    # stable (conv_id, turn_idx) sort → dense docId assignment
    idx = pc.sort_indices(
        group, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    g = group.take(idx).combine_chunks()
    n = g.num_rows
    part = int(g["part"][0].as_py()) if "part" in g.schema.names and n else 0

    ts_us = _ts_to_us(g["ts"])
    doc_ids = np.arange(n, dtype=np.int64)

    run_tables: list[pa.Table] = []
    dl_all = np.zeros(n, dtype=np.int32)
    total_tokens = 0

    for lo in range(0, n, CHUNK_DOCS):
        hi = min(n, lo + CHUNK_DOCS)
        chunk = g.slice(lo, hi - lo)
        parents, tokens = tokenize_flat(chunk["text"], use_stopwords=use_stopwords)
        dl = token_counts(parents, hi - lo)
        dl_all[lo:hi] = dl
        total_tokens += int(dl.sum())

        # (term, doc, tf) via Arrow group_by (C++ hash aggregate — the
        # posting compose step, MiruIndexPrimaryFields.java:52-92);
        # term_key = "text\x1f" + token (vectorized concat)
        keys = pc.binary_join_element_wise(pa.scalar(TEXT_FIELD + "\x1f"), tokens, "")
        tt = pa.table({"term": keys, "doc": pa.array(parents + lo, type=pa.int64())})
        agg = tt.group_by(["term", "doc"], use_threads=False).aggregate([([], "count_all")])
        # sort by (term, doc)
        agg = agg.take(
            pc.sort_indices(agg, sort_keys=[("term", "ascending"), ("doc", "ascending")])
        ).combine_chunks()
        a_doc = agg["doc"].to_numpy(zero_copy_only=False)
        a_tf = agg["count_all"].to_numpy(zero_copy_only=False)
        a_dl = dl_all[a_doc]
        run_tables.append(
            encode_triples_to_runs(
                np.full(len(a_doc), part, dtype=np.int64),
                agg["term"].combine_chunks().cast(pa.large_string()),
                a_doc,
                a_tf,
                a_dl,
            )
        )

    # meta fields (role/tool/conv_id): single-term postings, tf=1
    for field in META_FIELDS:
        vals = g[field].combine_chunks() if isinstance(g[field], pa.ChunkedArray) else g[field]
        nonempty = pc.fill_null(pc.not_equal(pc.coalesce(vals, ""), ""), False)
        keep = nonempty.to_numpy(zero_copy_only=False)
        if not keep.any():
            continue
        keys = pc.binary_join_element_wise(
            pa.scalar(field + "\x1f"), vals.filter(nonempty), ""
        )
        docs = doc_ids[keep]
        t = pa.table({"term": keys, "doc": pa.array(docs)})
        t = t.take(
            pc.sort_indices(t, sort_keys=[("term", "ascending"), ("doc", "ascending")])
        ).combine_chunks()
        m_doc = t["doc"].to_numpy(zero_copy_only=False)
        run_tables.append(
            encode_triples_to_runs(
                np.full(len(m_doc), part, dtype=np.int64),
                t["term"].combine_chunks().cast(pa.large_string()),
                m_doc,
                np.ones(len(m_doc), dtype=np.int64),
                dl_all[m_doc],
            )
        )

    postings = merge_runs(pa.concat_tables(run_tables)) if run_tables else RUNS_SCHEMA.empty_table()
    # final order: sorted by term_key for parquet min/max pruning
    postings = postings.take(pc.sort_indices(postings, sort_keys=[("term", "ascending")]))

    forward = pa.table(
        {
            "doc_id": pa.array(doc_ids.astype(np.int32), type=pa.int32()),
            "conv_id": g["conv_id"],
            "turn_idx": pc.cast(g["turn_idx"], pa.int32()),
            "role": g["role"],
            "tool": g["tool"],
            "ts": pa.array(ts_us, type=pa.int64()),
            "dl": pa.array(dl_all, type=pa.int32()),
        },
        schema=FORWARD_SCHEMA,
    )
    stats = {
        "n_docs": int(n),
        "n_terms": int(postings.num_rows),
        "total_tokens": int(total_tokens),
        "avg_dl": float(total_tokens / n) if n else 0.0,
    }
    return postings, forward, stats


class SegmentBuilder:
    """Actor-pool map_groups stage: one call = one partition → one immutable
    segment on disk + one manifest row. Stateful per-actor setup happens once
    in __init__ (the actor-pool pattern for stateful stages)."""

    def __init__(self, index_dir: str, use_stopwords: bool = False, lineage: dict | None = None):
        self.index_dir = index_dir
        self.use_stopwords = use_stopwords
        self.lineage = lineage or {}

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        if group.num_rows == 0:
            return MANIFEST_ROW_SCHEMA.empty_table()
        part = int(group["part"][0].as_py())
        postings, forward, stats = build_segment_table(group, self.use_stopwords)
        posting_bytes = sum(
            postings[c].nbytes for c in ("doc_bytes", "tf_bytes")
        ) if postings.num_rows else 0
        metrics = dict(stats, posting_bytes=int(posting_bytes))
        write_segment(
            self.index_dir,
            part,
            postings,
            forward,
            lineage=dict(self.lineage, rows=int(group.num_rows)),
            metrics=metrics,
        )
        return pa.table(
            {
                "part": pa.array([part], type=pa.int32()),
                "n_docs": pa.array([stats["n_docs"]], type=pa.int64()),
                "n_terms": pa.array([stats["n_terms"]], type=pa.int64()),
                "total_tokens": pa.array([stats["total_tokens"]], type=pa.int64()),
                "posting_bytes": pa.array([int(posting_bytes)], type=pa.int64()),
                "build_sec": pa.array([time.monotonic() - t0], type=pa.float64()),
                "skipped": pa.array([False], type=pa.bool_()),
            },
            schema=MANIFEST_ROW_SCHEMA,
        )


def build_index(
    input_path: str | list[str],
    index_dir: str,
    n_parts: int,
    use_stopwords: bool = False,
    resume: bool = True,
    concurrency: int | None = None,
) -> dict:
    """Run the full build. Ray must already be initialised by the caller.

    Returns the global manifest dict (also written to index.json)."""
    import ray.data as rd

    done = frozenset(completed_parts(index_dir)) if resume else frozenset()
    lineage = {"input": input_path if isinstance(input_path, str) else list(input_path)}

    ds = rd.read_parquet(input_path, columns=INPUT_COLUMNS)
    ds = ds.map_batches(
        route_partition,
        fn_kwargs={"n_parts": n_parts, "skip_parts": done},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    builder_kwargs = {"index_dir": index_dir, "use_stopwords": use_stopwords, "lineage": lineage}
    if concurrency is None:
        import ray

        concurrency = max(2, int(ray.cluster_resources().get("CPU", 8)) - 2)
    manifest_ds = ds.groupby("part").map_groups(
        SegmentBuilder,
        fn_constructor_kwargs=builder_kwargs,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    rows = manifest_ds.take_all()  # tiny: one row per partition

    built = {int(r["part"]): r for r in rows}
    meta = {
        "version": 1,
        "n_parts": n_parts,
        "tokenizer": {"pattern": "[a-z0-9]+", "lowercase": True, "stopwords": use_stopwords},
        "text_field": TEXT_FIELD,
        "meta_fields": list(META_FIELDS),
        "parts_built": sorted(built),
        "parts_resumed": sorted(done),
        "totals": {
            "n_docs": sum(int(r["n_docs"]) for r in rows),
            "total_tokens": sum(int(r["total_tokens"]) for r in rows),
            "posting_bytes": sum(int(r["posting_bytes"]) for r in rows),
        },
    }
    write_global_manifest(index_dir, meta)
    return meta

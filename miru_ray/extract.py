"""Corpus extraction: an index answer joined back to the RAW input rows.

The index stores postings + forward metadata but never the text (the
build's core invariant: raw text never shuffles). A training pipeline
that wants "the text of every turn matching Q" therefore needs a join
from the answer back to the source parquet. At 100 TB that join must be:

- **answer-broadcast, not shuffle**: the matched key set is answer-sized
  (thousands..millions of 16-byte keys), so it is ``ray.put`` ONCE and
  each filter actor reads it once in ``__init__`` — the classic broadcast
  semi-join; the 100-TB side streams through ``read_parquet →
  map_batches`` untouched by any all-to-all.
- **vectorized**: membership is one ``pyarrow.compute.is_in`` per batch
  against the broadcast key array (hash set built once per actor).
- **streaming to a partitioned sink**: ``write_parquet`` on the filtered
  dataset; blocks flow with backpressure, nothing materializes.

The reference ships answers as id lists and leaves the text join to the
caller's store; this is that caller-side join done Ray-Data-first.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

KEY_SEP = "\x1f"


def _pack_keys(conv_id: pa.Array, turn_idx: pa.Array) -> pa.Array:
    """(conv_id, turn_idx) → one binary key column (the engine's packed-key
    idiom, vectorized)."""
    return pc.binary_join_element_wise(
        pc.cast(conv_id, pa.string()),
        pc.cast(pc.cast(turn_idx, pa.int64()), pa.string()),
        KEY_SEP,
    )


class SemiJoinStage:
    """Actor-pool membership filter: the broadcast key set is fetched and
    hashed ONCE per actor (``__init__``), then every batch is one
    vectorized ``is_in`` + filter."""

    def __init__(self, keys_ref, columns: list[str] | None):
        import ray

        self.keys = ray.get(keys_ref)  # pa.Array of packed keys
        self.columns = columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.is_in(
            _pack_keys(batch["conv_id"], batch["turn_idx"]), value_set=self.keys
        )
        out = batch.filter(mask)
        if self.columns is not None:
            out = out.select(self.columns)
        return out


BROADCAST_KEY_LIMIT = 2_000_000  # keys; ~100 MB of packed keys broadcast


def export_corpus(
    engine,
    query: str,
    source_dir: str,
    out_dir: str,
    columns: list[str] | None = None,
    time_range: tuple[int, int] | None = None,
    authz: tuple[str, list[str]] | None = None,
    concurrency=(1, 8),
    batch_size: int = 8192,
    broadcast_limit: int = BROADCAST_KEY_LIMIT,
    join_partitions: int = 32,
) -> dict:
    """Write every source row whose (conv_id, turn_idx) matches ``query``
    on ``engine`` to ``out_dir`` as parquet — text included. Returns
    {'matched': index answer size, 'rows': rows actually written,
    'out_dir': ...} — the two differ when the source holds duplicate or
    missing keys relative to what was indexed. Requires Ray (it IS the
    pipeline). ``out_dir`` must be empty/absent: Ray's parquet sink emits
    uniquely named files, so writing into a dir holding an earlier
    export's files would silently serve the union of both answers.

    Two scale regimes, chosen by a no-gather ``engine.count`` probe:

    * answer ≤ ``broadcast_limit``: the key set is built VECTORIZED per
      partition result (no per-row Python), ``ray.put`` once, and each
      filter actor hashes it once — the broadcast semi-join.
    * bigger answers NEVER touch the driver: ``engine.export_match``
      writes the answer keys as partitioned parquet (distributed,
      resumable), and the export becomes a hash-partitioned distributed
      inner join keys ⨝ source on (conv_id, turn_idx).

    When ``columns`` is given, the source scan reads ONLY those columns
    (plus the join keys) — projection pushed to the parquet reader."""
    import glob as _glob
    import os as _os

    import ray
    import ray.data as rd
    import pyarrow.parquet as _pq

    out_dir = _os.path.abspath(out_dir)
    if _glob.glob(_os.path.join(out_dir, "*.parquet")):
        raise FileExistsError(
            f"{out_dir} already holds parquet files — exports never append; "
            f"use a fresh out_dir"
        )
    read_columns = None
    if columns is not None:
        read_columns = sorted(set(columns) | {"conv_id", "turn_idx"})
    matched = engine.count(query, time_range=time_range, authz=authz)
    ds = rd.read_parquet(source_dir, columns=read_columns)
    if matched <= broadcast_limit:
        key_chunks: list[pa.Array] = []
        for r in engine.match(query, time_range=time_range, authz=authz):
            key_chunks.append(
                _pack_keys(
                    pa.array(r["conv_id"], pa.string()),
                    pa.array(r["turn_idx"], pa.int64()),
                )
            )
        keys = (
            pa.concat_arrays(key_chunks)
            if key_chunks
            else pa.array([], pa.string())
        )
        keys_ref = ray.put(keys)
        ds = ds.map_batches(
            SemiJoinStage,
            fn_constructor_kwargs={"keys_ref": keys_ref, "columns": columns},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
            zero_copy_batch=True,
        )
    else:
        # distributed path: answer keys as a Dataset (written by the
        # resumable distributed export — the driver holds nothing), then a
        # hash-partitioned inner join against the streaming source scan
        key_dir = _os.path.join(out_dir + ".keys")
        engine.export_match(query, key_dir, time_range=time_range, authz=authz)
        keys_ds = rd.read_parquet(key_dir, columns=["conv_id", "turn_idx"])
        from .joins import bucket_join

        sch = ds.schema()
        payload = {
            name: typ
            for name, typ in zip(sch.names, sch.types)
            if name not in ("conv_id", "turn_idx")
        }
        ds = bucket_join(
            ds, keys_ds, on=("conv_id", "turn_idx"),
            key_types={"conv_id": pa.string(),
                       "turn_idx": dict(zip(sch.names, sch.types))["turn_idx"]},
            left_cols=payload, right_cols={},
            num_buckets=join_partitions,
        )
        if columns is not None:
            ds = ds.select_columns(columns)
    # local:// + abspath: relative paths would resolve in each Ray worker's
    # cwd and multi-node runs would scatter blocks across nodes (the repo's
    # established sink convention, __main__.cmd_pipeline)
    ds.write_parquet("local://" + out_dir)
    written = sum(
        _pq.read_metadata(f).num_rows
        for f in _glob.glob(_os.path.join(out_dir, "*.parquet"))
    )
    return {"matched": matched, "rows": written, "out_dir": out_dir}


def highlight_hits(
    engine,
    query: str,
    hits,
    source_dir: str,
    pre: str = "<b>",
    post: str = "</b>",
    **hl_kwargs,
) -> dict:
    """Preview fragments for a PAGE of search hits — the reference's
    stored-field summary + highlighter composed
    (LuceneBackedQueryParser.java:56-74 over FullText.java:253-280's
    gathered fields). The engine's forward tables deliberately store no
    text, so the raw text is fetched from the source corpus with ONE
    filtered parquet read (the hit page is k-sized — driver-side, no Ray),
    then ``highlight.highlight`` runs per hit with the INDEX's analyzer
    and stopword setting (query/content analysis must match the build —
    the tokenizer equality contract). Returns {(conv_id, turn_idx):
    fragment-or-None} — None for hits whose terms don't highlight (blank
    summary) or whose source row is gone."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from .highlight import highlight
    from .search import _analyzer_name

    keys = [(h.conv_id, int(h.turn_idx)) for h in hits]
    if not keys:
        return {}
    convs = sorted({c for c, _ in keys})
    dset = pads.dataset(source_dir, format="parquet")
    t = dset.to_table(
        columns=["conv_id", "turn_idx", "text"],
        filter=pc.field("conv_id").isin(convs),
    )
    lut = {
        (c, int(i)): s
        for c, i, s in zip(
            t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(), t["text"].to_pylist()
        )
    }
    analyzer = _analyzer_name(engine.index_dir)
    use_stop = bool(engine.meta.get("tokenizer", {}).get("stopwords"))
    out = {}
    for k in keys:
        content = lut.get(k)
        out[k] = (
            None
            if content is None
            else highlight(
                query, content, pre=pre, post=post, analyzer=analyzer,
                use_stopwords=use_stop, **hl_kwargs,
            )
        )
    return out

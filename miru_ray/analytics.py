"""Aggregation pipelines mirroring the reference's analytics plugins.

Re-expresses the reference's plugin aggregations (SURVEY.md §2.6) as Ray
Data pipelines over the ``events`` table:

* **waveform** — time-bucketed counts per term
  (miru-analytics-plugins/.../Analytics.java:142-196 ``boundedCardinalities``):
  project a bucket id in map_batches, partial-count per batch, tiny groupby.
* **distinct count** — distinct terms among matching docs
  (miru-stream-plugins/.../count/DistinctCount.java:30-113): two-level
  groupby (dedup pairs, then count).
* **latest / first per term** — the reference's ``IndexLatest`` /
  ``IndexFirst`` partial aggregates maintained at index time
  (miru-service/.../stream/MiruIndexLatest.java): groupby(term).max/min.

Every stage pre-aggregates inside map_batches before the shuffle, so the
exchange carries one row per (key, batch) — not per event.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

BUCKET_US = 3_600_000_000  # 1 hour


def _events_ds(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def _ts_us(batch: pa.Table) -> np.ndarray:
    ts = batch["ts"].combine_chunks() if isinstance(batch["ts"], pa.ChunkedArray) else batch["ts"]
    return ts.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)


def _waveform_partial(batch: pa.Table) -> pa.Table:
    us = _ts_us(batch)
    bucket = (us // BUCKET_US) * (BUCKET_US // 1_000_000)  # epoch seconds of hour
    t = pa.table({"event_type": pc.cast(batch["event_type"], pa.string()), "bucket_ts": pa.array(bucket)})
    agg = t.group_by(["event_type", "bucket_ts"], use_threads=False).aggregate([([], "count_all")])
    return pa.table(
        {
            "event_type": agg["event_type"],
            "bucket_ts": agg["bucket_ts"],
            "n": pc.cast(agg["count_all"], pa.int64()),
        }
    )


def waveform_ds(sf_dir: str):
    """(event_type, bucket_ts [epoch-sec of hour], n) — the waveform."""
    from ray.data.aggregate import Sum

    ds = _events_ds(sf_dir, ["event_type", "ts"]).map_batches(
        _waveform_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    out = ds.groupby(["event_type", "bucket_ts"]).aggregate(Sum("n"))
    return out.map_batches(
        lambda b: b.rename_columns(["event_type", "bucket_ts", "n"]), batch_format="pyarrow"
    )


def _pairs_partial(batch: pa.Table) -> pa.Table:
    t = pa.table(
        {
            "event_type": pc.cast(batch["event_type"], pa.string()),
            "user_id": pc.cast(batch["user_id"], pa.int64()),
        }
    )
    return t.group_by(["event_type", "user_id"], use_threads=False).aggregate([])


def distinct_users_ds(sf_dir: str):
    """(event_type, n_users): count-distinct via dedup-then-count — two
    groupbys, both over pre-deduped pairs."""
    from ray.data.aggregate import Count

    ds = _events_ds(sf_dir, ["event_type", "user_id"]).map_batches(
        _pairs_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    # global dedup of (event_type, user_id), then count per type
    uniq = ds.groupby(["event_type", "user_id"]).aggregate(Count())
    out = (
        uniq.map_batches(
            lambda b: b.select(["event_type", "user_id"]), batch_format="pyarrow"
        )
        .groupby("event_type")
        .aggregate(Count())
    )
    return out.map_batches(
        lambda b: b.rename_columns(["event_type", "n_users"]), batch_format="pyarrow"
    )


def _latest_partial(batch: pa.Table) -> pa.Table:
    us = _ts_us(batch)
    t = pa.table(
        {
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "ts_us": pa.array(us),
        }
    )
    agg = t.group_by(["user_id"], use_threads=False).aggregate(
        [("ts_us", "max"), ("ts_us", "min"), ([], "count_all")]
    )
    return pa.table(
        {
            "user_id": agg["user_id"],
            "last_ts": pc.cast(agg["ts_us_max"], pa.int64()),
            "first_ts": pc.cast(agg["ts_us_min"], pa.int64()),
            "n_events": pc.cast(agg["count_all"], pa.int64()),
        }
    )


def latest_ds(sf_dir: str):
    """(user_id, last_ts, first_ts, n_events) — latest/first per user."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _events_ds(sf_dir, ["user_id", "ts"]).map_batches(
        _latest_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    out = ds.groupby("user_id").aggregate(Max("last_ts"), Min("first_ts"), Sum("n_events"))
    return out.map_batches(
        lambda b: b.rename_columns(["user_id", "last_ts", "first_ts", "n_events"]),
        batch_format="pyarrow",
    )


def _minmax_partial(batch: pa.Table) -> pa.Table:
    us = _ts_us(batch)
    return pa.table({"lo": pa.array([int(us.min())]), "hi": pa.array([int(us.max())])})


def trending_ds(sf_dir: str):
    """(event_type, n_older, n_recent, delta): counts in the two halves of
    the observed time range (mid = lo + (hi-lo)//2, recent = ts > mid) —
    the Trending plugin's slope signal as a deterministic relational op."""
    from ray.data.aggregate import Sum

    mm = (
        _events_ds(sf_dir, ["ts"])
        .map_batches(_minmax_partial, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    lo = min(r["lo"] for r in mm)
    hi = max(r["hi"] for r in mm)
    mid = lo + (hi - lo) // 2

    def partial(batch: pa.Table) -> pa.Table:
        us = _ts_us(batch)
        recent = (us > mid).astype(np.int64)
        t = pa.table(
            {
                "event_type": pc.cast(batch["event_type"], pa.string()),
                "n_recent": pa.array(recent),
                "n_older": pa.array(1 - recent),
            }
        )
        agg = t.group_by(["event_type"], use_threads=False).aggregate(
            [("n_recent", "sum"), ("n_older", "sum")]
        )
        return pa.table(
            {
                "event_type": agg["event_type"],
                "n_recent": pc.cast(agg["n_recent_sum"], pa.int64()),
                "n_older": pc.cast(agg["n_older_sum"], pa.int64()),
            }
        )

    ds = _events_ds(sf_dir, ["event_type", "ts"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    out = ds.groupby("event_type").aggregate(Sum("n_recent"), Sum("n_older"))

    def finish(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["event_type", "n_recent", "n_older"])
        return b.append_column(
            "delta", pc.subtract(pc.cast(b["n_recent"], pa.int64()), pc.cast(b["n_older"], pa.int64()))
        )

    return out.map_batches(finish, batch_format="pyarrow")

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


# --------------------------------------------------------------- PeakDet
#
# The reference's trending plugin ranks term waveforms by four strategies
# (miru-reco-plugins/.../trending/TrendingInjectable.java:120-190):
# LINEAR_REGRESSION (slope), LEADER (sum), HIGHEST_PEAK (max) and PEAKS —
# the Billauer peak detector (PeakDet.java:44-80) with trigger threshold
# highestBucket/6 + bucket95/100, where bucket95 is the 95th percentile of
# all terms' highest buckets.


def peakdet(vector, trigger_delta: float) -> list[tuple[float, int]]:
    """Exact translation of PeakDet.peakdet (PeakDet.java:44-80): a point
    is a maximum peak if it has the maximal value and is followed by a
    value lower by DELTA. Returns (height, index) pairs — note the
    reference stores the VALUE in mxpos (``mxpos = vector[i]``), so height
    is the peak's bucket count, and index is where the drop was detected;
    we replicate that behavior bit-for-bit."""
    mn, mx = float("inf"), float("-inf")
    mnpos = mxpos = float("nan")
    lookformax = True
    peaks: list[tuple[float, int]] = []
    for i, a in enumerate(vector):
        a = float(a)
        if a > mx:
            mx = a
            mxpos = float(vector[i])
        if a < mn:
            mn = a
            mnpos = float(vector[i])
        if lookformax:
            if a < mx - trigger_delta:
                peaks.append((mxpos, i))
                mn = a
                mnpos = float(vector[i])
                lookformax = False
        else:
            if a > mn + trigger_delta:
                mx = a
                mxpos = float(vector[i])
                lookformax = True
    return peaks


def commons_percentile(values, p: float) -> float:
    """Apache Commons Math Percentile (LEGACY estimation) — the evaluator
    the reference uses for bucket95: pos = p*(n+1)/100 over the sorted
    sample, linear interpolation, clamped to min/max."""
    v = sorted(float(x) for x in values)
    n = len(v)
    if n == 0:
        return float("nan")
    if n == 1:
        return v[0]
    pos = p * (n + 1) / 100.0
    if pos < 1:
        return v[0]
    if pos >= n:
        return v[-1]
    f = int(pos)
    d = pos - f
    return v[f - 1] + d * (v[f] - v[f - 1])


def regression_slope(w) -> float:
    """SimpleRegression slope over (i, w[i]) — least squares."""
    w = np.asarray(w, dtype=np.float64)
    n = len(w)
    if n < 2:
        return 0.0
    x = np.arange(n, dtype=np.float64)
    xm, wm = x.mean(), w.mean()
    denom = ((x - xm) ** 2).sum()
    return float(((x - xm) * (w - wm)).sum() / denom) if denom else 0.0


TREND_STRATEGIES = ("linear_regression", "leader", "peaks", "highest_peak")


def trending_ranks(
    waveforms: dict[str, np.ndarray],
    strategies=TREND_STRATEGIES,
    k: int = 0,
) -> dict[str, list[tuple[str, float]]]:
    """Rank waveform keys by each strategy (TrendingInjectable.java:143-190).
    All-zero waveforms are skipped (hasCounts). Ties break by key asc for
    determinism (the reference's heap order is arbitrary)."""
    out: dict[str, list[tuple[str, float]]] = {}
    keys = sorted(waveforms)
    bucket95 = 0.0
    if "peaks" in strategies and keys:
        # reference quirk, preserved bit-for-bit: TrendingInjectable.java:137
        # calls percentile.evaluate(highestBuckets, 0.95), and Commons Math
        # Percentile takes p in (0,100] — so the reference's "bucket95" is
        # really the 0.95th percentile (≈ the MINIMUM of the highest
        # buckets), not the 95th. We pass 0.95 to realize the same
        # thresholds (cf. the value-in-mxpos PeakDet quirk below).
        bucket95 = commons_percentile(
            [float(np.max(waveforms[key])) for key in keys], 0.95
        )
    for strat in strategies:
        rows: list[tuple[str, float]] = []
        for key in keys:
            w = np.asarray(waveforms[key], dtype=np.float64)
            if not (w > 0).any():
                continue
            if strat == "linear_regression":
                rank = regression_slope(w)
            elif strat == "leader":
                rank = float(w.sum())
            elif strat == "highest_peak":
                rank = float(w.max())
            elif strat == "peaks":
                threshold = float(w.max()) / 6.0 + bucket95 / 100.0
                rank = float(len(peakdet(w, threshold)))
            else:
                raise ValueError(strat)
            rows.append((key, rank))
        rows.sort(key=lambda r: (-r[1], r[0]))
        out[strat] = rows[:k] if k else rows
    return out


def trending_strategies_ds(sf_dir: str, n_segments: int = 24) -> pa.Table:
    """Events trending with the reference's strategy set: per event_type,
    the time range is divided into n_segments buckets (the scoreSet's
    divideTimeRangeIntoNSegments); ranks per strategy. The waveform build
    is the distributed part (per-batch partial counts → tiny groupby);
    ranking runs on the collected (types × segments) table."""
    from ray.data.aggregate import Sum

    mm = (
        _events_ds(sf_dir, ["ts"])
        .map_batches(_minmax_partial, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    lo = min(r["lo"] for r in mm)
    hi = max(r["hi"] for r in mm)
    span = max(1, hi - lo + 1)

    def partial(batch: pa.Table) -> pa.Table:
        us = _ts_us(batch)
        seg = ((us - lo) * n_segments) // span
        t = pa.table(
            {"event_type": pc.cast(batch["event_type"], pa.string()), "seg": pa.array(seg)}
        )
        agg = t.group_by(["event_type", "seg"], use_threads=False).aggregate([([], "count_all")])
        return pa.table(
            {"event_type": agg["event_type"], "seg": agg["seg"],
             "n": pc.cast(agg["count_all"], pa.int64())}
        )

    rows = (
        _events_ds(sf_dir, ["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "seg"])
        .aggregate(Sum("n"))
        .take_all()
    )
    waveforms: dict[str, np.ndarray] = {}
    for r in rows:
        w = waveforms.setdefault(r["event_type"], np.zeros(n_segments, dtype=np.int64))
        w[int(r["seg"])] += int(r["sum(n)"])
    ranks = trending_ranks(waveforms)
    types, strats, vals = [], [], []
    for strat in TREND_STRATEGIES:
        for key, rank in ranks[strat]:
            types.append(key)
            strats.append(strat)
            vals.append(round(rank, 6))
    return pa.table(
        {
            "strategy": pa.array(strats, pa.string()),
            "event_type": pa.array(types, pa.string()),
            "rank": pa.array(vals, pa.float64()),
        }
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


# ------------------------------------------------------------- sessionize


def _sessionize_group(group: pa.Table, gap_us: int, round_sum: bool = True) -> pa.Table:
    """One user's events → session rows. Sort by (ts, event_id), break
    where the gap exceeds ``gap_us``, reduceat per-session aggregates.
    ``round_sum=False`` keeps raw fp sums (the two-level scalable path
    rounds once, after the boundary merge)."""
    ts = _ts_us(group)
    eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    val = group["value"].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.lexsort((eid, ts))
    ts, eid, val = ts[order], eid[order], val[order]
    starts = np.flatnonzero(np.concatenate([[True], np.diff(ts) > gap_us]))
    ends = np.append(starts[1:], len(ts))
    uid = int(group["user_id"][0].as_py())
    sums = np.add.reduceat(val, starts)
    return pa.table(
        {
            "user_id": pa.array(np.full(len(starts), uid, np.int64)),
            "session_id": pa.array(np.minimum.reduceat(eid, starts)),
            "n_events": pa.array((ends - starts).astype(np.int64)),
            "start_us": pa.array(ts[starts]),
            "end_us": pa.array(ts[ends - 1]),
            "sum_value": pa.array(np.round(sums, 6) if round_sum else sums),
        }
    )


def sessionize_ds(sf_dir: str, gap_us: int = 30 * 60 * 1_000_000):
    """Gap-based sessionization — the canonical windowed aggregate the
    reference lacks (SURVEY §2.10 watermarks/windows: none in reference).
    One session row per maximal burst of a user's events with inter-event
    gaps ≤ ``gap_us``; session_id = the smallest event_id of the burst.

    Partitioning assumption: ONE USER'S EVENTS FIT ONE WORKER (the standard
    sessionization contract — groupby(user_id) co-locates each user). For
    whale users that violate it, ``sessionize_scalable_ds`` is the
    pre-split + boundary-merge variant with identical output; the groupby
    here shuffles only the four needed columns, never props."""
    ds = _events_ds(sf_dir, ["event_id", "ts", "user_id", "value"])
    return ds.groupby("user_id").map_groups(
        lambda g: _sessionize_group(g, gap_us), batch_format="pyarrow"
    )


def sessionize_scalable_ds(
    sf_dir: str,
    gap_us: int = 30 * 60 * 1_000_000,
    window_us: int | None = None,
):
    """Whale-safe two-level sessionization — same answer as
    ``sessionize_ds``, but no single worker ever holds one user's full
    event history. Level 1 sessionizes within (user, coarse time window)
    groups (a window boundary may cut a true session); level 2 re-groups
    by user over SESSION PIECES — orders of magnitude smaller than events
    — and chain-merges pieces whose boundary gap ≤ gap_us, which exactly
    reconstructs the single-pass partition (pieces inside one window
    already have gaps > gap_us between them; cut points only ever split a
    run, never join two). This is the pre-split + boundary-merge pass the
    plain sessionize's docstring defers to; default window = 64 gaps."""
    from .hashing import splitmix64

    window_us = window_us or 64 * gap_us
    ds = _events_ds(sf_dir, ["event_id", "ts", "user_id", "value"])
    n_buckets = 256

    def add_window(batch: pa.Table) -> pa.Table:
        w = _ts_us(batch) // np.int64(window_us)
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # bucket by (user, window) hash — the as-of join's level-1 shape:
        # one bucket-group call vectorizes over every piece it holds, and a
        # whale user's windows spread across buckets
        bkt = (
            splitmix64(u.astype(np.uint64) * np.uint64(1000003)
                       ^ w.astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        batch = batch.append_column("us", pa.array(_ts_us(batch)))
        batch = batch.append_column("w", pa.array(w))
        return batch.append_column("bkt", pa.array(bkt))

    def sessionize_bucket(group: pa.Table) -> pa.Table:
        """Every (user, window) piece of one hash bucket in ONE vectorized
        pass: session break = new (user, window) segment OR in-segment gap
        > gap_us; reduceat per session. Raw fp sums (level 2 rounds once)."""
        n = group.num_rows
        empty = pa.schema(
            [("user_id", pa.int64()), ("session_id", pa.int64()),
             ("n_events", pa.int64()), ("start_us", pa.int64()),
             ("end_us", pa.int64()), ("sum_value", pa.float64())]
        ).empty_table()
        if n == 0:
            return empty
        uid = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = group["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group["us"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        val = group["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((eid, ts, w, uid))
        uid, w, ts, eid, val = uid[order], w[order], ts[order], eid[order], val[order]
        segnew = np.concatenate(
            ([True], (uid[1:] != uid[:-1]) | (w[1:] != w[:-1]))
        )
        gap = np.concatenate(([True], (ts[1:] - ts[:-1]) > gap_us))
        starts = np.flatnonzero(segnew | gap)
        ends = np.append(starts[1:], n)
        return pa.table(
            {
                "user_id": pa.array(uid[starts]),
                "session_id": pa.array(np.minimum.reduceat(eid, starts)),
                "n_events": pa.array((ends - starts).astype(np.int64)),
                "start_us": pa.array(ts[starts]),
                "end_us": pa.array(ts[ends - 1]),
                "sum_value": pa.array(np.add.reduceat(val, starts)),
            }
        )

    def merge_bucket(group: pa.Table) -> pa.Table:
        """Every user of one user-hash bucket merged in one vectorized
        pass: chain-break = new user OR piece-boundary gap > gap_us."""
        n = group.num_rows
        if n == 0:
            return pa.schema(
                [("user_id", pa.int64()), ("session_id", pa.int64()),
                 ("n_events", pa.int64()), ("start_us", pa.int64()),
                 ("end_us", pa.int64()), ("sum_value", pa.float64())]
            ).empty_table()
        uid = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        start = group["start_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((start, uid))
        uid, start = uid[order], start[order]
        end = group["end_us"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
        sid = group["session_id"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
        ne = group["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
        sv = group["sum_value"].to_numpy(zero_copy_only=False).astype(np.float64)[order]
        brk = np.concatenate(
            ([True],
             (uid[1:] != uid[:-1]) | ((start[1:] - end[:-1]) > gap_us))
        )
        starts = np.flatnonzero(brk)
        ends_i = np.append(starts[1:], n)
        return pa.table(
            {
                "user_id": pa.array(uid[starts]),
                "session_id": pa.array(np.minimum.reduceat(sid, starts)),
                "n_events": pa.array(np.add.reduceat(ne, starts)),
                "start_us": pa.array(start[starts]),
                "end_us": pa.array(end[ends_i - 1]),
                "sum_value": pa.array(np.round(np.add.reduceat(sv, starts), 6)),
            }
        )

    def add_user_bucket(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ub = (splitmix64(u.astype(np.uint64)) % np.uint64(n_buckets)).astype(np.int64)
        return batch.append_column("ubkt", pa.array(ub))

    pieces = (
        ds.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(sessionize_bucket, batch_format="pyarrow")
    )
    return (
        pieces.map_batches(add_user_bucket, batch_format="pyarrow")
        .groupby("ubkt")
        .map_groups(
            lambda g: merge_bucket(g.drop_columns(["ubkt"])),
            batch_format="pyarrow",
        )
    )


# ------------------------------------------------------ HLL distinct sketch


def _bit_length_u64(y: np.ndarray) -> np.ndarray:
    """Exact integer bit length (no float log2 — 2^54-1 rounds UP in a
    double): smear the top bit down, popcount."""
    y = y.copy()
    for s in (1, 2, 4, 8, 16, 32):
        y |= y >> np.uint64(s)
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(y).astype(np.int64)
    return np.unpackbits(y.view(np.uint8).reshape(len(y), 8), axis=1).sum(axis=1).astype(np.int64)


def _hll_partial(batch: pa.Table, key_col: str, value_col: str, p: int) -> pa.Table:
    """Per-batch HLL partial: (key, bucket, max rho). Deterministic
    splitmix64 hashing; bucket = low p bits, rho = position of the first
    set bit of the remaining 64-p bits (counting from the top of that
    field), all-zero → 64-p+1."""
    from .hashing import splitmix64

    keys = batch[key_col]
    vals = batch[value_col].to_numpy(zero_copy_only=False).astype(np.uint64)
    h = splitmix64(vals)
    m = np.uint64(1 << p)
    bucket = (h & (m - np.uint64(1))).astype(np.int64)
    y = h >> np.uint64(p)
    width = 64 - p
    rho = np.where(y == 0, width + 1, width - _bit_length_u64(y) + 1).astype(np.int64)
    t = pa.table({"key": keys, "bucket": pa.array(bucket), "rho": pa.array(rho)})
    agg = t.group_by(["key", "bucket"], use_threads=False).aggregate([("rho", "max")])
    return pa.table(
        {"key": agg["key"], "bucket": agg["bucket"], "rho": pc.cast(agg["rho_max"], pa.int64())}
    )


def _hll_estimate(group: pa.Table, p: int) -> pa.Table:
    """One key's merged registers → the HLL estimate with the standard
    small-range (linear counting) correction. Registers absent from the
    table are zero."""
    m = 1 << p
    rho = group["rho"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_set = len(rho)
    zeros = m - n_set
    denom = np.sum(np.power(2.0, -rho)) + zeros  # 2^-0 = 1 per zero register
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / denom
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return pa.table(
        {
            "key": pa.array([group["key"][0].as_py()], pa.string()),
            "est_distinct": pa.array([round(float(est), 4)], pa.float64()),
            "n_zero_registers": pa.array([int(zeros)], pa.int64()),
            "register_sum": pa.array([int(rho.sum())], pa.int64()),
        }
    )


def hll_distinct_ds(sf_dir: str, key_col: str = "event_type",
                    value_col: str = "user_id", p: int = 10):
    """Approximate distinct count sketch per key — the mergeable-sketch
    pattern at scale: per-batch register partials (≤ m rows per key per
    batch, never values), one groupby max-merge, answer-sized estimates.
    The whole chain (splitmix64, bucketing, rho, correction) is
    deterministic and mirrored in the SQL oracle — a value-checked sketch."""
    from ray.data.aggregate import Max

    ds = _events_ds(sf_dir, [key_col, value_col]).map_batches(
        lambda b: _hll_partial(b, key_col, value_col, p),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    empty = pa.schema(
        [("key", pa.string()), ("bucket", pa.int64()), ("rho", pa.int64())]
    ).empty_table()
    regs = ds.groupby(["key", "bucket"]).aggregate(Max("rho")).map_batches(
        # zero-row inputs reach here schemaless (Ray hash aggregate)
        lambda b: pa.table(
            {"key": b["key"], "bucket": b["bucket"],
             "rho": pc.cast(b[b.schema.names[-1]], pa.int64())}
        ) if len(b.schema) == 3 else empty,
        batch_format="pyarrow",
    )
    return regs.groupby("key").map_groups(
        lambda g: _hll_estimate(g, p), batch_format="pyarrow"
    )


# ----------------------------------------------------------- exact quantiles


def _quantile_group(group: pa.Table, qs: tuple, value_col: str) -> pa.Table:
    v = np.sort(group[value_col].to_numpy(zero_copy_only=False).astype(np.float64))
    out = {"key": pa.array([group["key"][0].as_py()], pa.string())}
    for q in qs:
        # linear interpolation — numpy default ≡ SQL quantile_cont
        out[f"q{int(q * 100):02d}"] = pa.array(
            [round(float(np.quantile(v, q)), 6)], pa.float64()
        )
    return pa.table(out)


def quantiles_ds(sf_dir: str, key_col: str = "event_type", value_col: str = "value",
                 qs: tuple = (0.25, 0.5, 0.9, 0.99)):
    """Exact per-key quantiles (linear interpolation ≡ quantile_cont).
    groupby(key) co-locates each key's values; for keys too big for one
    worker, swap _quantile_group for a two-pass histogram refinement — the
    exact path is the value-checked baseline."""
    ds = _events_ds(sf_dir, [key_col, value_col]).map_batches(
        lambda b: pa.table({"key": b[key_col], value_col: b[value_col]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return ds.groupby("key").map_groups(
        lambda g: _quantile_group(g, qs, value_col), batch_format="pyarrow"
    )


# ------------------------------------------------------- retention cohorts

_DAY_US = 86_400_000_000


def _user_day_partial(batch: pa.Table) -> pa.Table:
    """Per-batch distinct (user_id, epoch-day) pairs — the combiner that
    makes the user-keyed shuffle carry at most one row per user-day per
    batch instead of one per event."""
    if batch.num_rows == 0:
        return pa.table(
            {"user_id": pa.array([], pa.int64()), "day": pa.array([], pa.int64())}
        )
    us = _ts_us(batch)
    uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    day = us // _DAY_US
    order = np.lexsort((day, uid))
    uid, day = uid[order], day[order]
    keep = np.concatenate([[True], (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])])
    return pa.table({"user_id": pa.array(uid[keep]), "day": pa.array(day[keep])})


def _cohort_periods(group: pa.Table) -> pa.Table:
    """One user's distinct active days → (cohort_day, period) rows, one per
    distinct day (cohort = first active day). Each user contributes a
    period at most once, so downstream row counts ARE distinct-user
    counts."""
    day = np.unique(group["day"].to_numpy(zero_copy_only=False).astype(np.int64))
    cohort = day[0]
    return pa.table(
        {
            "cohort_day": pa.array(np.full(len(day), cohort, np.int64)),
            "period": pa.array(day - cohort),
        }
    )


def retention_ds(sf_dir: str):
    """(cohort_day, period, n_users): classic retention triangle — users
    cohorted by their first active epoch-day; n_users = distinct users of
    that cohort active `period` days later. Two pre-aggregated shuffles:
    groupby(user) over per-batch-deduped (user, day) pairs, then a
    cohort×period count whose key space is answer-sized."""
    from ray.data.aggregate import Sum

    ds = _events_ds(sf_dir, ["ts", "user_id"]).map_batches(
        _user_day_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    periods = ds.groupby("user_id").map_groups(_cohort_periods, batch_format="pyarrow")

    def count_partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["cohort_day", "period"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "cohort_day": pc.cast(t["cohort_day"], pa.int64()),
                "period": pc.cast(t["period"], pa.int64()),
                "n": pc.cast(t["count_all"], pa.int64()),
            }
        )

    out = (
        periods.map_batches(count_partial, batch_format="pyarrow")
        .groupby(["cohort_day", "period"])
        .aggregate(Sum("n"))
    )
    empty = pa.schema(
        [("cohort_day", pa.int64()), ("period", pa.int64()), ("n_users", pa.int64())]
    ).empty_table()
    return out.map_batches(
        # zero-row inputs reach here schemaless (Ray hash aggregate)
        lambda b: pa.table(
            {
                "cohort_day": pc.cast(b["cohort_day"], pa.int64()),
                "period": pc.cast(b["period"], pa.int64()),
                "n_users": pc.cast(b[b.schema.names[-1]], pa.int64()),
            }
        ) if len(b.schema) == 3 else empty,
        batch_format="pyarrow",
    )


# ------------------------------------------------------------ funnel depth

def _funnel_steps_partial(batch: pa.Table, uniq_types: list[str]) -> pa.Table:
    """Pre-filter to funnel-step events and project the three needed
    columns — the funnel shuffle never carries off-funnel events or props.
    Events are coded against the UNIQUE type list (a step list may repeat a
    type, e.g. view→click→view; pc.index_in alone would alias repeats)."""
    et = batch["event_type"]
    et = et.combine_chunks() if isinstance(et, pa.ChunkedArray) else et
    keep = pc.is_in(et, value_set=pa.array(uniq_types))
    t = batch.filter(keep)
    tcode = pc.index_in(
        t["event_type"].combine_chunks() if isinstance(t["event_type"], pa.ChunkedArray) else t["event_type"],
        value_set=pa.array(uniq_types),
    )
    return pa.table(
        {
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "t": pa.array(_ts_us(t)),
            "tcode": pc.cast(tcode, pa.int8()),
        }
    )


def _funnel_group(group: pa.Table, step_codes: list[int]) -> pa.Table:
    """One user's step events → (step_idx,) rows for every step reached.
    Matching rule (mirrored in SQL by min-ts chaining): step i matches at
    the MINIMUM ts of its events strictly AFTER step i-1's match time."""
    t = group["t"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = group["tcode"].to_numpy(zero_copy_only=False).astype(np.int64)
    cur = -np.inf
    reached = []
    for i, code in enumerate(step_codes):
        cand = t[(s == code) & (t > cur)]
        if len(cand) == 0:
            break
        cur = cand.min()
        reached.append(i)
    return pa.table({"step_idx": pa.array(np.asarray(reached, np.int64))})


def funnel_ds(sf_dir: str, steps: list[str]) -> pa.Table:
    """(step_idx, step, n_users): ordered-funnel completion — n_users =
    distinct users whose events match steps[0..i] in strict time order
    (each step strictly after the previous step's earliest match). One
    user-keyed shuffle over pre-filtered step events; the result is
    answer-sized (len(steps) rows — zero-completion steps included, as in
    the SQL mirror), so the final zero-fill happens driver-side over the
    tiny aggregated table."""
    from ray.data.aggregate import Sum

    uniq_types = list(dict.fromkeys(steps))
    step_codes = [uniq_types.index(st) for st in steps]
    ds = _events_ds(sf_dir, ["ts", "user_id", "event_type"]).map_batches(
        lambda b: _funnel_steps_partial(b, uniq_types),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    depth = ds.groupby("user_id").map_groups(
        lambda g: _funnel_group(g, step_codes), batch_format="pyarrow"
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"step_idx": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        t = batch.group_by("step_idx", use_threads=False).aggregate([([], "count_all")])
        return pa.table(
            {
                "step_idx": pc.cast(t["step_idx"], pa.int64()),
                "n": pc.cast(t["count_all"], pa.int64()),
            }
        )

    agg = (
        depth.map_batches(count_partial, batch_format="pyarrow")
        .groupby("step_idx")
        .aggregate(Sum("n"))
    )
    n_users = np.zeros(len(steps), dtype=np.int64)
    for row in agg.take_all():  # ≤ len(steps) rows by construction
        n_users[int(row["step_idx"])] = int(row["sum(n)"])
    return pa.table(
        {
            "step_idx": pa.array(np.arange(len(steps), dtype=np.int64)),
            "step": pa.array(steps, pa.string()),
            "n_users": pa.array(n_users),
        }
    )




# --------------------------------------------------- metric waveform (anomaly)

# The reference's anomaly plugin (miru-anomaly-plugins/.../Anomaly.java)
# reconstructs per-bucket METRIC sums from a bit-sliced posting index
# (numBits planes, bucket sum = Σ 2^i · cardinality(plane_i ∧ bucket),
# Anomaly.java:102-130) and serves two waveforms: metricingSum and
# metricingAvg — the avg divides by the bucket's raw cardinality with JAVA
# LONG DIVISION and fills empty buckets by LINEAR INTERPOLATION between
# the neighboring non-empty buckets, flat at the edges (the ix[0]=-1 /
# ix[end]=len padding, Anomaly.java:60-97), truncating the interpolated
# value to long. The bit-plane decomposition is an artifact of the bitmap
# engine — Arrow batches sum an integer column directly — but the
# waveform/avg/interpolation semantics are reproduced exactly. The metric
# here is the events `value` quantized to integer cents (the reference
# likewise indexes pre-quantized longs).


def _metric_partial(batch: pa.Table) -> pa.Table:
    us = _ts_us(batch)
    bucket = us // BUCKET_US
    m = np.round(
        batch["value"].to_numpy(zero_copy_only=False).astype(np.float64) * 100.0
    ).astype(np.int64)
    t = pa.table(
        {
            "event_type": pc.cast(batch["event_type"], pa.string()),
            "b": pa.array(bucket),
            "m": pa.array(m),
        }
    )
    agg = t.group_by(["event_type", "b"], use_threads=False).aggregate(
        [("m", "sum"), ([], "count_all")]
    )
    return pa.table(
        {
            "event_type": agg["event_type"],
            "b": agg["b"],
            "s": pc.cast(agg["m_sum"], pa.int64()),
            "n": pc.cast(agg["count_all"], pa.int64()),
        }
    )


def _metric_interp_group(group: pa.Table, lo: int, hi: int) -> pa.Table:
    """One event_type's non-empty buckets → the full [lo, hi] hour grid
    with sum/count and the reference's avg: long division where n>0,
    linear interpolation (flat edges, floor-truncated) where n=0."""
    b = group["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = group["s"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = group["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(b)
    b, s, n = b[order], s[order], n[order]
    size = hi - lo + 1
    grid_s = np.zeros(size, np.int64)
    grid_n = np.zeros(size, np.int64)
    grid_s[b - lo] = s
    grid_n[b - lo] = n
    metric = np.zeros(size, np.int64)
    filled = grid_n > 0
    metric[filled] = grid_s[filled] // grid_n[filled]
    if (~filled).any():
        fi = np.flatnonzero(filled)
        idx = np.arange(size)
        # previous / next non-empty knot per cell (edges → flat)
        pi = fi[np.clip(np.searchsorted(fi, idx, side="right") - 1, 0, len(fi) - 1)]
        ni = fi[np.clip(np.searchsorted(fi, idx, side="left"), 0, len(fi) - 1)]
        pv = metric[pi].astype(np.float64)
        nv = metric[ni].astype(np.float64)
        empty = ~filled
        interior = empty & (pi < idx) & (ni > idx)
        lead = empty & (idx < fi[0])
        trail = empty & (idx > fi[-1])
        metric[lead] = metric[fi[0]]
        metric[trail] = metric[fi[-1]]
        if interior.any():
            i = idx[interior]
            # identical double-op order to the SQL mirror:
            # pv + ((nv - pv) / (nx - px)) * (i - px), floor
            val = pv[interior] + (
                (nv[interior] - pv[interior]) / (ni[interior] - pi[interior])
            ) * (i - pi[interior])
            metric[interior] = np.floor(val).astype(np.int64)
    et = group["event_type"][0].as_py()
    return pa.table(
        {
            "event_type": pa.array(np.full(size, et, dtype=object), pa.string()),
            "bucket_ts": pa.array((np.arange(lo, hi + 1)) * (BUCKET_US // 1_000_000)),
            "n": pa.array(grid_n),
            "sum_metric": pa.array(grid_s),
            "metric": pa.array(metric),
        }
    )


def metric_waveform_ds(sf_dir: str):
    """(event_type, bucket_ts, n, sum_metric, metric): the anomaly plugin's
    metricing waveforms over the corpus hour grid — sum and count per
    bucket plus the metricingAvg value (long-division averages, linearly
    interpolated empty buckets, flat edges). Per-batch partials → tiny
    (type × hour) groupby → per-type grid fill; the global grid bounds are
    two scalars from the same aggregate."""
    from ray.data.aggregate import Max, Min, Sum

    agg = (
        _events_ds(sf_dir, ["event_type", "ts", "value"])
        .map_batches(_metric_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "b"])
        .aggregate(Sum("s"), Sum("n"))
    )
    empty = pa.schema(
        [("event_type", pa.string()), ("b", pa.int64()), ("s", pa.int64()), ("n", pa.int64())]
    ).empty_table()
    agg = agg.map_batches(
        # zero-row inputs reach here schemaless (Ray hash aggregate)
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "b": pc.cast(t["b"], pa.int64()),
                "s": pc.cast(t["sum(s)"], pa.int64()),
                "n": pc.cast(t["sum(n)"], pa.int64()),
            }
        ) if len(t.schema) == 4 else empty,
        batch_format="pyarrow",
    )
    bounds = agg.aggregate(Min("b"), Max("b"))
    lo, hi = int(bounds["min(b)"]), int(bounds["max(b)"])
    return agg.groupby("event_type").map_groups(
        lambda g: _metric_interp_group(g, lo, hi), batch_format="pyarrow"
    )


# ----------------------------------- hopping windows with a watermark drop

# Streaming-window semantics over the (batch-replayed) event stream: the
# stream's ARRIVAL order is event time plus a deterministic per-event
# jitter (splitmix64(event_id) — out-of-orderness is real but replayable),
# the watermark is the max event time of all COMPLETED arrival epochs
# (epoch = 1 h of arrival time — the batching granularity of a stream
# consumer), and an event is dropped as late when its event time trails
# the watermark by more than the allowed lateness. Live events then count
# into every hopping window covering them (width = nwin × hop). The
# watermark state is answer-sized (one max per arrival epoch): a tiny
# per-epoch aggregate, an exclusive prefix max on the driver, one
# broadcast lookup inside the scoring pass — no sort, no global scan.

HW_HOP_US = 3_600_000_000  # 1 h hop
HW_NWIN = 3  # window width = 3 h
HW_JITTER_US = 1_800_000_000  # ±30 min arrival jitter
HW_EPOCH_US = 3_600_000_000  # arrival-epoch granularity
HW_LATE_US = 900_000_000  # allowed lateness 15 min


def _arrival_us(event_id: np.ndarray, us: np.ndarray, jitter_us: int) -> np.ndarray:
    from .hashing import splitmix64

    j = (
        splitmix64(event_id.astype(np.uint64)) % np.uint64(2 * jitter_us)
    ).astype(np.int64) - jitter_us
    return us + j


def _hw_epoch_partial(batch: pa.Table, jitter_us: int, epoch_us: int) -> pa.Table:
    us = _ts_us(batch)
    eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ep = _arrival_us(eid, us, jitter_us) // epoch_us
    t = pa.table({"ep": pa.array(ep), "us": pa.array(us)})
    agg = t.group_by(["ep"], use_threads=False).aggregate([("us", "max")])
    return pa.table({"ep": agg["ep"], "mx": pc.cast(agg["us_max"], pa.int64())})


def hopping_window_ds(
    sf_dir: str,
    hop_us: int = HW_HOP_US,
    nwin: int = HW_NWIN,
    jitter_us: int = HW_JITTER_US,
    epoch_us: int = HW_EPOCH_US,
    late_us: int = HW_LATE_US,
):
    """(win_ts, event_type, n, sum_metric): hopping-window counts and
    quantized-value sums over live (non-late) events — see module note
    above for the watermark contract."""
    import ray
    from ray.data.aggregate import Max, Sum

    ev = _events_ds(sf_dir, ["event_id", "ts", "event_type", "value"])
    ep_rows = (
        ev.map_batches(
            lambda b: _hw_epoch_partial(b, jitter_us, epoch_us),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby("ep")
        .aggregate(Max("mx"))
        .take_all()
    )
    eps = np.array(sorted(int(r["ep"]) for r in ep_rows), dtype=np.int64)
    mx = {int(r["ep"]): int(r["max(mx)"]) for r in ep_rows}
    # exclusive prefix max: watermark of epoch eps[i] = max event time of
    # all earlier arrival epochs (-1 sentinel = no watermark yet)
    pmax = np.full(len(eps), -1, dtype=np.int64)
    run = -1
    for i, e in enumerate(eps):
        pmax[i] = run
        run = max(run, mx[int(e)])
    wm_ref = ray.put((eps, pmax))

    def stage(batch: pa.Table) -> pa.Table:
        eps_a, pmax_a = ray.get(wm_ref)
        us = _ts_us(batch)
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ep = _arrival_us(eid, us, jitter_us) // epoch_us
        wm = pmax_a[np.searchsorted(eps_a, ep)]
        live = (wm < 0) | (us >= wm - late_us)
        if not live.any():
            return pa.schema(
                [("win", pa.int64()), ("event_type", pa.string()),
                 ("n", pa.int64()), ("s", pa.int64())]
            ).empty_table()
        us = us[live]
        m = np.round(
            batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)[live] * 100.0
        ).astype(np.int64)
        et = (batch["event_type"].combine_chunks()
              if isinstance(batch["event_type"], pa.ChunkedArray)
              else batch["event_type"]).filter(pa.array(live))
        base = us // hop_us
        j = np.tile(np.arange(nwin, dtype=np.int64), len(us))
        win = (np.repeat(base, nwin) - j) * hop_us
        t = pa.table(
            {
                "win": pa.array(win),
                "event_type": et.take(pa.array(np.repeat(np.arange(len(us)), nwin))),
                "m": pa.array(np.repeat(m, nwin)),
            }
        )
        agg = t.group_by(["win", "event_type"], use_threads=False).aggregate(
            [("m", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "win": agg["win"], "event_type": agg["event_type"],
                "n": pc.cast(agg["count_all"], pa.int64()),
                "s": pc.cast(agg["m_sum"], pa.int64()),
            }
        )

    out = (
        ev.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["win", "event_type"])
        .aggregate(Sum("n"), Sum("s"))
    )
    empty = pa.schema(
        [("win_ts", pa.int64()), ("event_type", pa.string()),
         ("n", pa.int64()), ("sum_metric", pa.int64())]
    ).empty_table()
    return out.map_batches(
        lambda b: pa.table(
            {
                "win_ts": pc.cast(pc.divide(b["win"], 1_000_000), pa.int64()),
                "event_type": pc.cast(b["event_type"], pa.string()),
                "n": pc.cast(b["sum(n)"], pa.int64()),
                "sum_metric": pc.cast(b["sum(s)"], pa.int64()),
            }
        ) if len(b.schema) == 4 else empty,
        batch_format="pyarrow",
    )


# --------------------------------------------------------------- as-of join

# The classic time-series join Ray Data has no primitive for (task brief:
# "when the reference has an operator Ray Data lacks — as-of join, range
# join, windowed aggregate — implement it as a composition"). For every
# LEFT-type event, attach the most recent RIGHT-type event of the same
# user with right.ts <= left.ts (ties on ts broken toward the larger
# event_id — the "latest writer wins" rule the reference's pairedLatest
# fields use, MiruIndexPairedLatest.java analogue).


def _asof_partial(batch: pa.Table, left_type: str, right_type: str) -> pa.Table:
    """Pre-filter to the two joined types; emit narrow columns + side code
    (0 = left, 1 = right). The user-keyed shuffle then carries only these
    five columns for the two types, never props or unrelated events."""
    et = batch["event_type"]
    is_l = pc.equal(et, pa.scalar(left_type))
    is_r = pc.equal(et, pa.scalar(right_type))
    keep = pc.or_(is_l, is_r)
    t = batch.filter(keep)
    side = pc.cast(pc.equal(t["event_type"], pa.scalar(right_type)), pa.int8())
    return pa.table(
        {
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "ts_us": pa.array(_ts_us(t)),
            "value": pc.cast(t["value"], pa.float64()),
            "side": side,
        }
    )


_ASOF_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("ts_us", pa.int64()),
        ("prior_event_id", pa.int64()),
        ("prior_ts_us", pa.int64()),
        ("prior_value", pa.float64()),
    ]
)


def _asof_group(group: pa.Table) -> pa.Table:
    """One user's (left ∪ right) events → one output row per left event.
    Sort the right side by (ts, event_id); one vectorized searchsorted
    (side='right') lands after ALL right rows with ts <= left ts, so the
    row before the insertion point IS the as-of match with max event_id
    among equal timestamps. Unmatched lefts get the -1 / 0.0 sentinels
    (never SQL NULLs — the oracle compare stringifies values)."""
    side = group["side"].to_numpy(zero_copy_only=False)
    ts = group["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
    eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    val = group["value"].to_numpy(zero_copy_only=False).astype(np.float64)
    lmask = side == 0
    l_ts, l_eid = ts[lmask], eid[lmask]
    if len(l_ts) == 0:
        return _ASOF_SCHEMA.empty_table()
    uid0 = int(group["user_id"][0].as_py())
    rmask = ~lmask
    r_ts, r_eid, r_val = ts[rmask], eid[rmask], val[rmask]
    if len(r_ts) == 0:
        n = len(l_eid)
        return pa.table(
            {
                "event_id": pa.array(l_eid),
                "user_id": pa.array(np.full(n, uid0, np.int64)),
                "ts_us": pa.array(l_ts),
                "prior_event_id": pa.array(np.full(n, -1, np.int64)),
                "prior_ts_us": pa.array(np.full(n, -1, np.int64)),
                "prior_value": pa.array(np.zeros(n, np.float64)),
            }
        )
    order = np.lexsort((r_eid, r_ts))
    r_ts, r_eid, r_val = r_ts[order], r_eid[order], r_val[order]
    idx = np.searchsorted(r_ts, l_ts, side="right") - 1
    matched = idx >= 0
    safe = np.maximum(idx, 0)
    uid = int(group["user_id"][0].as_py())
    return pa.table(
        {
            "event_id": pa.array(l_eid),
            "user_id": pa.array(np.full(len(l_eid), uid, np.int64)),
            "ts_us": pa.array(l_ts),
            "prior_event_id": pa.array(
                np.where(matched, r_eid[safe], np.int64(-1))
            ),
            "prior_ts_us": pa.array(np.where(matched, r_ts[safe], np.int64(-1))),
            "prior_value": pa.array(np.where(matched, r_val[safe], 0.0)),
        }
    )


def asof_join_ds(sf_dir: str, left_type: str = "purchase",
                 right_type: str = "click"):
    """Backward as-of join: each ``left_type`` event joined to the latest
    ``right_type`` event of the same user at-or-before it.

    Partitioning assumption (same contract as ``sessionize_ds``): one
    user's events of the two joined types fit one worker — the
    groupby(user_id) co-locates them, pre-filtered to two types and five
    narrow columns. For whale users the sessionize_scalable two-level
    trick applies with one extra piece of boundary state (the last right
    event of each coarse window, carried into the next window's merge);
    not needed at any tested scale, documented for 100 TB."""
    ds = _events_ds(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])
    return (
        ds.map_batches(
            lambda b: _asof_partial(b, left_type, right_type),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("user_id")
        .map_groups(_asof_group, batch_format="pyarrow")
    )


# -------------------------------------------------------------- range join

# Interval join — the second join Ray Data lacks a primitive for. Every
# ``error`` event opens an incident window [ts, ts + width); the join
# counts ALL events (any type) landing in each window and sums their
# integer-cent values (cents, like metric_waveform — BIGINT sums are
# order-free, so Ray and DuckDB agree bit-for-bit). Windows OVERLAP, so
# this is a true many-to-many range join, not a bucketing.


def _range_join_schema() -> pa.Schema:
    return pa.schema(
        [("window_id", pa.int64()), ("n_events", pa.int64()),
         ("sum_cents", pa.int64())]
    )


def range_join_ds(sf_dir: str, window_type: str = "error",
                  width_us: int = 10 * 60 * 1_000_000) -> pa.Table:
    """(window_id, n_events, sum_cents) per incident window, zero-filled.

    Scale shape: the window table is the SMALL side — collected once,
    sorted by start, shipped to every task via ``ray.put`` (the broadcast
    pattern; never re-serialized per batch). Because every window has the
    same width, an event at t matches exactly the windows with start in
    (t - width, t] — two vectorized ``searchsorted`` calls per batch, no
    interval tree. Each batch emits per-window PARTIAL (n, sum) rows, so
    the groupby shuffle carries at most one row per window per batch; the
    driver only ever holds window-sized tables. If the window side itself
    outgrows a broadcast (10^8+ windows), co-partition both sides by
    ts // width — a window spans at most two such buckets, so each event
    checks its own and the previous bucket; the fixed width is what makes
    that partitioning sound."""
    import ray
    from ray.data.aggregate import Sum

    ev = _events_ds(sf_dir, ["event_id", "ts", "event_type", "value"])
    win_rows = (
        ev.map_batches(
            lambda b: pa.table(
                {
                    "window_id": pc.cast(
                        b.filter(pc.equal(b["event_type"], pa.scalar(window_type)))[
                            "event_id"
                        ],
                        pa.int64(),
                    ),
                    "start_us": pa.array(
                        _ts_us(b.filter(pc.equal(b["event_type"], pa.scalar(window_type))))
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    ).take_all()
    wid = np.array([r["window_id"] for r in win_rows], dtype=np.int64)
    wstart = np.array([r["start_us"] for r in win_rows], dtype=np.int64)
    order = np.lexsort((wid, wstart))
    wid, wstart = wid[order], wstart[order]
    if len(wid) == 0:
        return _range_join_schema().empty_table()
    win_ref = ray.put((wstart, wid))

    def stage(batch: pa.Table) -> pa.Table:
        starts, ids = ray.get(win_ref)
        t = _ts_us(batch)
        cents = np.round(
            batch["value"].to_numpy(zero_copy_only=False).astype(np.float64) * 100
        ).astype(np.int64)
        lo = np.searchsorted(starts, t - width_us, side="right")
        hi = np.searchsorted(starts, t, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return pa.schema([("w", pa.int64()), ("n", pa.int64()),
                              ("s", pa.int64())]).empty_table()
        # expand each event's contiguous [lo, hi) window-index range
        widx = np.repeat(lo, counts) + (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(counts) - counts, counts)
        )
        part = pa.table(
            {"w": pa.array(ids[widx]), "m": pa.array(np.repeat(cents, counts))}
        ).group_by(["w"], use_threads=False).aggregate([("m", "sum"), ([], "count_all")])
        return pa.table(
            {
                "w": pc.cast(part["w"], pa.int64()),
                "n": pc.cast(part["count_all"], pa.int64()),
                "s": pc.cast(part["m_sum"], pa.int64()),
            }
        )

    agg = (
        ev.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("w")
        .aggregate(Sum("n"), Sum("s"))
    )
    n_out = np.zeros(len(wid), dtype=np.int64)
    s_out = np.zeros(len(wid), dtype=np.int64)
    pos = {int(w): i for i, w in enumerate(wid)}
    for row in agg.take_all():  # window-sized = answer-sized
        i = pos[int(row["w"])]
        n_out[i] = int(row["sum(n)"])
        s_out[i] = int(row["sum(s)"])
    return pa.table(
        {"window_id": pa.array(wid), "n_events": pa.array(n_out),
         "sum_cents": pa.array(s_out)}
    )


# ------------------------------------------------- quantile sketch (bottom-k)

# The 100-TB path for quantiles_ds: a DETERMINISTIC mergeable quantile
# sketch. Instead of co-locating every value of a key (the exact path's
# documented whale caveat), keep per key only the n rows with the
# SMALLEST splitmix64(event_id ^ seed) draw — a bottom-k sketch. Bottom-k
# by a fixed hash is associative/commutative (merging partials = keeping
# the n smallest of the union), so the selection is invariant to batching,
# partitioning and re-runs — unlike a random reservoir, the sketch is
# bit-reproducible, which is what lets DuckDB mirror it exactly. The kept
# rows are a uniform sample of the key's values (the hash is independent
# of value), so quantile_cont over them is the standard sampled-quantile
# estimate with error O(1/sqrt(n)).


def _qsketch_rows(batch: pa.Table, key_col: str, value_col: str,
                  seed: int) -> pa.Table:
    from .hashing import splitmix64

    eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = splitmix64(eid.astype(np.uint64) ^ np.uint64(seed))
    return pa.table(
        {
            "key": pc.cast(batch[key_col], pa.string()),
            "h": pa.array(h),
            "event_id": pa.array(eid),
            "v": pc.cast(batch[value_col], pa.float64()),
        }
    )


def _qsketch_keep(rows: pa.Table, n: int) -> pa.Table:
    """Bottom-n rows per key by (h, event_id) — used both as the per-batch
    partial (bounds the shuffle at n rows per key per batch) and as the
    per-key final merge."""
    idx = pc.sort_indices(
        rows,
        sort_keys=[("key", "ascending"), ("h", "ascending"),
                   ("event_id", "ascending")],
    )
    rows = rows.take(idx)
    key = rows["key"].to_numpy(zero_copy_only=False)
    if len(key) == 0:
        return rows
    new = np.concatenate(([True], key[1:] != key[:-1]))
    starts = np.flatnonzero(new)
    rank = np.arange(len(key), dtype=np.int64) - np.repeat(starts, np.diff(np.append(starts, len(key))))
    return rows.filter(pa.array(rank < n))


def _qsketch_group(group: pa.Table, qs: tuple, n: int) -> pa.Table:
    kept = _qsketch_keep(group, n)
    v = np.sort(kept["v"].to_numpy(zero_copy_only=False))
    out = {"key": pa.array([group["key"][0].as_py()], pa.string()),
           "n_sample": pa.array([len(v)], pa.int64())}
    for q in qs:
        out[f"q{int(q * 100):02d}"] = pa.array(
            [round(float(np.quantile(v, q)), 6)], pa.float64()
        )
    return pa.table(out)


def quantile_sketch_ds(sf_dir: str, key_col: str = "event_type",
                       value_col: str = "value",
                       qs: tuple = (0.25, 0.5, 0.9, 0.99),
                       n: int = 256, seed: int = 7):
    """(key, n_sample, q25, q50, q90, q99): per-key approximate quantiles
    from the deterministic bottom-n-by-hash sketch. The shuffle carries at
    most n rows per key per batch; no worker ever holds a key's full value
    set — the whale-safe counterpart to ``quantiles_ds``, exactly
    mirrorable in SQL (row_number over the same splitmix64 chain)."""
    ds = _events_ds(sf_dir, ["event_id", key_col, value_col]).map_batches(
        lambda b: _qsketch_keep(
            _qsketch_rows(b, key_col, value_col, seed), n
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return ds.groupby("key").map_groups(
        lambda g: _qsketch_group(g, qs, n), batch_format="pyarrow"
    )

# ------------------------------------------------ whale-safe as-of join

# Two-level variant of asof_join_ds closing its documented whale caveat:
# no worker ever holds one user's full history. Level 1 groups by
# (user, coarse window) and resolves every left event against right
# events of its OWN window — an in-window match is always final, because
# any right event from an earlier window is older than every in-window
# candidate. An unmatched left needs only ONE value per (user, window):
# the user's last right event BEFORE the window. Level 2 computes those
# fills from per-window boundary rows (window-count-sized, never
# events-sized), and a 1:1 (user, window)-keyed equi-join pushes them
# back onto just the unmatched lefts — fully vectorized, no per-event
# Python anywhere.


_ASOF_PIECE_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("ts_us", pa.int64()),
        ("prior_event_id", pa.int64()),
        ("prior_ts_us", pa.int64()),
        ("prior_value", pa.float64()),
        ("kind", pa.int8()),
        ("w", pa.int64()),
    ]
)


def _asof_bucket(group: pa.Table) -> pa.Table:
    """All rows of ONE HASH BUCKET of (user, window) pieces → kind-tagged
    rows: in-window as-of results (kind 0 matched / kind 1 unmatched), one
    kind-2 boundary row per piece with right events (its last right), one
    kind-3 marker row per piece with unmatched lefts.

    Every piece in the bucket is resolved in one vectorized pass — no
    per-piece Python: rows sort (user, w, ts, rights-before-lefts,
    event_id); a single running cummax of right-row indices compared
    against each row's segment start gives every left its latest
    at-or-before right (global row indices are increasing, so a cummax
    value below the segment start IS "no right yet in this piece" — the
    segment reset for free). Rights at equal ts sort eid-ascending, so
    the cummax lands on the max-event_id tie-winner, matching
    _asof_group's side='right' searchsorted exactly."""
    n = group.num_rows
    if n == 0:
        return _ASOF_PIECE_SCHEMA.empty_table()
    uid = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    w = group["w"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = group["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
    eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    val = group["value"].to_numpy(zero_copy_only=False).astype(np.float64)
    side = group["side"].to_numpy(zero_copy_only=False).astype(np.int8)
    order = np.lexsort((eid, (1 - side), ts, w, uid))
    uid, w, ts, eid, val, side = (
        uid[order], w[order], ts[order], eid[order], val[order], side[order]
    )
    new = np.concatenate(([True], (uid[1:] != uid[:-1]) | (w[1:] != w[:-1])))
    seg_first = np.flatnonzero(new)
    nseg = len(seg_first)
    seg_len = np.diff(np.append(seg_first, n))
    seg_start = np.repeat(seg_first, seg_len)
    seg_id = np.cumsum(new) - 1
    idxs = np.arange(n, dtype=np.int64)
    lr = np.maximum.accumulate(np.where(side == 1, idxs, np.int64(-1)))
    has = lr >= seg_start
    lmask = side == 0
    l_idx = np.flatnonzero(lmask)
    l_matched = has[l_idx]
    safe = np.maximum(lr[l_idx], 0)
    # boundary per segment: the cummax at the segment's last row
    ends = seg_first + seg_len - 1
    blr = lr[ends]
    b_seg = np.flatnonzero(blr >= seg_first)
    b_idx = blr[b_seg]
    # marker per segment with >=1 unmatched left
    unm = lmask & ~has
    m_seg = np.flatnonzero(np.bincount(seg_id[unm], minlength=nseg) > 0)
    nl, nb, nm = len(l_idx), len(b_seg), len(m_seg)
    return pa.table(
        {
            "event_id": pa.array(np.concatenate(
                [eid[l_idx], eid[b_idx], np.full(nm, -1, np.int64)])),
            "user_id": pa.array(np.concatenate(
                [uid[l_idx], uid[b_idx], uid[seg_first[m_seg]]])),
            "ts_us": pa.array(np.concatenate(
                [ts[l_idx], ts[b_idx], np.full(nm, -1, np.int64)])),
            "prior_event_id": pa.array(np.concatenate(
                [np.where(l_matched, eid[safe], np.int64(-1)),
                 eid[b_idx], np.full(nm, -1, np.int64)])),
            "prior_ts_us": pa.array(np.concatenate(
                [np.where(l_matched, ts[safe], np.int64(-1)),
                 ts[b_idx], np.full(nm, -1, np.int64)])),
            "prior_value": pa.array(np.concatenate(
                [np.where(l_matched, val[safe], 0.0),
                 val[b_idx], np.zeros(nm)])),
            "kind": pa.array(np.concatenate(
                [np.where(l_matched, 0, 1).astype(np.int8),
                 np.full(nb, 2, np.int8), np.full(nm, 3, np.int8)])),
            "w": pa.array(np.concatenate(
                [w[l_idx], w[b_idx], w[seg_first[m_seg]]])),
        },
        schema=_ASOF_PIECE_SCHEMA,
    )


def _asof_fills(group: pa.Table) -> pa.Table:
    """One user's boundary (kind 2) + marker (kind 3) rows → one fill row
    per MARKER window: the running last right event over boundary windows
    strictly before it. Input and output are window-count-sized."""
    kind = group["kind"].to_numpy(zero_copy_only=False)
    w = group["w"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = group["prior_ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
    eid = group["prior_event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    val = group["prior_value"].to_numpy(zero_copy_only=False).astype(np.float64)
    bmask = kind == 2
    mmask = kind == 3
    mw = w[mmask]
    uid = int(group["user_id"][0].as_py())
    bo = np.argsort(w[bmask])
    bw, bts, beid, bval = w[bmask][bo], ts[bmask][bo], eid[bmask][bo], val[bmask][bo]
    idx = np.searchsorted(bw, mw, side="left") - 1  # last boundary window < marker
    ok = idx >= 0
    safe = np.maximum(idx, 0)
    return pa.table(
        {
            "user_id": pa.array(np.full(len(mw), uid, np.int64)),
            "w": pa.array(mw),
            "f_eid": pa.array(np.where(ok, beid[safe], np.int64(-1))),
            "f_ts": pa.array(np.where(ok, bts[safe], np.int64(-1))),
            "f_val": pa.array(np.where(ok, bval[safe], 0.0)),
        }
    )


def asof_join_scalable_ds(sf_dir: str, left_type: str = "purchase",
                          right_type: str = "click",
                          width_us: int = 24 * 3600 * 1_000_000,
                          num_partitions: int = 8):
    """Whale-safe asof_join_ds — identical output by definition. The only
    events-sized shuffles are keyed by (user, ts // width), so a worker
    holds at most one window of one user; the per-USER pass (fills) sees
    window counts, and the fill join is 1:1 on (user, window)."""
    from .hashing import splitmix64

    ds = _events_ds(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])
    n_buckets = 256

    def with_window(b: pa.Table) -> pa.Table:
        t = _asof_partial(b, left_type, right_type)
        w = (t["ts_us"].to_numpy(zero_copy_only=False) // width_us).astype(np.int64)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # bucket by (user, window) hash: a whale user's windows spread
        # across buckets, and one bucket-group call vectorizes over every
        # piece it holds
        bkt = (
            splitmix64(u.astype(np.uint64) * np.uint64(1000003) ^ w.astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        t = t.append_column("w", pa.array(w))
        return t.append_column("bkt", pa.array(bkt))

    pieces = (
        ds.map_batches(with_window, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(_asof_bucket, batch_format="pyarrow")
        .materialize()
    )
    matched = pieces.filter(expr="kind == 0").drop_columns(["kind", "w"])
    unmatched = pieces.filter(expr="kind == 1").drop_columns(
        ["kind", "prior_event_id", "prior_ts_us", "prior_value"]
    )
    fills = (
        pieces.filter(expr="kind >= 2")
        .groupby("user_id")
        .map_groups(_asof_fills, batch_format="pyarrow")
    )

    def apply_fill(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _ASOF_SCHEMA.empty_table()
        return pa.table(
            {
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "ts_us": pc.cast(b["ts_us"], pa.int64()),
                "prior_event_id": pc.cast(b["f_eid"], pa.int64()),
                "prior_ts_us": pc.cast(b["f_ts"], pa.int64()),
                "prior_value": pc.cast(b["f_val"], pa.float64()),
            }
        )

    from .joins import bucket_join

    # fill resolution via the shuffle-safe bucket join (joins.py):
    # Dataset.join dies on empty hash partitions of a sparse unmatched
    # stream (the dd_keep_best r4 crash class); fills are unique per
    # (user_id, w) by construction, so lookup semantics are exact
    resolved = bucket_join(
        unmatched, fills, on=("user_id", "w"),
        left_cols={"event_id": pa.int64(), "ts_us": pa.int64()},
        right_cols={"f_eid": pa.int64(), "f_ts": pa.int64(),
                    "f_val": pa.float64()},
        num_buckets=num_partitions * 4,
    ).map_batches(apply_fill, batch_format="pyarrow")
    return matched.union(resolved)


# ---------------------------------------------------------- interval join

# Stream-stream windowed join (the Flink "interval join" primitive, the
# third join in the task family next to as-of and range): all
# (left, right) pairs of the same user with right.ts in
# [left.ts - before, left.ts + after]. Same user-keyed shuffle of two
# pre-filtered types as the as-of join; per group, two vectorized
# searchsorteds give each left its contiguous right range and the
# repeat/arange expansion emits the pairs — output is pairs-sized, the
# only thing that can be.


def _interval_group(group: pa.Table, before_us: int, after_us: int) -> pa.Table:
    side = group["side"].to_numpy(zero_copy_only=False)
    ts = group["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
    eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    empty = pa.schema(
        [("left_event_id", pa.int64()), ("right_event_id", pa.int64()),
         ("user_id", pa.int64()), ("dt_us", pa.int64())]
    ).empty_table()
    lmask = side == 0
    l_ts, l_eid = ts[lmask], eid[lmask]
    r_ts, r_eid = ts[~lmask], eid[~lmask]
    if len(l_ts) == 0 or len(r_ts) == 0:
        return empty
    order = np.lexsort((r_eid, r_ts))
    r_ts, r_eid = r_ts[order], r_eid[order]
    lo = np.searchsorted(r_ts, l_ts - before_us, side="left")
    hi = np.searchsorted(r_ts, l_ts + after_us, side="right")
    counts = hi - lo
    total = int(counts.sum())
    if total == 0:
        return empty
    ridx = np.repeat(lo, counts) + (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(counts) - counts, counts)
    )
    uid = int(group["user_id"][0].as_py())
    return pa.table(
        {
            "left_event_id": pa.array(np.repeat(l_eid, counts)),
            "right_event_id": pa.array(r_eid[ridx]),
            "user_id": pa.array(np.full(total, uid, np.int64)),
            "dt_us": pa.array(r_ts[ridx] - np.repeat(l_ts, counts)),
        }
    )


def interval_join_ds(sf_dir: str, left_type: str = "purchase",
                     right_type: str = "error",
                     before_us: int = 15 * 60 * 1_000_000,
                     after_us: int = 15 * 60 * 1_000_000):
    """(left_event_id, right_event_id, user_id, dt_us): every same-user
    pair with right.ts within [left.ts - before, left.ts + after].
    Whale note: one user's two-type history per worker (the sessionize
    contract); the two-level window split applies with ±window overlap
    carried, documented not needed at tested scales."""
    ds = _events_ds(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])
    return (
        ds.map_batches(
            lambda b: _asof_partial(b, left_type, right_type),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("user_id")
        .map_groups(
            lambda g: _interval_group(g, before_us, after_us),
            batch_format="pyarrow",
        )
    )


# -------------------------------------------- co-partitioned range join

# Closes range_join_ds' documented caveat for window tables too big to
# broadcast: both sides co-partition by ts // width. A fixed-width window
# starting in bucket b covers events only in buckets b and b+1, so each
# WINDOW ships to two buckets, each EVENT to one, and every (event,
# window) pair meets exactly once. Inside a bucket the same two
# searchsorteds + repeat/arange expansion run over that bucket's windows
# only; each window's home bucket always emits a zero partial so the
# final groupby(window) sum is zero-filled without any driver-side table.


def _range_bucket(group: pa.Table, width_us: int) -> pa.Table:
    kind = group["kind"].to_numpy(zero_copy_only=False)
    t = group["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
    cents = group["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
    wid = group["window_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    home = group["home"].to_numpy(zero_copy_only=False)
    empty = pa.schema(
        [("w", pa.int64()), ("n", pa.int64()), ("s", pa.int64())]
    ).empty_table()
    wmask = kind == 1
    emask = ~wmask
    w_start, w_id, w_home = t[wmask], wid[wmask], home[wmask]
    order = np.lexsort((w_id, w_start))
    w_start, w_id, w_home = w_start[order], w_id[order], w_home[order]
    parts = []
    if emask.any() and wmask.any():
        et, ec = t[emask], cents[emask]
        lo = np.searchsorted(w_start, et - width_us, side="right")
        hi = np.searchsorted(w_start, et, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total:
            widx = np.repeat(lo, counts) + (
                np.arange(total, dtype=np.int64)
                - np.repeat(np.cumsum(counts) - counts, counts)
            )
            tt = pa.table(
                {"w": pa.array(w_id[widx]),
                 "m": pa.array(np.repeat(ec, counts))}
            ).group_by(["w"], use_threads=False).aggregate(
                [("m", "sum"), ([], "count_all")]
            )
            parts.append(pa.table(
                {"w": pc.cast(tt["w"], pa.int64()),
                 "n": pc.cast(tt["count_all"], pa.int64()),
                 "s": pc.cast(tt["m_sum"], pa.int64())}
            ))
    hm = w_home == 1
    if hm.any():  # zero partial from each window's home bucket
        parts.append(pa.table(
            {"w": pa.array(w_id[hm]),
             "n": pa.array(np.zeros(int(hm.sum()), np.int64)),
             "s": pa.array(np.zeros(int(hm.sum()), np.int64))}
        ))
    return pa.concat_tables(parts) if parts else empty


def range_join_scalable_ds(sf_dir: str, window_type: str = "error",
                           width_us: int = 10 * 60 * 1_000_000):
    """Same output as ``range_join_ds`` (defined equal; shared oracle),
    but the window table never crosses the driver or a broadcast — the
    events-sized shuffle is keyed by ts // width and the result stays a
    Dataset keyed by window."""
    from ray.data.aggregate import Sum

    ev = _events_ds(sf_dir, ["event_id", "ts", "event_type", "value"])

    def rows(b: pa.Table) -> pa.Table:
        t = _ts_us(b)
        cents = np.round(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64) * 100
        ).astype(np.int64)
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        isw = pc.equal(b["event_type"], pa.scalar(window_type)).to_numpy(
            zero_copy_only=False
        )
        bkt = t // width_us
        # events once (kind 0); windows twice (kind 1): home bucket and +1
        out = {
            "bkt": np.concatenate([bkt, bkt[isw], bkt[isw] + 1]),
            "kind": np.concatenate(
                [np.zeros(len(t), np.int8), np.ones(2 * int(isw.sum()), np.int8)]
            ),
            "ts_us": np.concatenate([t, t[isw], t[isw]]),
            "cents": np.concatenate([cents, cents[isw], cents[isw]]),
            "window_id": np.concatenate([eid, eid[isw], eid[isw]]),
            "home": np.concatenate(
                [np.zeros(len(t), np.int8), np.ones(int(isw.sum()), np.int8),
                 np.zeros(int(isw.sum()), np.int8)]
            ),
        }
        return pa.table({k: pa.array(v) for k, v in out.items()})

    agg = (
        ev.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(lambda g: _range_bucket(g, width_us), batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("n"), Sum("s"))
    )
    empty = pa.schema(
        [("window_id", pa.int64()), ("n_events", pa.int64()),
         ("sum_cents", pa.int64())]
    ).empty_table()
    return agg.map_batches(
        lambda b: pa.table(
            {
                "window_id": pc.cast(b["w"], pa.int64()),
                "n_events": pc.cast(b["sum(n)"], pa.int64()),
                "sum_cents": pc.cast(b["sum(s)"], pa.int64()),
            }
        ) if len(b.schema) == 3 else empty,
        batch_format="pyarrow",
    )


# ------------------------------------------------------------ anomaly buckets


_ANOMALY_PARTIAL_SCHEMA = pa.schema(
    [("event_type", pa.string()), ("c", pa.int64()), ("s1", pa.int64()), ("s2", pa.int64())]
)


def _anomaly_stats_partial(batch: pa.Table) -> pa.Table:
    # upstream groupby blocks can be empty with a degraded schema (see
    # reco._norm_pairs); emit the full typed schema so the Sum aggregate
    # and the column reads below never see a missing column
    if batch.num_rows == 0 or "n" not in batch.schema.names:
        return _ANOMALY_PARTIAL_SCHEMA.empty_table()
    n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = pa.table(
        {
            "event_type": pc.cast(batch["event_type"], pa.string()),
            "c": pa.array(np.ones(len(n), np.int64)),
            "s1": pa.array(n),
            "s2": pa.array(n * n),
        }
    )
    return t.group_by(["event_type"], use_threads=False).aggregate(
        [("c", "sum"), ("s1", "sum"), ("s2", "sum")]
    ).rename_columns(["event_type", "c", "s1", "s2"])


_ANOMALY_OUT_SCHEMA = pa.schema(
    [("event_type", pa.string()), ("bucket_ts", pa.int64()),
     ("n", pa.int64()), ("z", pa.float64())]
)


def _anomaly_filter(batch: pa.Table, ref, z_thresh: float) -> pa.Table:
    import ray

    if batch.num_rows == 0 or "n" not in batch.schema.names:
        return _ANOMALY_OUT_SCHEMA.empty_table()

    stats = ray.get(ref) if not isinstance(ref, dict) else ref
    et = batch["event_type"].to_numpy(zero_copy_only=False)
    bt = batch["bucket_ts"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    z = np.full(len(n), -np.inf, dtype=np.float64)
    for ty in np.unique(et):
        c, s1, s2 = stats.get(str(ty), (0, 0, 0))
        det = s2 * c - s1 * s1  # c·Σn² − (Σn)² = c²·population variance, exact int
        if c <= 0 or det <= 0:
            continue
        mean = s1 / c
        sd = np.sqrt(float(det) / (float(c) * c))
        m = et == ty
        z[m] = (n[m].astype(np.float64) - mean) / sd
    keep = z > z_thresh
    return pa.table(
        {
            "event_type": pa.array(et[keep], pa.string()),
            "bucket_ts": pa.array(bt[keep]),
            "n": pa.array(n[keep]),
            "z": pa.array(np.round(z[keep], 6), pa.float64()),
        }
    )


def anomaly_buckets_ds(sf_dir: str, z_thresh: float = 3.0):
    """(event_type, bucket_ts, n, z): hourly waveform buckets whose count
    sits more than ``z_thresh`` population standard deviations above that
    event type's bucket mean — the classic ops anomaly gate over the
    waveform the anomaly plugin family renders (SURVEY §2.6).

    Scale shape: the waveform is the existing partial→groupby pipeline;
    the per-type (count, Σn, Σn²) moments are one more answer-sized
    groupby (rows = event types), broadcast once via ray.put; the flag
    pass is stateless per batch. Moments stay exact int64 (at 10^12-event
    scale Σn² needs int128 / a split-accumulator — documented, same
    semantics); z itself is fp64 with a fixed expression order mirrored
    in the SQL oracle. Zero-variance types flag nothing."""
    import ray
    from ray.data.aggregate import Sum

    w = waveform_ds(sf_dir).materialize()
    rows = (
        w.map_batches(_anomaly_stats_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("c"), Sum("s1"), Sum("s2"))
        .take_all()
    )
    stats = {
        str(r["event_type"]): (int(r["sum(c)"]), int(r["sum(s1)"]), int(r["sum(s2)"]))
        for r in rows
    }
    ref = ray.put(stats)
    return w.map_batches(
        _anomaly_filter, fn_kwargs={"ref": ref, "z_thresh": z_thresh},
        batch_format="pyarrow",
    )


# ------------------------------------------------------------- EWMA smoothing

EWMA_UNIT = 1_000_000  # micro-units: the textrank/reco integer-exactness trick


def _ewma_group(g: pa.Table, unit: int) -> pa.Table:
    et = g["event_type"].to_numpy(zero_copy_only=False)
    bt = g["bucket_ts"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(bt)
    bt, n = bt[order], n[order]
    s = np.empty(len(n), dtype=np.int64)
    if len(n):
        s[0] = n[0] * unit
        # the floor recurrence is inherently sequential, and a type's bucket
        # list is answer-sized (time range / bucket width) — not corpus-sized
        for i in range(1, len(n)):
            s[i] = (s[i - 1] + n[i] * unit) // 2
    return pa.table(
        {
            "event_type": pa.array(et[order], pa.string()),
            "bucket_ts": pa.array(bt),
            "n": pa.array(n),
            "ewma": pa.array(s),
        }
    )


def ewma_waveform_ds(sf_dir: str, unit: int = EWMA_UNIT):
    """(event_type, bucket_ts, n, ewma): the hourly waveform with a dyadic
    integer EWMA (α = 1/2): s₁ = n₁·U, s_k = (s_{k-1} + n_k·U) // 2 over
    the OBSERVED buckets in time order (gaps skipped — the metricing
    interpolation variant lives in metric_waveform_ds). Floor arithmetic
    makes every value an exact int64 on any platform, so the oracle is the
    same recurrence as a recursive CTE — the PeakDet state-machine
    precedent. Distribution: the waveform pipeline as-is, then a
    groupby(event_type) map_groups whose per-group work is answer-sized."""
    return (
        waveform_ds(sf_dir)
        .groupby("event_type")
        .map_groups(lambda g: _ewma_group(g, unit), batch_format="pyarrow")
    )


# --------------------------------------------------------- top contributors


def _contrib_partial(batch: pa.Table) -> pa.Table:
    t = pa.table(
        {
            "event_type": pc.cast(batch["event_type"], pa.string()),
            "user_id": pc.cast(batch["user_id"], pa.int64()),
        }
    )
    g = t.group_by(["event_type", "user_id"], use_threads=False).aggregate(
        [([], "count_all")]
    )
    return g.rename_columns(["event_type", "user_id", "n"])


def _contrib_topn(g: pa.Table, n: int) -> pa.Table:
    et = g["event_type"].to_numpy(zero_copy_only=False)
    u = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((u, -cnt))[:n]
    return pa.table(
        {
            "event_type": pa.array(et[order], pa.string()),
            "user_id": pa.array(u[order]),
            "n_events": pa.array(cnt[order]),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        }
    )


def top_contributors_ds(sf_dir: str, n: int = 5):
    """(event_type, user_id, n_events, rank): each event type's top-``n``
    users by event count (ties → smaller user_id). Per-batch (type, user)
    partials → groupby Sum → per-type top-n in groupby(type) map_groups
    (a type's user list is the only per-group state; the cut happens
    before anything reaches the driver)."""
    from ray.data.aggregate import Sum

    def _norm_counts(b: pa.Table) -> pa.Table:
        # sparse groupby output can include empty degraded-schema blocks
        # (see reco._norm_pairs) — always emit the full typed schema
        if b.num_rows == 0 or "event_type" not in b.schema.names:
            return pa.table(
                {"event_type": pa.array([], pa.string()),
                 "user_id": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        return pa.table(
            {"event_type": pc.cast(b["event_type"], pa.string()),
             "user_id": pc.cast(b["user_id"], pa.int64()),
             "n": pc.cast(b[b.schema.names[-1]], pa.int64())}
        )

    counts = (
        _events_ds(sf_dir, ["event_type", "user_id"])
        .map_batches(_contrib_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("n"))
        .map_batches(_norm_counts, batch_format="pyarrow")
    )
    return counts.groupby("event_type").map_groups(
        lambda g: _contrib_topn(g, n), batch_format="pyarrow"
    )

"""Z-score anomaly buckets (analytics.anomaly_buckets_ds) vs a scalar
recompute, plus zero-variance and threshold semantics."""

import math
import os
from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from miru_ray.analytics import anomaly_buckets_ds

SF = "/root/testdata/sf0.001"


def _scalar_anomalies(rows, z_thresh):
    buckets = Counter()
    for ty, ts_us in rows:
        buckets[(ty, (ts_us // 3_600_000_000) * 3600)] += 1
    per_type = defaultdict(list)
    for (ty, b), n in buckets.items():
        per_type[ty].append((b, n))
    out = []
    for ty, bs in per_type.items():
        c = len(bs)
        s1 = sum(n for _, n in bs)
        s2 = sum(n * n for _, n in bs)
        det = s2 * c - s1 * s1
        if det <= 0:
            continue
        mean = s1 / c
        sd = math.sqrt(det / (float(c) * c))
        for b, n in bs:
            z = (n - mean) / sd
            if z > z_thresh:
                out.append((ty, b, n, round(z, 6)))
    return sorted(out)


def test_anomaly_vs_scalar(ray_session):
    t = pq.read_table(os.path.join(SF, "events.parquet"), columns=["event_type", "ts"])
    rows = list(
        zip(
            t["event_type"].to_pylist(),
            t["ts"].cast(pa.int64()).to_pylist(),
        )
    )
    for z in (1.5, 3.0):
        got = anomaly_buckets_ds(SF, z_thresh=z).to_pandas()
        got_rows = sorted(
            zip(got["event_type"], got["bucket_ts"], got["n"], got["z"])
        )
        assert got_rows == _scalar_anomalies(rows, z)
    assert len(_scalar_anomalies(rows, 1.5)) > 0  # the fixture has outliers


def test_anomaly_zero_variance(ray_session, tmp_path):
    """A type whose every bucket has the same count flags nothing; a spike
    type flags exactly its spike bucket."""
    hours = 3_600_000_000
    ts, ty = [], []
    for h in range(8):  # 'flat': one event per hour
        ts.append(h * hours + 5)
        ty.append("flat")
    for h in range(8):  # 'spiky': 1/hour, then 50 in hour 8
        ts.append(h * hours + 7)
        ty.append("spiky")
    ts.extend([8 * hours + i for i in range(50)])
    ty.extend(["spiky"] * 50)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(ts)), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([1] * len(ts), pa.int64()),
                "event_type": pa.array(ty),
                "value": pa.array([0.0] * len(ts)),
                "props": pa.array(["{}"] * len(ts)),
            }
        ),
        os.path.join(tmp_path, "events.parquet"),
    )
    got = anomaly_buckets_ds(str(tmp_path), z_thresh=2.0).to_pandas()
    assert set(got["event_type"]) == {"spiky"}
    assert got["n"].tolist() == [50]
    assert got["bucket_ts"].tolist() == [8 * 3600]


def test_ewma_vs_scalar(ray_session):
    """Integer EWMA ≡ a scalar recurrence over the per-type time-ordered
    waveform."""
    from miru_ray.analytics import ewma_waveform_ds

    t = pq.read_table(os.path.join(SF, "events.parquet"), columns=["event_type", "ts"])
    buckets = Counter()
    for ty, ts_us in zip(
        t["event_type"].to_pylist(), t["ts"].cast(pa.int64()).to_pylist()
    ):
        buckets[(ty, (ts_us // 3_600_000_000) * 3600)] += 1
    per_type = defaultdict(list)
    for (ty, b), n in buckets.items():
        per_type[ty].append((b, n))
    exp = []
    U = 1_000_000
    for ty, bs in per_type.items():
        s = None
        for b, n in sorted(bs):
            s = n * U if s is None else (s + n * U) // 2
            exp.append((ty, b, n, s))
    got = ewma_waveform_ds(SF).to_pandas()
    got_rows = sorted(zip(got["event_type"], got["bucket_ts"], got["n"], got["ewma"]))
    assert got_rows == sorted(exp)

"""Item-item CF similarity (reco.reco_item_sim_ds) vs a scalar recompute."""

import math
import os
from collections import defaultdict

import pyarrow.parquet as pq

from miru_ray.reco import reco_item_sim_ds

SF = "/root/testdata/sf0.001"


def _scalar_item_sim(sf_dir, k, cap):
    t = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type", "props"],
    )
    by_user = defaultdict(set)
    users_of = defaultdict(set)
    for u, ty, pr in zip(
        t["user_id"].to_pylist(), t["event_type"].to_pylist(), t["props"].to_pylist()
    ):
        if ty == "error":
            continue
        digits = "".join(c for c in pr if c.isdigit())
        if not digits:
            continue
        item = int(digits)
        by_user[u].add(item)
        users_of[item].add(u)
    common = defaultdict(int)
    for u, items in by_user.items():
        lst = sorted(items)[:cap]
        for i in range(len(lst)):
            for j in range(i + 1, len(lst)):
                common[(lst[i], lst[j])] += 1
    rows = []
    for (a, b), n in common.items():
        sim = n / math.sqrt(float(len(users_of[a])) * len(users_of[b]))
        rows.append((a, b, n, sim))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return [(a, b, n, round(s, 6)) for a, b, n, s in rows[:k]]


def test_item_sim_vs_scalar(ray_session):
    for k in (5, 20):
        got = reco_item_sim_ds(SF, k=k).to_pandas()
        rows = list(zip(got["item_a"], got["item_b"], got["n_common"], got["sim"]))
        assert rows == _scalar_item_sim(SF, k, 256)
    assert len(rows) == 20


def test_item_sim_cap_changes_evidence(ray_session):
    """A tiny cap truncates pair evidence but never user counts — the scalar
    recompute with the same cap agrees."""
    got = reco_item_sim_ds(SF, k=10, cap=3).to_pandas()
    rows = list(zip(got["item_a"], got["item_b"], got["n_common"], got["sim"]))
    assert rows == _scalar_item_sim(SF, 10, 3)

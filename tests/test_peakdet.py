"""PeakDet + trending-strategy parity (PeakDet.java:44-80,
TrendingInjectable.java:143-190) against golden vectors and a scalar
re-derivation."""

import numpy as np
import pytest

from miru_ray.analytics import (
    commons_percentile,
    peakdet,
    regression_slope,
    trending_ranks,
)


def test_peakdet_reference_main_example():
    # PeakDet.java main(): vector with delta=1. Heights are VALUES (the
    # reference's mxpos quirk); the 8-peak triggers at i=12 because
    # 7 < 8-1 is false at i=11 (strict comparison).
    v = [0, 1, 2, 3, 4, 5, 1, 2, 3, 4, 8, 7, 6, 5, 4, 3, 2, 1]
    assert peakdet(v, 1) == [(5.0, 6), (8.0, 12)]


def test_peakdet_edges():
    assert peakdet([], 1) == []
    assert peakdet([3], 1) == []             # never drops → no peak
    assert peakdet([0, 5, 0], 1) == [(5.0, 2)]
    assert peakdet([1, 1, 1, 1], 0.5) == []  # flat
    # two peaks with a valley deep enough to re-arm
    assert peakdet([0, 4, 0, 4, 0], 1) == [(4.0, 2), (4.0, 4)]
    # valley NOT deep enough: second rise never re-arms the detector
    assert peakdet([0, 4, 3, 4, 3], 2) == []


def test_commons_percentile():
    # Commons Math LEGACY: pos = p(n+1)/100
    assert commons_percentile([1.0], 95) == 1.0
    assert commons_percentile([1.0, 2.0], 95) == 2.0  # pos=2.85 >= n → max
    v = list(range(1, 101))  # 1..100: pos = 95*101/100 = 95.95
    assert commons_percentile(v, 95) == pytest.approx(95 + 0.95 * 1)
    assert commons_percentile([5.0, 1.0, 3.0], 50) == 3.0  # sorted median


def test_regression_slope():
    assert regression_slope([0, 1, 2, 3]) == pytest.approx(1.0)
    assert regression_slope([3, 3, 3]) == pytest.approx(0.0)
    assert regression_slope([5]) == 0.0


def test_trending_ranks_strategies():
    wf = {
        "rising": np.array([0, 1, 2, 3, 4, 5]),
        "spiky": np.array([0, 9, 0, 9, 0, 9]),
        "flat": np.array([2, 2, 2, 2, 2, 2]),
        "zero": np.zeros(6, dtype=int),
    }
    r = trending_ranks(wf)
    for strat, rows in r.items():
        assert all(k != "zero" for k, _ in rows), strat  # hasCounts skip
        ranks = [v for _k, v in rows]
        assert ranks == sorted(ranks, reverse=True), strat
    assert r["leader"][0] == ("spiky", 27.0)
    assert r["highest_peak"][0] == ("spiky", 9.0)
    assert r["linear_regression"][0][0] == "rising"
    # spiky: threshold = 9/6 + bucket95/100. bucket95 uses ALL keys incl.
    # zero per the reference's highestBuckets loop → maxes [5,9,2,0] — and
    # the reference quirk passes p=0.95 (not 95) to Commons Percentile
    # (TrendingInjectable.java:137), i.e. ≈ the MINIMUM of the maxes
    spiky_thr = 9 / 6 + commons_percentile([5.0, 9.0, 2.0, 0.0], 0.95) / 100
    assert dict(r["peaks"])["spiky"] == float(len(peakdet(wf["spiky"], spiky_thr)))


def test_index_trending_strategies(ray_session, tiny_transcripts_dir, tmp_path_factory):
    from miru_ray import plugins
    from miru_ray.build import build_index
    from miru_ray.search import SearchEngine

    d = str(tmp_path_factory.mktemp("idx_trend"))
    build_index(tiny_transcripts_dir, d, n_parts=4)
    eng = SearchEngine(d)
    for strat in ("leader", "highest_peak", "peaks", "linear_regression"):
        rows = plugins.trending(eng, ["t1", "t2", "w00042"], 3_600_000_000, strategy=strat)
        assert rows == plugins.trending(eng, ["t1", "t2", "w00042"], 3_600_000_000, strategy=strat)
        assert [v for _q, v in rows] == sorted((v for _q, v in rows), reverse=True)
    lead = dict(plugins.trending(eng, ["t1", "w00042"], 3_600_000_000, strategy="leader"))
    # leader rank == total matching docs
    assert lead["t1"] == float(eng.search("t1", k=1)[1])

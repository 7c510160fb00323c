"""Bloom co-occurrence sketch: sizing formulas, no false negatives, fpp
sanity, and cross-check of the batch stage against scalar hashing
(BloomIndex.java:50-135, MiruIndexBloom.java:40-90)."""

import numpy as np
import pyarrow as pa
import pytest

from miru_ray.bloom import (
    BloomStage,
    bloom_bit_indexes,
    might_contain,
    optimal_num_bits,
    optimal_num_hashes,
)


def test_sizing_formulas_match_reference():
    # BloomIndex.java:64-73: m = -n ln p / ln^2 2 ; k = round(m/n ln 2)
    assert optimal_num_bits(100_000, 0.01) == int(
        -100_000 * np.log(0.01) / (np.log(2) ** 2)
    )
    m = optimal_num_bits(1024, 0.01)
    assert optimal_num_hashes(1024, m) == max(1, round(m / 1024 * np.log(2)))


def test_no_false_negatives_and_fpp():
    rng = np.random.default_rng(3)
    keys = [f"k{i%4}" for i in range(400)]
    words = [f"w{rng.integers(0, 5000):05d}" for _ in range(400)]
    batch = pa.table(
        {"source": pa.array(keys), "text": pa.array(words)}
    )
    stage = BloomStage(key_col="source")
    out = stage(batch)
    bloom = {}
    for k, b in zip(out["key"].to_pylist(), out["bit"].to_pylist()):
        bloom.setdefault(k, []).append(b)
    bloom = {k: np.asarray(sorted(v), dtype=np.int64) for k, v in bloom.items()}
    # every inserted (key, word) must test positive
    for k, w in zip(keys, words):
        assert might_contain(bloom, k, w), (k, w)
    # absent words mostly test negative (fpp ~1%, allow generous slack)
    absent = [f"z{j:06d}" for j in range(2000)]
    fp = sum(might_contain(bloom, "k0", w) for w in absent) / len(absent)
    assert fp < 0.05, fp
    assert might_contain(bloom, "nosuchkey", "w00001") is False


def test_stage_matches_scalar_bits():
    batch = pa.table(
        {"source": pa.array(["a", "a", "b"]), "text": pa.array(["x y", "y", "x"])}
    )
    stage = BloomStage(key_col="source")
    out = stage(batch)
    got = {(k, b) for k, b in zip(out["key"].to_pylist(), out["bit"].to_pylist())}
    exp = set()
    for key, toks in [("a", ["x", "y"]), ("b", ["x"])]:
        for t in toks:
            for b in bloom_bit_indexes(pa.array([t]), stage.num_bits, stage.num_hashes)[0]:
                exp.add((key, int(b)))
    assert got == exp

"""Bloom co-occurrence index (the reference's bloom feature bundle).

The reference maintains, for a field pair (F, B), one bloom filter per
F-term holding all B-values co-occurring with it — a "might contain"
sketch for cheap co-occurrence checks (reference:
miru-plugin/.../index/BloomIndex.java:50-73 — optimal bits/hashes
formulas — and miru-service/.../stream/MiruIndexBloom.java:40-90, which
composes per-F-term value lists at index time; feature flag
MiruFieldDefinition bloom, MiruSchema.getBloomFieldDefinitions).

Ray-native re-expression: a map_batches stage emits DISTINCT (key, bit)
pairs per batch (the per-batch combiner), a tiny groupby(key) collects
each key's bit set, and membership tests run against the collected
sketch. Hashing is double hashing over our deterministic primitives
(h1 = fnv1a64(value), h2 = splitmix64(h1)|1, bit_i = (h1 + i·h2) mod m —
same scheme class as the reference's Guava murmur3 double hashing;
the hash family itself is an implementation detail, the bits/hashes
sizing formulas are copied exactly).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import fnv1a64, splitmix64
from .tokenize import tokenize_flat

DEFAULT_EXPECTED_INSERTIONS = 1024
DEFAULT_FPP = 0.01


def optimal_num_bits(n: int, p: float) -> int:
    """BloomIndex.optimalNumOfBits (BloomIndex.java:64-69)."""
    if p == 0:
        p = 5e-324
    return int(-n * math.log(p) / (math.log(2) * math.log(2)))


def optimal_num_hashes(n: int, m: int) -> int:
    """BloomIndex.optimalNumOfHashFunctions (BloomIndex.java:71-73)."""
    return max(1, round(m / n * math.log(2)))


def bloom_bit_indexes(values: pa.Array, num_bits: int, num_hashes: int) -> np.ndarray:
    """(len(values), num_hashes) int64 bit indexes via double hashing."""
    h1 = fnv1a64(values)
    h2 = splitmix64(h1) | np.uint64(1)
    i = np.arange(num_hashes, dtype=np.uint64)
    with np.errstate(over="ignore"):
        bits = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(num_bits)
    return bits.astype(np.int64)


class BloomStage:
    """map_batches stage: documents batch → DISTINCT (key, bit) pairs of
    the key column's bloom sketch over the text tokens (sketch parameters
    fixed per actor in __init__ — the stateful-stage pattern)."""

    def __init__(self, key_col: str = "source",
                 expected_insertions: int = DEFAULT_EXPECTED_INSERTIONS,
                 fpp: float = DEFAULT_FPP):
        self.key_col = key_col
        self.num_bits = optimal_num_bits(expected_insertions, fpp)
        self.num_hashes = optimal_num_hashes(expected_insertions, self.num_bits)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col]
        keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        parents, tokens = tokenize_flat(batch["text"])
        if len(parents) == 0:
            return pa.table({"key": pa.array([], pa.string()), "bit": pa.array([], pa.int64())})
        kenc = keys.dictionary_encode()
        kcodes = kenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)[parents]
        bits = bloom_bit_indexes(tokens, self.num_bits, self.num_hashes)
        # distinct (key, bit) per batch — the pre-shuffle combiner
        flat_key = np.repeat(kcodes, self.num_hashes)
        flat_bit = bits.reshape(-1)
        comp = flat_key * np.int64(self.num_bits) + flat_bit
        uniq = np.unique(comp)
        out_key = kenc.dictionary.take(pa.array(uniq // self.num_bits))
        out_bit = uniq % self.num_bits
        return pa.table({"key": pc.cast(out_key, pa.string()), "bit": pa.array(out_bit)})


def build_bloom(sf_dir: str, key_col: str = "source",
                expected_insertions: int = DEFAULT_EXPECTED_INSERTIONS,
                fpp: float = DEFAULT_FPP) -> dict[str, np.ndarray]:
    """key → sorted bloom bit array over sf_dir/documents (distributed:
    per-batch distinct pairs → global groupby dedup; the collected sketch
    is small: ≤ num_bits per key)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=[key_col, "text"]
    ).map_batches(
        BloomStage,
        fn_constructor_kwargs={
            "key_col": key_col, "expected_insertions": expected_insertions, "fpp": fpp,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 2),
    )
    rows = ds.groupby(["key", "bit"]).aggregate(Count()).take_all()
    out: dict[str, list[int]] = {}
    for r in rows:
        out.setdefault(r["key"], []).append(int(r["bit"]))
    return {k: np.asarray(sorted(v), dtype=np.int64) for k, v in out.items()}


def might_contain(bloom: dict[str, np.ndarray], key: str, value: str,
                  expected_insertions: int = DEFAULT_EXPECTED_INSERTIONS,
                  fpp: float = DEFAULT_FPP) -> bool:
    """The mightContain check (BloomIndex.java:105-135): True if every
    hash bit of ``value`` is set in ``key``'s sketch. No false negatives;
    false positives at ≈ fpp."""
    bits_set = bloom.get(key)
    if bits_set is None or len(bits_set) == 0:
        return False
    m = optimal_num_bits(expected_insertions, fpp)
    k = optimal_num_hashes(expected_insertions, m)
    want = bloom_bit_indexes(pa.array([value], type=pa.string()), m, k)[0]
    pos = np.searchsorted(bits_set, want)
    ok = (pos < len(bits_set)) & (bits_set[np.minimum(pos, len(bits_set) - 1)] == want)
    return bool(ok.all())


def bloom_summary_ds(sf_dir: str, key_col: str = "source") -> pa.Table:
    """Deterministic, SQL-checkable sketch summary: per key, the number of
    set bits and their sum (the driver-oracle surface — bloom bits are a
    pure function of the distinct (key, token) pairs)."""
    bloom = build_bloom(sf_dir, key_col)
    keys = sorted(bloom)
    return pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "n_bits": pa.array([len(bloom[k]) for k in keys], pa.int64()),
            "bits_sum": pa.array([int(bloom[k].sum()) for k in keys], pa.int64()),
        }
    )

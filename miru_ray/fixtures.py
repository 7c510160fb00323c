"""Deterministic synthetic transcripts generator (FIXTURES.md F1).

Produces the exact input-table shape mandated by BASELINE.json input_hint:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])`` — multi-turn conversation / agent transcripts.

Mirrors the reference's own end-to-end test recipe (reference:
miru-stream-plugins-test/.../fulltext/MiruFullTextNGTest.java:79-91,191-213 —
random docs drawn from a small dictionary so AND queries have dense matches)
extended with a Zipf body vocabulary and per-conv unique terms to exercise
df=1 postings and hot-term skew.

Everything is **counter-based** (splitmix64 over (seed, conv, turn, slot))
so generation is chunk-invariant: the row for (conv_id, turn_idx) is
identical regardless of batch boundaries or parallelism — the property that
makes fixture-backed tests of resumability and parallelism-invariance valid.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .hashing import splitmix64, u64_to_unit

SEED = 42
CORE_TERMS = [f"t{h:x}" for h in range(16)]  # high-frequency core dictionary
N_BODY = 10_000  # w00000..w09999, Zipf-ish
ZIPF_S = 1.1
ROLES = ["user", "assistant", "tool"]
BASE_TS_US = 1_700_000_000_000_000  # fixed epoch base, microseconds

SCALES = {"tiny": 200, "small": 5_000, "bench": 100_000}

TRANSCRIPTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _mix(*counters: np.ndarray | int) -> np.ndarray:
    """Combine counters into one uint64 stream deterministically."""
    acc = np.asarray(np.uint64(SEED))
    with np.errstate(over="ignore"):
        for c in counters:
            acc = splitmix64(acc * np.uint64(0x9E3779B97F4A7C15) + np.asarray(c, dtype=np.uint64))
    return acc


# Zipf CDF over body terms, precomputed once (deterministic).
_ZIPF_W = 1.0 / np.power(np.arange(1, N_BODY + 1, dtype=np.float64), ZIPF_S)
_ZIPF_CDF = np.cumsum(_ZIPF_W) / _ZIPF_W.sum()


def conv_turn_counts(conv_ids: np.ndarray) -> np.ndarray:
    """turns_per_conv ∈ [2, 40], deterministic per conv."""
    return (2 + _mix(conv_ids, 101) % np.uint64(39)).astype(np.int64)


def make_transcripts(
    n_convs: int, conv_lo: int = 0, conv_hi: int | None = None
) -> pa.Table:
    """Generate the transcript rows for convs [conv_lo, conv_hi) of an
    ``n_convs``-conversation corpus (slice-invariant)."""
    conv_hi = n_convs if conv_hi is None else min(conv_hi, n_convs)
    convs = np.arange(conv_lo, conv_hi, dtype=np.uint64)
    nturns = conv_turn_counts(convs)
    n_rows = int(nturns.sum())
    conv_rep = np.repeat(convs, nturns)
    starts = np.zeros(len(convs), dtype=np.int64)
    np.cumsum(nturns[:-1], out=starts[1:])
    turn = np.arange(n_rows, dtype=np.int64) - np.repeat(starts, nturns)

    # role: cycle with per-conv offset
    offset = (_mix(conv_rep, 202) % np.uint64(3)).astype(np.int64)
    role_idx = (turn + offset) % 3
    # tool column: "" unless role==tool
    tool_k = (_mix(conv_rep, np.asarray(turn, dtype=np.uint64), 303) % np.uint64(8)).astype(np.int64)

    # per-turn token count ∈ [5, 200]
    n_tok = (5 + _mix(conv_rep, np.asarray(turn, dtype=np.uint64), 404) % np.uint64(196)).astype(
        np.int64
    )
    tok_total = int(n_tok.sum())
    row_rep = np.repeat(np.arange(n_rows, dtype=np.int64), n_tok)
    tok_starts = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(n_tok[:-1], out=tok_starts[1:])
    slot = np.arange(tok_total, dtype=np.int64) - np.repeat(tok_starts, n_tok)

    r = _mix(conv_rep[row_rep], np.asarray(turn[row_rep], dtype=np.uint64), np.asarray(slot, dtype=np.uint64), 505)
    u = u64_to_unit(r)
    kind = u64_to_unit(_mix(r, 606))
    # 35% core, 63% body(Zipf), 2% per-conv unique
    is_core = kind < 0.35
    is_uniq = kind >= 0.98
    core_pick = (r % np.uint64(len(CORE_TERMS))).astype(np.int64)
    body_pick = np.searchsorted(_ZIPF_CDF, u, side="left")

    # Build token strings vectorized via a term dictionary + indices
    vocab = list(CORE_TERMS) + [f"w{i:05d}" for i in range(N_BODY)]
    term_idx = len(CORE_TERMS) + body_pick
    term_idx[is_core] = core_pick[is_core]
    # unique terms: append per-conv terms at end of dictionary on demand
    uniq_convs = np.unique(conv_rep[row_rep][is_uniq])
    uniq_base = len(vocab)
    uniq_map = {int(c): uniq_base + i for i, c in enumerate(uniq_convs)}
    vocab.extend(f"u{int(c):08d}x" for c in uniq_convs)
    if is_uniq.any():
        term_idx[is_uniq] = np.array(
            [uniq_map[int(c)] for c in conv_rep[row_rep][is_uniq]], dtype=np.int64
        )

    vocab_arr = pa.array(vocab, type=pa.string())
    tokens = vocab_arr.take(pa.array(term_idx))
    # join tokens per row: build text via ListArray → binary_join
    import pyarrow.compute as pc

    lists = pa.ListArray.from_arrays(
        pa.array(np.concatenate([tok_starts, [tok_total]]), type=pa.int32()), tokens
    )
    text = pc.binary_join(lists, " ")

    conv_str = pa.array([f"conv-{int(c):08d}" for c in conv_rep], type=pa.string())
    role = pa.array(ROLES, type=pa.string()).take(pa.array(role_idx))
    tool = pa.array(
        np.where(role_idx == 2, tool_k, -1), type=pa.int64()
    )
    tool_names = pa.array(["" ] + [f"tool-{k}" for k in range(8)], type=pa.string())
    tool_col = tool_names.take(pa.array((tool.to_numpy() + 1)))

    # ts: global monotonically increasing in stable (conv_id, turn_idx) order.
    # Global turn rank = (start offset of conv within the FULL corpus) + turn.
    all_convs = np.arange(n_convs, dtype=np.uint64)
    all_nturns = conv_turn_counts(all_convs)
    global_starts = np.zeros(n_convs, dtype=np.int64)
    np.cumsum(all_nturns[:-1], out=global_starts[1:])
    grank = global_starts[conv_rep.astype(np.int64)] + turn
    ts = pa.array(BASE_TS_US + grank * 1_000_000, type=pa.timestamp("us"))

    return pa.table(
        {
            "conv_id": conv_str,
            "turn_idx": pa.array(turn.astype(np.int32), type=pa.int32()),
            "role": role,
            "text": text,
            "tool": tool_col,
            "ts": ts,
        },
        schema=TRANSCRIPTS_SCHEMA,
    )


def ensure_transcripts(scale: str = "tiny", base_dir: str = "/tmp/miru_ray_fixtures",
                       shard_rows: int = 12_500) -> str:
    """Write (once) and return the path of the transcripts parquet dir for a
    named scale. Shard size is chosen so the file count comfortably exceeds
    worker parallelism (the streaming build's phase-2 unit is one file; at
    100 TB the input is tens of thousands of files, so the bench corpus
    should be many files too, not a handful)."""
    n_convs = SCALES[scale]
    out = os.path.join(base_dir, f"transcripts_{scale}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    tmp = out + ".tmp"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    # shard by conv ranges so each file is self-contained & deterministic
    convs_per_shard = max(1, shard_rows // 21)  # ~21 turns/conv average
    shard = 0
    lo = 0
    while lo < n_convs:
        hi = min(n_convs, lo + convs_per_shard)
        t = make_transcripts(n_convs, lo, hi)
        pq.write_table(t, os.path.join(tmp, f"shard-{shard:05d}.parquet"))
        shard += 1
        lo = hi
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.rename(tmp, out)
    with open(done, "w") as f:
        f.write("ok")
    return out

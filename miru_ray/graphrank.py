"""Shared integer-PageRank kernels.

The exact micro-unit arithmetic both graph operators (textstats.textrank_ds,
reco.reco_ppr_ds) run distributed — rank//degree floor outflow,
(teleport) + (85·inflow)//100 damping — as a LOCAL numpy loop for graphs
below the operators' declared small-graph threshold. Both paths compute
the identical integers (int64 adds via np.add.at, never float bincount
weights — exactness is the contract), so the threshold changes latency,
never answers; the equality is pytest-gated from both sides.
"""

from __future__ import annotations

import numpy as np


def integer_pagerank_local(
    src: np.ndarray,
    dst: np.ndarray,
    n_nodes: int,
    iters: int,
    unit: int,
    seed_node: int | None = None,
) -> np.ndarray:
    """Ranks (int64[n_nodes]) after ``iters`` rounds over directed edge
    code arrays. ``seed_node=None`` = uniform init + uniform teleport
    (TextRank); a seed code = personalized init/teleport (PPR)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    deg = np.bincount(src, minlength=n_nodes).astype(np.int64)
    base = (15 * unit) // 100
    if seed_node is None:
        r = np.full(n_nodes, unit, dtype=np.int64)
        tele = np.full(n_nodes, base, dtype=np.int64)
    else:
        r = np.zeros(n_nodes, dtype=np.int64)
        r[seed_node] = unit
        tele = np.zeros(n_nodes, dtype=np.int64)
        tele[seed_node] = base
    safe_deg = np.maximum(deg, 1)
    for _ in range(iters):
        contrib = r[src] // safe_deg[src]
        inflow = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(inflow, dst, contrib)
        r = tele + (85 * inflow) // 100
    return r


def triangle_counts_local(
    lex_u: np.ndarray, lex_v: np.ndarray, n_nodes: int
) -> np.ndarray:
    """Per-vertex triangle counts (int64[n_nodes]) over a DISTINCT
    lexicographically oriented edge list (u < v as codes). Node-iterator
    with degree-ordered orientation: every triangle is found exactly once
    as a wedge at its lowest-(deg, code) vertex closed by the lex edge
    set. Fully vectorized — wedge mass is Σ d⁺(u)², degeneracy-bounded by
    the orientation, and the local path only runs below the caller's
    declared edge threshold."""
    lex_u = np.asarray(lex_u, dtype=np.int64)
    lex_v = np.asarray(lex_v, dtype=np.int64)
    out = np.zeros(n_nodes, dtype=np.int64)
    m = len(lex_u)
    if m == 0 or n_nodes < 3:
        return out
    deg = np.bincount(lex_u, minlength=n_nodes) + np.bincount(lex_v, minlength=n_nodes)
    # orient each edge from its lower (deg, code) endpoint
    key_u = deg[lex_u].astype(np.int64) * n_nodes + lex_u
    key_v = deg[lex_v].astype(np.int64) * n_nodes + lex_v
    fwd = key_u < key_v
    src = np.where(fwd, lex_u, lex_v)
    dst = np.where(fwd, lex_v, lex_u)
    # group out-neighbors by src; all (i < j) pairs per group = wedges
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    starts = np.flatnonzero(np.concatenate([[True], src[1:] != src[:-1]]))
    counts = np.diff(np.concatenate([starts, [m]]))
    # pair expansion: cross every edge row with its whole out-neighbor
    # group (Σ d⁺² rows), then keep the i < j half — no index decode math
    grp_of_row = np.repeat(np.arange(len(starts)), counts)
    d_row = counts[grp_of_row]
    total2 = int(d_row.sum())
    if total2 == 0:
        return out
    lhs = np.repeat(np.arange(m), d_row)
    off = np.arange(total2) - np.repeat(np.concatenate([[0], np.cumsum(d_row)[:-1]]), d_row)
    rhs = np.repeat(starts[grp_of_row], d_row) + off
    keep_half = lhs < rhs
    lhs, rhs = lhs[keep_half], rhs[keep_half]
    a = dst[lhs]
    b = dst[rhs]
    w = src[lhs]
    x = np.minimum(a, b)
    y = np.maximum(a, b)
    # close wedges against the lex edge set
    ekey = np.sort(lex_u * n_nodes + lex_v)
    wkey = x * n_nodes + y
    pos = np.searchsorted(ekey, wkey)
    closed = (pos < len(ekey)) & (ekey[np.minimum(pos, len(ekey) - 1)] == wkey)
    for arr in (w[closed], x[closed], y[closed]):
        np.add.at(out, arr, 1)
    return out

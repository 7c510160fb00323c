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

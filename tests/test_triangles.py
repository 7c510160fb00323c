"""Triangle counting: local kernel vs brute force, and the distributed
Dataset path vs the local fast path (identical integers by contract)."""

from itertools import combinations

import numpy as np

from miru_ray.graphrank import triangle_counts_local

SF = "/root/testdata/sf0.001"


def test_triangle_kernel_vs_brute():
    rng = np.random.default_rng(11)
    for _ in range(60):
        n = int(rng.integers(3, 22))
        A = np.triu(rng.random((n, n)) < rng.uniform(0.05, 0.5), 1)
        u, v = np.nonzero(A)
        got = triangle_counts_local(u, v, n)
        S = A | A.T
        exp = np.zeros(n, dtype=np.int64)
        for a, b, c in combinations(range(n), 3):
            if S[a, b] and S[a, c] and S[b, c]:
                exp[a] += 1
                exp[b] += 1
                exp[c] += 1
        assert np.array_equal(got, exp)


def test_triangle_kernel_edge_cases():
    assert triangle_counts_local(np.array([]), np.array([]), 0).size == 0
    # single edge / path of 2 — no triangles
    assert triangle_counts_local(np.array([0]), np.array([1]), 3).sum() == 0
    # one explicit triangle
    got = triangle_counts_local(np.array([0, 0, 1]), np.array([1, 2, 2]), 3)
    assert got.tolist() == [1, 1, 1]


def test_triangles_distributed_equals_local(ray_session):
    """Forcing the distributed join path (small_graph_edges=0) yields the
    same (term, triangles) integers as the local kernel."""
    from miru_ray.textstats import triangle_counts_ds

    loc = triangle_counts_ds(SF).to_pandas().sort_values("term").reset_index(drop=True)
    dist = (
        triangle_counts_ds(SF, small_graph_edges=0)
        .to_pandas().sort_values("term").reset_index(drop=True)
    )
    assert loc.equals(dist)
    assert (loc["triangles"] > 0).all()
    assert len(loc) > 0

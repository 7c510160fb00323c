"""JL random projection (ann.jl_project_ds): shape/determinism and the
realized pairwise-distance distortion on the real embeddings."""

import numpy as np
import pyarrow.parquet as pq

from miru_ray.ann import hyperplanes, jl_project_ds

SF = "/root/testdata/sf0.001"


def test_jl_matches_numpy_and_distortion(ray_session):
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    out_dim = 16
    got = jl_project_ds(SF, out_dim=out_dim, dim=m.shape[1]).to_pandas()
    assert len(got) == len(ids) * out_dim
    proj_exp = (m @ hyperplanes(m.shape[1], out_dim).T) / np.sqrt(out_dim)
    g = got.sort_values(["vec_id", "dim"])
    order = np.argsort(ids)
    np.testing.assert_allclose(
        g["value"].to_numpy().reshape(len(ids), out_dim),
        np.round(proj_exp[order], 4),
        atol=1e-9,
    )
    # realized distortion on a sample of pairs: squared distances preserved
    # within the JL regime for k=16 (loose 3-sigma-ish bound, deterministic)
    rng = np.random.default_rng(5)
    a = rng.integers(0, len(m), 200)
    b = rng.integers(0, len(m), 200)
    keep = a != b
    a, b = a[keep], b[keep]
    d_orig = np.sum((m[a] - m[b]) ** 2, axis=1)
    d_proj = np.sum((proj_exp[a] - proj_exp[b]) ** 2, axis=1)
    ratio = d_proj / d_orig
    assert 0.8 < np.median(ratio) < 1.25
    assert (np.abs(np.log(ratio)) < np.log(3.0)).mean() > 0.95

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_transcripts_dir():
    from miru_ray.fixtures import ensure_transcripts

    return ensure_transcripts("tiny")


@pytest.fixture(scope="session")
def tiny_rows(tiny_transcripts_dir):
    """The tiny corpus as python row dicts (oracle input), ts in microseconds."""
    import glob

    import pyarrow.parquet as pq

    rows = []
    for f in sorted(glob.glob(tiny_transcripts_dir + "/*.parquet")):
        t = pq.read_table(f)
        d = t.to_pydict()
        for i in range(t.num_rows):
            rows.append(
                {
                    "conv_id": d["conv_id"][i],
                    "turn_idx": d["turn_idx"][i],
                    "role": d["role"][i],
                    "text": d["text"][i],
                    "tool": d["tool"][i],
                    "ts": int(d["ts"][i].timestamp() * 1_000_000),
                }
            )
    return rows


@pytest.fixture(scope="session")
def tiny_oracle(tiny_rows):
    from miru_ray.oracle import build_oracle_partitions

    return build_oracle_partitions(tiny_rows, n_parts=4)

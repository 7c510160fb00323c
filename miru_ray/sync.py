"""One-way incremental index replication — the miru-sync analogue.

The reference runs a sync tier (``miru-sync-deployable``: per-tenant
forward/reverse syncers walking the WAL cursor space) that copies a
tenant's partitions from one cluster to another for DR and read locality.
This engine's durable unit is the partition segment directory
(``part=NNNNN/`` with ``_MANIFEST.json`` written last, plus mutation
sidecars — tombstones, inbox state), so replication here is segment-level
file sync:

- **Incremental**: a partition is skipped when its file inventory
  (name → size, plus the manifest bytes) already matches the replica;
  ``checksum=True`` upgrades the equality test to a streaming CRC of
  every same-size file (catches same-size content drift at the cost of
  reading the replica).
- **Partition-atomic (two renames)**: a changed partition is staged as a
  sibling tmp dir and swapped in by renaming the old dir aside and the
  staged dir in — a reader never sees a half-copied mix. The swap is NOT
  a single atomic exchange: between the two renames (and after a crash
  there) the partition is briefly absent from the replica; ``sync_index``
  repairs that state on its next run by restoring the set-aside dir
  before anything else, and serving replicas should be re-synced before
  being handed to readers after a crashed sync.
- **Resumable / idempotent**: re-running after a crash copies only what
  still differs; nothing is ever rewritten in place.
- **Parallel**: one Ray task per partition when Ray is up (the 100-TB
  shape: partitions live on many nodes; each node syncs its own).
- The global manifest (``index.json``) is written LAST, so a fresh
  replica never looks complete while partitions are missing, and stale
  replica partitions absent from the source are removed first.

``verify_sync`` is the read-only audit: per-partition equal/differs
without copying anything.
"""

from __future__ import annotations

import os
import shutil
import zlib

from .segments import completed_parts, part_dir

# ray.remote-wrapped helpers, exported once per session (plugins pattern)
_REMOTE_FNS: dict = {}


def _inventory(d: str) -> dict[str, int] | None:
    """name → size for a partition dir; None when absent/incomplete."""
    if not os.path.exists(os.path.join(d, "_MANIFEST.json")):
        return None
    return {
        name: os.path.getsize(os.path.join(d, name))
        for name in sorted(os.listdir(d))
        if not name.endswith(".tmp")
    }


def _crc(path: str, chunk: int = 1 << 20) -> int:
    c = 0
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                return c
            c = zlib.crc32(b, c)


def _part_equal(sd: str, dd: str, checksum: bool) -> bool:
    si, di = _inventory(sd), _inventory(dd)
    if si is None or di is None or si != di:
        return False
    # manifest bytes always compared (cheap, and it carries the epoch set)
    with open(os.path.join(sd, "_MANIFEST.json"), "rb") as f:
        sm = f.read()
    with open(os.path.join(dd, "_MANIFEST.json"), "rb") as f:
        dm = f.read()
    if sm != dm:
        return False
    if checksum:
        for name in si:
            if _crc(os.path.join(sd, name)) != _crc(os.path.join(dd, name)):
                return False
    return True


def sync_partition(src_dir: str, dst_dir: str, part: int,
                   checksum: bool = False) -> dict:
    """Replicate one partition; {'part', 'action': copied|skipped,
    'bytes': copied bytes}."""
    sd, dd = part_dir(src_dir, part), part_dir(dst_dir, part)
    if _part_equal(sd, dd, checksum):
        return {"part": part, "action": "skipped", "bytes": 0}
    # dot-prefixed staging names: completed_parts scans for "part=" dirs,
    # so staging/backup dirs must never match that prefix
    tmp = os.path.join(dst_dir, f".sync-tmp-{part:05d}")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    copied = 0
    names = [n for n in sorted(os.listdir(sd)) if not n.endswith(".tmp")]
    # manifest staged last: a tmp dir without one is recognizably partial
    names.sort(key=lambda n: n == "_MANIFEST.json")
    for name in names:
        shutil.copyfile(os.path.join(sd, name), os.path.join(tmp, name))
        copied += os.path.getsize(os.path.join(tmp, name))
    old = os.path.join(dst_dir, f".sync-old-{part:05d}")
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(dd):
        os.rename(dd, old)
    os.rename(tmp, dd)
    shutil.rmtree(old, ignore_errors=True)
    return {"part": part, "action": "copied", "bytes": copied}


def sync_index(src_dir: str, dst_dir: str, parallel: bool | None = None,
               checksum: bool = False) -> dict:
    """One-way src → dst replica sync. Returns
    {'copied': [...], 'skipped': [...], 'removed': [...], 'bytes': n}."""
    os.makedirs(dst_dir, exist_ok=True)
    src_parts = sorted(completed_parts(src_dir))
    if not src_parts and not os.path.exists(os.path.join(src_dir, "index.json")):
        raise FileNotFoundError(f"not a built index: {src_dir}")
    # crashed staging/backup dirs from an interrupted earlier sync: a
    # .sync-old-NNNNN whose part= dir is MISSING marks a crash between the
    # two swap renames — restore it (the partition must never stay absent);
    # everything else is droppable garbage
    for name in sorted(os.listdir(dst_dir)):
        p = os.path.join(dst_dir, name)
        if name.startswith(".sync-old-"):
            live = part_dir(dst_dir, int(name.rsplit("-", 1)[1]))
            if not os.path.exists(live):
                os.rename(p, live)
            else:
                shutil.rmtree(p, ignore_errors=True)
        elif name.startswith(".sync-tmp-"):
            shutil.rmtree(p, ignore_errors=True)
    # stale replica partitions next (a repair can retire an epoch's files;
    # never leave segments the source no longer has)
    removed = []
    for p in sorted(set(completed_parts(dst_dir)) - set(src_parts)):
        shutil.rmtree(part_dir(dst_dir, p), ignore_errors=True)
        removed.append(p)
    try:
        import ray

        use_ray = (ray.is_initialized() if parallel is None else parallel) \
            and len(src_parts) > 1
    except ImportError:
        use_ray = False
    if use_ray:
        import ray

        fn = _REMOTE_FNS.get(sync_partition)
        if fn is None:
            fn = ray.remote(num_cpus=1)(sync_partition)
            _REMOTE_FNS[sync_partition] = fn
        results = ray.get(
            [fn.remote(src_dir, dst_dir, p, checksum) for p in src_parts]
        )
    else:
        results = [sync_partition(src_dir, dst_dir, p, checksum) for p in src_parts]
    # global manifest LAST (replica becomes "complete" only now)
    src_gm = os.path.join(src_dir, "index.json")
    if os.path.exists(src_gm):
        tmp = os.path.join(dst_dir, "index.json.tmp")
        shutil.copyfile(src_gm, tmp)
        os.replace(tmp, os.path.join(dst_dir, "index.json"))
    return {
        "copied": sorted(r["part"] for r in results if r["action"] == "copied"),
        "skipped": sorted(r["part"] for r in results if r["action"] == "skipped"),
        "removed": removed,
        "bytes": sum(r["bytes"] for r in results),
    }


def verify_sync(src_dir: str, dst_dir: str, checksum: bool = True) -> dict:
    """Read-only audit: which partitions differ between source and replica
    (the sync tier's status endpoint analogue)."""
    src_parts = set(completed_parts(src_dir))
    dst_parts = set(completed_parts(dst_dir))
    differs = [
        p for p in sorted(src_parts & dst_parts)
        if not _part_equal(part_dir(src_dir, p), part_dir(dst_dir, p), checksum)
    ]
    return {
        "equal": sorted(
            p for p in src_parts & dst_parts if p not in set(differs)
        ),
        "differs": differs,
        "missing_in_dst": sorted(src_parts - dst_parts),
        "stale_in_dst": sorted(dst_parts - src_parts),
    }

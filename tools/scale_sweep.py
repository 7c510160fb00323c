"""Run EVERY __ray_entry__.queries() entry at an sf dir (default sf0.1 —
10x the driver's correctness scale) and print per-query wall seconds +
result rows. The all-queries-at-scale sanity artifact behind BASELINE.md's
"Scale sanity" paragraphs.

Usage: python tools/scale_sweep.py [sf_dir] [num_cpus] [name ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    only = set(sys.argv[3:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as e

    out = {}
    failures = 0
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            r = fn(sf_dir)
            if hasattr(r, "num_rows"):
                n = r.num_rows
            elif hasattr(r, "count") and not hasattr(r, "shape"):
                n = r.count()
            else:
                n = len(r)
            sec = round(time.perf_counter() - t0, 2)
            out[name] = {"sec": sec, "rows": int(n)}
            print(f"ok   {name}: {sec}s {n} rows", flush=True)
        except Exception as ex:
            failures += 1
            out[name] = {"error": f"{type(ex).__name__}: {ex}"[:200]}
            print(f"FAIL {name}: {type(ex).__name__}: {ex}", flush=True)
    print(json.dumps({"sf": sf_dir, "num_cpus": cpus, "queries": out}))
    print(f"{failures} failures")
    ray.shutdown()


if __name__ == "__main__":
    main()

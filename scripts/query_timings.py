"""Record per-query wall time + row count for every registry entry in ONE
Ray session (the QUERY_TIMINGS_r{N}.json artifact).

Usage: python scripts/query_timings.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.chdir(_REPO)  # Ray workers resolve dug_ray through the driver cwd


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "QUERY_TIMINGS_r5.json"

    import ray
    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from dug_ray import queries as q

    timings: dict[str, dict] = {}
    t_all = time.time()
    for name, fn in q.QUERIES.items():
        t0 = time.time()
        try:
            res = fn(sf_dir)
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            timings[name] = {"sec": round(time.time() - t0, 1), "rows": len(df)}
        except Exception as exc:  # record, keep going
            timings[name] = {"sec": round(time.time() - t0, 1),
                             "err": f"{type(exc).__name__}: {exc}"[:200]}
        print(f"{name}: {timings[name]}", file=sys.stderr)
    total = round(time.time() - t_all, 1)

    with open(out_path, "w") as f:
        json.dump({"metric": "query_timings", "sf": sf_dir,
                   "total_sec": total, "queries": timings}, f)
    print(json.dumps({"total_sec": total, "n": len(timings),
                      "errs": [k for k, v in timings.items() if "err" in v]}))
    ray.shutdown()


if __name__ == "__main__":
    main()

"""SIGKILL-and-resume demonstration (BASELINE.md protocol step 5).

Launches the resumable run in a child process, SIGKILLs it mid-stage-1,
restarts, and verifies (a) completed shard checkpoints were not recomputed
(mtimes unchanged) and (b) the final triple set is identical to an
uninterrupted run. Prints one JSON line.

    python scripts/kill_resume_demo.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from dug_ray.state.runner import run_resumable
run_resumable({sf_dir!r}, {out!r}, num_shards=8)
ray.shutdown()
"""


def run_child(sf_dir: str, out: str, kill_after: float | None) -> int:
    proc = subprocess.Popen([sys.executable, "-c", CHILD.format(sf_dir=sf_dir, out=out)],
                            cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    if kill_after is None:
        return proc.wait()
    deadline = time.time() + 300
    stage1 = os.path.join(out, "stage1")
    # wait until at least 2 shard checkpoints exist, then SIGKILL
    while time.time() < deadline:
        if proc.poll() is not None:
            return proc.returncode  # finished before we killed it
        n = len([f for f in os.listdir(stage1)
                 if f.endswith(".parquet") and not f.endswith(".tmp")]) \
            if os.path.isdir(stage1) else 0
        if n >= 2:  # >=2 completed shard checkpoints
            break
        time.sleep(0.3)
    os.kill(proc.pid, signal.SIGKILL)
    proc.wait()
    return -9


def triples(out: str) -> set:
    import duckdb
    rows = duckdb.sql(
        f"SELECT subj, pred, obj FROM read_parquet('{out}/part-*.parquet')").fetchall()
    return set(rows)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    base = "/tmp/kill_resume_demo"
    shutil.rmtree(base, ignore_errors=True)
    clean, resumed = f"{base}/clean", f"{base}/resumed"

    rc = run_child(sf_dir, clean, kill_after=None)
    assert rc == 0, f"clean run failed rc={rc}"

    rc = run_child(sf_dir, resumed, kill_after=1.0)
    stage1 = os.path.join(resumed, "stage1")
    # "completed" = recorded complete in the manifest (the resume
    # contract): a kill can land between a shard's atomic rename and its
    # manifest mark, and recomputing such an unmarked shard is correct
    sys.path.insert(0, REPO)
    from dug_ray.state.manifest import PartitionManifest
    done = PartitionManifest(stage1).completed_buckets()
    survivors = {f: os.path.getmtime(os.path.join(stage1, f))
                 for f in (f"shard-{s:05d}.parquet" for s in done)
                 if os.path.exists(os.path.join(stage1, f))}

    rc2 = run_child(sf_dir, resumed, kill_after=None)
    assert rc2 == 0, f"resume run failed rc={rc2}"
    recomputed = [f for f, t in survivors.items()
                  if os.path.getmtime(os.path.join(stage1, f)) != t]

    same = triples(clean) == triples(resumed)
    print(json.dumps({
        "killed_with": "SIGKILL",
        "shards_completed_before_kill": len(survivors),
        "recomputed_completed_shards": recomputed,
        "final_triples_identical": same,
        "n_triples": len(triples(resumed)),
    }))
    assert not recomputed and same


if __name__ == "__main__":
    main()

"""Per-partition lineage manifest for resumable runs.

The reference resumes by file-existence probes on its crawlspace
(``/root/reference/src/dug/core/concept_expander.py:29-33`` reuses a cached
KG JSON per (identifier, query); ``core/index.py:201-202`` skips concepts
already indexed). Here the unit of resume is an output *bucket partition*:

- each completed bucket is one parquet file written ATOMICALLY (tmp file +
  ``os.rename`` on the same filesystem), plus a manifest JSON line with
  row count and content fingerprint;
- a restarted run anti-joins pending buckets against the manifest and only
  recomputes those — completed fragments are never recomputed
  (BASELINE.json resume criterion);
- the manifest itself is rewritten atomically on every update, so a kill at
  any point leaves either the old or the new manifest, never a torn one.
"""

from __future__ import annotations

import json
import os
import tempfile


class PartitionManifest:
    """status of bucket partitions for one output directory."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "_manifest.json")

    def load(self) -> dict[str, dict]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def completed_buckets(self) -> set[int]:
        return {int(k) for k, v in self.load().items() if v.get("status") == "done"}

    def mark_done(self, bucket: int, rows: int, path: str, fingerprint: str = "") -> None:
        self.mark_done_many([(bucket, rows, path, fingerprint)])

    def mark_done_many(self, items) -> None:
        """One atomic rewrite for a batch of completions (O(n) not O(n^2)).

        ``items``: iterable of (bucket, rows, path[, fingerprint])."""
        entries = self.load()
        for item in items:
            bucket, rows, path = item[0], item[1], item[2]
            fingerprint = item[3] if len(item) > 3 else ""
            entries[str(bucket)] = {
                "status": "done", "rows": rows, "path": path,
                "fingerprint": fingerprint,
            }
        self._write(entries)

    def _write(self, entries: dict) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.out_dir, suffix=".manifest.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(entries, f, indent=0, sort_keys=True)
        os.rename(tmp, self.path)


def atomic_write_parquet(table, final_path: str) -> str:
    """Write a pyarrow table to ``final_path`` via tmp-file + rename.
    Returns the md5 fingerprint of the written bytes (lineage metric)."""
    import hashlib

    import pyarrow.parquet as pq
    d = os.path.dirname(final_path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".parquet.tmp")
    os.close(fd)
    pq.write_table(table, tmp)
    h = hashlib.md5()
    with open(tmp, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    os.rename(tmp, final_path)
    return h.hexdigest()

"""Snapshot reconciliation (CDC-style delta detection).

An incremental 100 TB ingestion never re-processes the whole corpus: each
run diffs the new snapshot against the previous one and feeds ONLY the
added/changed keys into the annotate->link->canonicalize pipeline (the
reference re-crawls and re-indexes from scratch each run; reference:
src/dug/core/crawler.py).  ``snapshot_diff`` is the generic reconciler:

- both snapshots are reduced map-side to (key, fingerprint) — the only
  columns that move;
- rows are tagged 'o'/'n', unioned, and bucketed on the key (one
  exchange): each bucket task sees every copy of a key from both sides
  and classifies it added / deleted / changed in one vectorized pandas
  merge.  'same' keys are dropped inside the bucket, so the exchange
  output is delta-sized, not corpus-sized.

Fingerprints are whatever the caller supplies (md5 of content via
dug_ray.hashing for oracle parity; cheaper checksums at scale).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from dug_ray.shuffle import bucketed_group_apply, typed_table


def snapshot_diff(old: ray.data.Dataset,
                  new: ray.data.Dataset,
                  key: str,
                  fingerprint: str,
                  num_buckets: int = 32) -> ray.data.Dataset:
    """Diff two snapshots on ``key``: rows only in ``new`` are 'added',
    only in ``old`` are 'deleted', in both with differing ``fingerprint``
    are 'changed'; identical rows are omitted.  Keys must be unique per
    snapshot (the usual primary-key contract)."""

    def _tag(side: str):
        def _t(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()[[key, fingerprint]].copy()
            df["side"] = side
            return typed_table(df, **{key: pa.int64(),
                                      fingerprint: pa.string(),
                                      "side": pa.string()})
        return _t

    tagged = old.map_batches(_tag("o"), batch_format="pyarrow",
                             batch_size=None) \
        .union(new.map_batches(_tag("n"), batch_format="pyarrow",
                               batch_size=None))

    def _classify(df: pd.DataFrame) -> pa.Table:
        o = df[df["side"] == "o"][[key, fingerprint]]
        n = df[df["side"] == "n"][[key, fingerprint]]
        m = o.merge(n, on=key, how="outer", suffixes=("_o", "_n"),
                    indicator=True)
        status = pd.Series("same", index=m.index)
        status[m["_merge"] == "right_only"] = "added"
        status[m["_merge"] == "left_only"] = "deleted"
        both = m["_merge"] == "both"
        status[both & (m[f"{fingerprint}_o"] != m[f"{fingerprint}_n"])] = \
            "changed"
        out = pd.DataFrame({key: m[key], "status": status})
        out = out[out["status"] != "same"]
        return typed_table(out, **{key: pa.int64(), "status": pa.string()})

    return bucketed_group_apply(tagged, key, _classify, num_buckets)

"""Order-independent table fingerprints — ingest/export integrity checks.

A 100 TB ingest (or a resumed run stitched from checkpointed partitions,
state/runner.py) needs a cheap way to prove two copies of a table hold the
SAME rows without co-sorting either side: an order-independent checksum.
``table_checksum`` reduces each row to a 64-bit md5 and folds the group's
hashes with wrapping uint64 addition — commutative and associative, so the
result is identical no matter how blocks were partitioned, ordered, or
which attempt of a task produced them.

Scale shape: stage 1 is a per-batch combiner (canonical-string build +
vectorized md5 + per-group wrapped sum) that collapses every batch to
O(groups) rows — the only stage that touches input-sized data; stage 2 is
a tiny bucketed merge.  The exchange carries groups x blocks rows, never
the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dug_ray.hashing import md5_uint64
from dug_ray.shuffle import bucketed_group_apply, typed_table

_SEP = "\x1f"  # unit separator: cannot appear in the cast columns


def _wrap_sum(s: pd.Series) -> np.uint64:
    """Wrapping (mod 2^64) sum — numpy uint64 addition wraps silently,
    which is exactly the oracle's ``sum(HUGEINT) % 2^64`` semantics."""
    return np.add.reduce(s.to_numpy(dtype=np.uint64), dtype=np.uint64)


def table_profile(ds: ray.data.Dataset, cols: list[str],
                  num_buckets: int = 8) -> ray.data.Dataset:
    """Per-column data-quality profile: row/null counts, EXACT distinct
    count, lexicographic min/max of the string form.

    One pass, one exchange: each batch melts the profiled columns to
    (col, val) string pairs, keeps the batch-DISTINCT pairs plus one
    count row per column (val NULL, n_rows/n_null populated) — so the
    exchange carries O(cols x distinct values + cols x blocks) rows,
    never the corpus.  Final per-column reduce inside the (col,) bucket.
    Output: ``(col, n_rows, n_null, n_distinct, min_val, max_val)``;
    min/max are over the STRING cast (the SQL mirror casts before
    min/max too, so int columns compare lexicographically on both
    sides).  At 100 TB a column whose distinct count approaches the row
    count (a key) still only moves its values once, pre-deduped per
    batch."""

    def partial(batch: pa.Table) -> pa.Table:
        frames = []
        for c in cols:
            s = pc.cast(batch[c], pa.string()).to_pandas()
            vals = s.dropna().drop_duplicates()
            frames.append(pd.DataFrame({
                "col": c, "val": vals, "n_rows": 0, "n_null": 0}))
            frames.append(pd.DataFrame({
                "col": [c], "val": [None], "n_rows": [len(s)],
                "n_null": [int(s.isna().sum())]}))
        out = pd.concat(frames, ignore_index=True)
        return typed_table(out, col=pa.string(), val=pa.string(),
                           n_rows=pa.int64(), n_null=pa.int64())

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)

    def final(df: pd.DataFrame) -> pa.Table:
        rows = []
        for c, g in df.groupby("col", sort=False):
            # distinct-value rows carry a non-null val (count rows never
            # do: their val is NULL by construction, even for empty batches)
            vals = g.loc[g["val"].notna(), "val"].drop_duplicates()
            rows.append({
                "col": c,
                "n_rows": int(g["n_rows"].sum()),
                "n_null": int(g["n_null"].sum()),
                "n_distinct": int(len(vals)),
                "min_val": vals.min() if len(vals) else None,
                "max_val": vals.max() if len(vals) else None,
            })
        out = pd.DataFrame(rows, columns=["col", "n_rows", "n_null",
                                          "n_distinct", "min_val",
                                          "max_val"])
        return typed_table(out, col=pa.string(), n_rows=pa.int64(),
                           n_null=pa.int64(), n_distinct=pa.int64(),
                           min_val=pa.string(), max_val=pa.string())

    return bucketed_group_apply(partials, "col", final, num_buckets)


def table_checksum(ds: ray.data.Dataset, group_col: str,
                   cols: list[str], num_buckets: int = 8) -> ray.data.Dataset:
    """Per-``group_col`` order-independent fingerprint of ``cols``.

    Each row's canonical form is its columns cast to string and joined
    with ``\\x1f`` (reproduced by the SQL oracle with ``CAST .. AS
    VARCHAR`` + ``chr(31)``); the group checksum is the wrapping uint64
    sum of ``md5_uint64`` over canonical rows, formatted ``%016x``.
    Output: ``(group_col, n_rows:int64, checksum:utf8)``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        strs = [pc.cast(batch[c], pa.string()) for c in cols]
        canon = strs[0] if len(strs) == 1 else \
            pc.binary_join_element_wise(*strs, _SEP)
        hv = md5_uint64(canon)
        df = pd.DataFrame({group_col: batch[group_col].to_pandas(),
                           "hv": hv})
        g = df.groupby(group_col, as_index=False).agg(
            chk=("hv", _wrap_sum), n=("hv", "size"))
        return typed_table(g, **{group_col: batch.schema.field(group_col).type},
                           chk=pa.uint64(), n=pa.int64())

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)

    def final(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(group_col, as_index=False).agg(
            chk=("chk", _wrap_sum), n_rows=("n", "sum"))
        g["checksum"] = [format(int(v), "016x") for v in g["chk"]]
        gt = g[[group_col, "n_rows", "checksum"]]
        return typed_table(gt, **{group_col: pa.string()},
                           n_rows=pa.int64(), checksum=pa.string())

    return bucketed_group_apply(partials, group_col, final, num_buckets)

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

"""Exact distributed order statistics by iterative range narrowing.

``lang_quantiles``/``char_quantiles`` pin quantiles over BOUNDED value
domains (one row per distinct value fits in a bucket).  This module is
the unbounded-domain path: the classic multi-pass selection algorithm —
histogram the candidate range, descend into the bin holding the k-th
value, repeat until the survivors are pullable — exact for any int64
column with NO assumption on distinct-value cardinality.

Scale shape: each round is ONE map-side combiner pass (per-batch
``np.histogram`` against broadcast bounds — a fixed 512-int64 partial per
batch) merged on the driver (512 x blocks rows, block-bounded), plus a
final bounded pull of one bin's values.  Rounds = log_512(range) — 3
passes cover the full int64 range; value skew only ever SHRINKS a bin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

N_BINS = 512
PULL_LIMIT = 1 << 16  # final-bin pull bound (values, not rows seen)


def _range_counts(ds: ray.data.Dataset, col: str, lo: int, hi: int,
                  edges: np.ndarray) -> np.ndarray:
    """One combiner pass: counts of ``col`` values in [lo, hi] per bin
    (edges are the shared bin boundaries, len N_BINS+1)."""

    n_bins = len(edges) - 1

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        v = v[(v >= lo) & (v <= hi)]
        counts, _ = np.histogram(v, bins=edges)
        return pa.table({"bin": pa.array(np.arange(n_bins), pa.int64()),
                         "n": pa.array(counts.astype("int64"), pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("bin").sum("n").to_pandas())
    out = np.zeros(n_bins, dtype="int64")
    out[agg["bin"].to_numpy()] = agg["sum(n)"].to_numpy()
    return out


def kth_value(ds: ray.data.Dataset, col: str, k: int,
              lo: int, hi: int) -> int:
    """The k-th smallest (1-indexed) value of int64 ``col`` within the
    known bounds [lo, hi] — exact, via histogram descent."""
    assert k >= 1
    while True:
        if lo == hi:
            return int(lo)
        span = hi - lo + 1
        if span <= PULL_LIMIT:
            # bounded pull: only values inside the final window move
            vals = (ds.map_batches(
                lambda b: pa.table({col: pc.filter(
                    b[col], pc.and_(pc.greater_equal(b[col], lo),
                                    pc.less_equal(b[col], hi)))}),
                batch_format="pyarrow", batch_size=None)
                .to_pandas()[col].to_numpy())
            vals.sort()
            return int(vals[k - 1])
        # integer bin edges: cover [lo, hi+1) with N_BINS ~equal bins
        edges = np.unique(np.linspace(lo, hi + 1, N_BINS + 1)
                          .astype("int64"))
        counts = _range_counts(ds, col, lo, hi, edges)[:len(edges) - 1]
        cum = np.cumsum(counts)
        i = int(np.searchsorted(cum, k, side="left"))
        k -= int(cum[i - 1]) if i else 0
        lo, hi = int(edges[i]), int(edges[i + 1]) - 1


def exact_quantiles(ds: ray.data.Dataset, col: str,
                    qs_milli: list[int]) -> pa.Table:
    """Exact discrete quantiles (k = ceil(q * n), 1-indexed — SQL
    ``ORDER BY LIMIT 1 OFFSET k-1``) for integer column ``col``.
    Output: ``(q_milli, k, value)``.  ``ds`` should be materialized by
    the caller if it is not a plain read — every narrowing round
    re-scans it."""
    n = ds.count()
    stats = ds.map_batches(
        lambda b: pa.table({
            "lo": pa.array([pc.min(b[col]).as_py()], pa.int64()),
            "hi": pa.array([pc.max(b[col]).as_py()], pa.int64())}),
        batch_format="pyarrow", batch_size=None).to_pandas()
    lo, hi = int(stats["lo"].min()), int(stats["hi"].max())

    rows = []
    for qm in qs_milli:
        k = -(-qm * n // 1000)  # ceil(q*n) in exact ints
        rows.append({"q_milli": qm, "k": int(k),
                     "value": kth_value(ds, col, int(k), lo, hi)})
    out = pd.DataFrame(rows)
    return pa.table({
        "q_milli": pa.array(out["q_milli"], pa.int64()),
        "k": pa.array(out["k"], pa.int64()),
        "value": pa.array(out["value"], pa.int64())})

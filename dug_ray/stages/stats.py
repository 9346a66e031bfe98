"""Distributed statistical aggregates built from mergeable partials.

Three operators that share one scale discipline — the input-sized pass is
a per-batch combiner that collapses each batch to O(groups) (or
O(groups x distinct-values)) rows, and the exchange that follows carries
only those partials:

- ``grouped_ols`` — per-group simple linear regression from EXACT integer
  moment sums (n, Sx, Sy, Sxy, Sxx).  The classic distributed-ML
  primitive: moments merge by addition, so the result is independent of
  partitioning and bit-identical to a single-machine pass.  The final
  slope/intercept division happens once per group in arbitrary-precision
  Python ints cast to float64 — the same value DuckDB produces from
  HUGEINT sums CAST to DOUBLE, with no streaming-float drift.
- ``histogram_quantiles`` — EXACT discrete quantiles over an integer
  column via a value-count histogram: per-batch ``value_counts`` combiner
  -> bucketed count merge -> cumulative pick.  Unlike a per-group sort
  (queries.q_char_quantiles), the exchange is O(groups x distinct values)
  not O(rows) — the shape that survives a 100 TB column whose domain is
  bounded (doc lengths, token counts, status codes).
- ``sweep_concurrency`` — max simultaneous open intervals per group by
  the sweep-line: explode each interval to (+1 at start, -1 at end)
  boundary rows (map-only, 2x rows), co-locate each group in one hash
  bucket, sort by (t, delta) so closed-open interval ends retire BEFORE
  same-instant starts, then a vectorized running sum's max.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from dug_ray.shuffle import bucketed_group_apply, typed_table


def grouped_ols(ds: ray.data.Dataset, group_col: str,
                x_col: str, y_col: str,
                num_buckets: int = 8) -> ray.data.Dataset:
    """Per-group OLS of integer ``y_col`` on integer ``x_col``.

    Output: ``(group_col, n:int64, slope:float64, intercept:float64)``
    with slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) and intercept =
    (Sy - slope*Sx) / n.  Per-batch moment sums stay in int64 (exact for
    |x|,|y| and batch sizes where the products fit 2^63 — callers feed
    cent-scaled measures); the cross-batch merge and the final numerator/
    denominator are Python ints (unbounded), so nothing wraps at any
    scale.  Degenerate groups (all-equal x: denominator 0) are dropped,
    matching SQL ``HAVING den != 0``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({group_col: batch[group_col].to_pandas()})
        x = batch[x_col].to_numpy().astype("int64")
        y = batch[y_col].to_numpy().astype("int64")
        df["sx"], df["sy"] = x, y
        df["sxy"], df["sxx"] = x * y, x * x
        g = df.groupby(group_col, as_index=False).agg(
            n=("sx", "size"), sx=("sx", "sum"), sy=("sy", "sum"),
            sxy=("sxy", "sum"), sxx=("sxx", "sum"))
        return typed_table(g, **{group_col: batch.schema.field(group_col).type},
                           n=pa.int64(), sx=pa.int64(), sy=pa.int64(),
                           sxy=pa.int64(), sxx=pa.int64())

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)

    def final(df: pd.DataFrame) -> pa.Table:
        rows = []
        for key, g in df.groupby(group_col, sort=False):
            # Python ints: exact regardless of how many partials merged
            n = int(g["n"].sum())
            sx, sy = int(g["sx"].sum()), int(g["sy"].sum())
            sxy, sxx = int(g["sxy"].sum()), int(g["sxx"].sum())
            den = n * sxx - sx * sx
            if den == 0:
                continue
            num = n * sxy - sx * sy
            # float(num)/float(den): both operands round-to-nearest from
            # the exact integers — identical to DuckDB's
            # CAST(HUGEINT AS DOUBLE) division, see SQL_GROUPED_OLS
            slope = float(num) / float(den)
            rows.append({group_col: key, "n": n, "slope": slope,
                         "intercept": (float(sy) - slope * float(sx))
                         / float(n)})
        out = pd.DataFrame(rows, columns=[group_col, "n", "slope",
                                          "intercept"])
        return typed_table(out, **{group_col: pa.string()},
                           n=pa.int64(), slope=pa.float64(),
                           intercept=pa.float64())

    return bucketed_group_apply(partials, group_col, final, num_buckets)


def histogram_quantiles(ds: ray.data.Dataset, group_col: str,
                        value_col: str, quantiles: dict[str, float],
                        num_buckets: int = 8) -> ray.data.Dataset:
    """Exact ``quantile_disc`` per group via a mergeable value histogram.

    ``quantiles`` maps output column name -> q in (0, 1]; the picked
    value is sorted[ceil(q*n)] (1-based), DuckDB ``quantile_disc``
    semantics.  Output: ``(group_col, n:int64, <name>:int64 ...)``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({group_col: batch[group_col].to_pandas(),
                           "v": batch[value_col].to_numpy()})
        g = df.groupby([group_col, "v"], as_index=False).size()
        return typed_table(g.rename(columns={"size": "cnt"}),
                           **{group_col: batch.schema.field(group_col).type},
                           v=pa.int64(), cnt=pa.int64())

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)

    def final(df: pd.DataFrame) -> pa.Table:
        rows = []
        for key, g in df.groupby(group_col, sort=False):
            h = g.groupby("v", sort=True)["cnt"].sum()
            counts = h.to_numpy()
            vals = h.index.to_numpy()
            cum = np.cumsum(counts)
            n = int(cum[-1])
            row = {group_col: key, "n": n}
            for name, q in quantiles.items():
                rank = max(int(np.ceil(q * n)), 1)  # 1-based
                row[name] = int(vals[np.searchsorted(cum, rank)])
            rows.append(row)
        out = pd.DataFrame(rows, columns=[group_col, "n",
                                          *quantiles.keys()])
        return typed_table(out, **{group_col: pa.string()},
                           n=pa.int64(),
                           **{name: pa.int64() for name in quantiles})

    return bucketed_group_apply(partials, group_col, final, num_buckets)


def pareto_front(ds: ray.data.Dataset, group_col: str,
                 min_col: str, max_col: str,
                 num_buckets: int = 8) -> ray.data.Dataset:
    """Per-group skyline over DISTINCT integer points: the rows not
    dominated by any other (dominate = ``min_col`` <= AND ``max_col`` >=
    with one strict).  Output: ``(group_col, min_col, max_col)``.

    Skylines are mergeable — skyline(A ∪ B) ⊆ skyline(A) ∪ skyline(B) —
    so each batch emits only its LOCAL skyline and the exchange carries
    O(skyline x blocks) rows, not the corpus; the per-group final pass
    re-runs the same scan on the surviving candidates.  The scan itself
    is a sort + vectorized strictly-increasing filter: sort (min asc,
    max desc), keep the best ``max_col`` per ``min_col`` value, then keep
    points whose ``max_col`` strictly exceeds the running max of all
    cheaper points.
    """

    def _skyline(df: pd.DataFrame) -> pd.DataFrame:
        d = (df.sort_values([group_col, min_col, max_col],
                            ascending=[True, True, False], kind="mergesort")
             .drop_duplicates(subset=[group_col, min_col]))
        prior = (d.groupby(group_col)[max_col]
                 .transform(lambda s: s.cummax().shift(1)))
        return d[prior.isna() | (d[max_col] > prior)]

    def partial(df: pd.DataFrame) -> pa.Table:
        out = _skyline(df[[group_col, min_col, max_col]]
                       .drop_duplicates())
        return typed_table(out, **{group_col: pa.string(),
                                   min_col: pa.int64(),
                                   max_col: pa.int64()})

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=None)

    def final(df: pd.DataFrame) -> pa.Table:
        out = _skyline(df.drop_duplicates())
        return typed_table(out, **{group_col: pa.string(),
                                   min_col: pa.int64(),
                                   max_col: pa.int64()})

    return bucketed_group_apply(partials, group_col, final, num_buckets)


def sweep_concurrency(ds: ray.data.Dataset, group_col: str,
                      start_col: str, end_col: str,
                      num_buckets: int = 8) -> ray.data.Dataset:
    """Max number of simultaneously-open ``[start, end)`` intervals per
    group, plus the earliest instant that maximum is reached.

    Output: ``(group_col, max_open:int64, at_t:int64)``.  Ties at one
    instant resolve ends-before-starts (delta ASC), the closed-open
    contract — an interval ending at t does not overlap one starting at
    t.  Per-group boundary streams must fit one bucket's partition (2
    int64s per interval; ~16 GB per 10^9 intervals — shard the group key
    by time range first if a single group exceeds that).
    """

    def explode(batch: pa.Table) -> pa.Table:
        key = batch[group_col].to_pandas()
        s = batch[start_col].to_numpy().astype("int64")
        e = batch[end_col].to_numpy().astype("int64")
        out = pd.DataFrame({
            group_col: pd.concat([key, key], ignore_index=True),
            "t": np.concatenate([s, e]),
            "delta": np.concatenate([np.ones(len(s), dtype=np.int64),
                                     -np.ones(len(e), dtype=np.int64)]),
        })
        return typed_table(out, **{group_col: batch.schema.field(group_col).type},
                           t=pa.int64(), delta=pa.int64())

    boundaries = ds.map_batches(explode, batch_format="pyarrow",
                                batch_size=None)

    def final(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([group_col, "t", "delta"], kind="mergesort")
        df["open"] = df.groupby(group_col)["delta"].cumsum()
        peak = df.loc[df.groupby(group_col)["open"].idxmax(),
                      [group_col, "open", "t"]]
        out = peak.rename(columns={"open": "max_open", "t": "at_t"})
        return typed_table(out, **{group_col: pa.string()},
                           max_open=pa.int64(), at_t=pa.int64())

    return bucketed_group_apply(boundaries, group_col, final, num_buckets)

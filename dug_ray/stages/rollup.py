"""GROUP BY ROLLUP / CUBE / GROUPING SETS — exact multi-level
aggregation in one input pass.

The reference aggregates per-facet counts at a single level (reference:
src/dug/core/async_search.py facet queries); a curation dashboard over a
100 TB corpus wants the whole prefix hierarchy (per (a, b), per a, grand
total) without re-scanning the input per level.  ``rollup_aggregate``
computes all levels from ONE per-batch combiner pass:

- stage 1: per-batch partial sums/counts at the FINEST key level — the
  only stage that touches input-sized data;
- stage 2: exact bucketed merge of the finest level (the one all-to-all,
  carrying one row per distinct key combination per batch);
- stage 3+: each coarser level re-aggregates the finest RESULT (bounded
  by group cardinality, not data size) under its own prefix-key bucket
  hash; the grand total folds per-batch partials of that small set.

Rolled-up key columns are NULL (SQL ROLLUP semantics).  All measures are
int64 sums/counts, so every stage is associative and order-independent —
bit-exact against the DuckDB ``GROUP BY ROLLUP`` oracle.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
import pyarrow as pa
import ray.data

from dug_ray.shuffle import bucketed_group_apply, typed_table


def rollup_aggregate(ds: ray.data.Dataset,
                     keys: list[str],
                     prepare: Callable[[pa.Table], pd.DataFrame],
                     measures: dict[str, tuple[str, str]],
                     num_buckets: int = 8) -> ray.data.Dataset:
    """ROLLUP(*keys) over ``ds`` — the prefix grouping sets
    ``(k1..kn), (k1..kn-1), ..., (k1), ()``."""
    sets = [keys[:d] for d in range(len(keys), -1, -1)]
    return grouping_sets_aggregate(ds, keys, sets, prepare, measures,
                                   num_buckets)


def cube_aggregate(ds: ray.data.Dataset,
                   keys: list[str],
                   prepare: Callable[[pa.Table], pd.DataFrame],
                   measures: dict[str, tuple[str, str]],
                   num_buckets: int = 8) -> ray.data.Dataset:
    """CUBE(*keys) over ``ds`` — every subset of ``keys`` (2^n grouping
    sets), still from ONE input pass: only the finest level touches the
    input; the other 2^n - 1 sets re-aggregate its (group-cardinality-
    bounded) result."""
    n = len(keys)
    sets = [[k for i, k in enumerate(keys) if mask & (1 << i)]
            for mask in range(2 ** n - 1, -1, -1)]
    return grouping_sets_aggregate(ds, keys, sets, prepare, measures,
                                   num_buckets)


def grouping_sets_aggregate(ds: ray.data.Dataset,
                            keys: list[str],
                            sets: list[list[str]],
                            prepare: Callable[[pa.Table], pd.DataFrame],
                            measures: dict[str, tuple[str, str]],
                            num_buckets: int = 8) -> ray.data.Dataset:
    """GROUP BY GROUPING SETS over ``ds``.

    ``keys`` is the full key-column list (output schema order); every
    entry of ``sets`` must be a subset of it.  The finest level (the
    full ``keys`` combination) is computed from one pass over the input
    (per-batch combiner + one bucketed merge); every other set
    re-aggregates that bounded result under its own bucket hash —
    including the grand total ``[]``.  Key columns absent from a set are
    NULL (SQL semantics).  If the full-``keys`` set is not requested it
    is still computed internally but not emitted.

    ``prepare`` maps an input Arrow batch to a pandas frame holding the
    key columns plus the raw measure-source columns.  ``measures`` maps
    output column -> (source column, "sum" | "count"); counts become
    sums of partial counts after stage 1.
    """
    sum_cols = list(measures)
    key_t = {k: pa.string() for k in keys}
    msr_t = {m: pa.int64() for m in sum_cols}

    def partial(batch: pa.Table) -> pa.Table:
        df = prepare(batch)
        agg = {out: (src, how if how == "sum" else "size")
               for out, (src, how) in measures.items()}
        g = df.groupby(keys, as_index=False, dropna=False).agg(**agg)
        return typed_table(g, **key_t, **msr_t)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)

    def _merge_at(level_keys: list[str]):
        def _m(df: pd.DataFrame) -> pa.Table:
            g = df.groupby(level_keys, as_index=False, dropna=False).agg(
                **{m: (m, "sum") for m in sum_cols})
            for k in keys:
                if k not in level_keys:
                    g[k] = pd.Series([None] * len(g), dtype=object)
            return typed_table(g[keys + sum_cols], **key_t, **msr_t)
        return _m

    finest = bucketed_group_apply(partials, keys, _merge_at(keys),
                                  num_buckets).materialize()

    def _total_final(df: pd.DataFrame) -> pa.Table:
        t = df[sum_cols].sum().to_frame().T.astype("int64")
        for k in keys:
            t[k] = pd.Series([None], dtype=object)
        return typed_table(t[keys + sum_cols], **key_t, **msr_t)

    levels = []
    for s in sets:
        if list(s) == keys:
            levels.append(finest)
        elif not s:
            one = finest.map_batches(
                lambda t: t.append_column(
                    "_one", pa.nulls(len(t), pa.int64()).fill_null(1)),
                batch_format="pyarrow", batch_size=None)
            levels.append(bucketed_group_apply(one, "_one", _total_final, 1))
        else:
            levels.append(bucketed_group_apply(
                finest, list(s), _merge_at(list(s)), num_buckets))
    return levels[0] if len(levels) == 1 else ray.data.Dataset.union(*levels)


def pivot_counts(ds: ray.data.Dataset,
                 group_col: str,
                 pivot_col: str,
                 domain: list[str],
                 num_buckets: int = 8) -> ray.data.Dataset:
    """PIVOT: per ``group_col`` row, one int64 count column per declared
    ``domain`` value of ``pivot_col`` (``n_<value>``), plus ``n_other``
    (values outside the domain) and ``n_total``.

    The pivot contract REQUIRES a declared column domain — a schema
    cannot depend on the data at 10^12 rows (a late block discovering a
    new value cannot retroactively widen every earlier block), so
    undeclared values fold into ``n_other`` instead of new columns; the
    SQL oracle is the matching conditional-sum projection.

    Shape: per-batch crosstab partial (one row per (group, declared
    column) per batch — already wide, so the single exchange carries
    group-cardinality rows), then an exact bucketed column-wise sum.
    """
    cols = [f"n_{v}" for v in domain]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[[group_col, pivot_col]]
        out = pd.DataFrame({group_col: df[group_col].unique()})
        out = out.set_index(group_col)
        for v, c in zip(domain, cols):
            out[c] = df[df[pivot_col] == v].groupby(group_col).size()
        out["n_other"] = df[~df[pivot_col].isin(set(domain))] \
            .groupby(group_col).size()
        out["n_total"] = df.groupby(group_col).size()
        out = out.fillna(0).astype("int64").reset_index()
        return typed_table(out, **{group_col: pa.string()},
                           **{c: pa.int64() for c in
                              cols + ["n_other", "n_total"]})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)

    def merge(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(group_col, as_index=False)[
            cols + ["n_other", "n_total"]].sum()
        return typed_table(g, **{group_col: pa.string()},
                           **{c: pa.int64() for c in
                              cols + ["n_other", "n_total"]})

    return bucketed_group_apply(partials, group_col, merge, num_buckets)


def unpivot(ds: ray.data.Dataset,
            id_cols: list[str],
            value_cols: list[str],
            var_name: str = "measure",
            value_name: str = "value") -> ray.data.Dataset:
    """UNPIVOT / melt — wide measure columns to long (id, measure, value)
    rows, the inverse of ``pivot_counts``.

    Map-only: each batch melts independently (pandas ``melt`` is a C-speed
    tile + repeat), so the operator is ZERO-shuffle and streams — output
    size is rows x len(value_cols) but no block ever holds more than one
    melted batch, which is what makes it safe at corpus scale where the
    long form would never fit materialized.  All ``value_cols`` must share
    one dtype (melt would otherwise upcast to object); callers convert
    money to integer cents first.
    """
    def melt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.melt(id_vars=id_cols, value_vars=value_cols,
                      var_name=var_name, value_name=value_name)
        out[var_name] = out[var_name].astype(str)
        return out

    return ds.map_batches(melt, batch_format="pandas", batch_size=None)

"""Event-sequence analytics: transition counts, cohort retention, daily
actives, and calendar gap-filling.

These are the session-stream profiling operators a training-data pipeline
runs over its interaction logs (the reference's crawl/metrics counters are
per-batch Python dicts, `src/dug/core/crawler.py`; here every one is an
exact distributed reduction). Shared scale shape:

* **Per-user work stays in one hash bucket.** Ordering events by
  ``(ts, event_id)`` within a user needs every row of that user in one
  task — ``bucketed_group_apply(user_id)``, never a global sort.
* **Only bounded partials cross the second exchange.** Transition pairs
  (|types|^2), per-day counts (days), cohort cells (days^2) — all tiny
  regardless of corpus size, so the final merge is a fixed-size reduce.
* **Days are integer epoch-days** (``epoch_us // 86_400_000_000``), exact
  in both engines. Timestamps are assumed >= epoch (floor == truncate);
  the oracles use DuckDB's ``//`` which truncates toward zero.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from dug_ray.shuffle import bucketed_group_apply, typed_table

US_PER_DAY = 86_400_000_000


def _with_day(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    # normalize to microseconds regardless of the frame's datetime unit
    # (parquet timestamp[us] arrives as datetime64[us]; synthetic frames
    # are often datetime64[ns])
    df["day"] = df["ts"].astype("datetime64[us]").astype("int64") // US_PER_DAY
    return df


def event_transitions(ds: ray.data.Dataset,
                      num_buckets: int = 16) -> ray.data.Dataset:
    """Markov transition counts over per-user event streams: for every
    consecutive pair ordered by ``(ts, event_id)`` within a user, count
    ``(prev_type, next_type)`` occurrences corpus-wide.

    Output: ``(prev_type, next_type, n)``. The per-user bucket emits
    partial pair counts, so the final exchange carries at most
    |types|^2 x num_buckets rows."""

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = df.groupby("user_id")["event_type"].shift(1)
        pairs = pd.DataFrame({"prev_type": prev,
                              "next_type": df["event_type"]}).dropna()
        g = (pairs.groupby(["prev_type", "next_type"], as_index=False)
             .size().rename(columns={"size": "n"}))
        return typed_table(g, prev_type=pa.string(), next_type=pa.string(),
                           n=pa.int64())

    partials = bucketed_group_apply(ds, "user_id", per_bucket, num_buckets)

    def merge(df: pd.DataFrame) -> pa.Table:
        g = (df.groupby(["prev_type", "next_type"], as_index=False)
             .agg(n=("n", "sum")))
        return typed_table(g, prev_type=pa.string(), next_type=pa.string(),
                           n=pa.int64())

    return bucketed_group_apply(partials, "prev_type", merge, 4)


def _distinct_user_days(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-batch (user_id, day) dedup — the combiner that keeps the
    user-keyed exchange proportional to active user-days, not raw events."""

    def per_batch(df: pd.DataFrame) -> pa.Table:
        d = _with_day(df)[["user_id", "day"]].drop_duplicates()
        return typed_table(d, user_id=pa.int64(), day=pa.int64())

    return ds.map_batches(per_batch, batch_format="pandas", batch_size=None)


def retention_cohorts(ds: ray.data.Dataset,
                      num_buckets: int = 16) -> ray.data.Dataset:
    """Cohort retention triangle: users grouped by first-active day
    (cohort), counted once per later active day at its day offset.

    Output: ``(cohort_day, offset_days, n_users)``. A user's cohort and
    offsets derive entirely from its own rows, so one user-keyed exchange
    computes the distinct user-days AND the per-cell partial counts; the
    final merge is over the bounded (cohort, offset) grid."""
    pairs = _distinct_user_days(ds)

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.drop_duplicates()
        cohort = df.groupby("user_id")["day"].transform("min")
        cells = pd.DataFrame({"cohort_day": cohort,
                              "offset_days": df["day"] - cohort})
        g = (cells.groupby(["cohort_day", "offset_days"], as_index=False)
             .size().rename(columns={"size": "n_users"}))
        return typed_table(g, cohort_day=pa.int64(), offset_days=pa.int64(),
                           n_users=pa.int64())

    partials = bucketed_group_apply(pairs, "user_id", per_bucket, num_buckets)

    def merge(df: pd.DataFrame) -> pa.Table:
        g = (df.groupby(["cohort_day", "offset_days"], as_index=False)
             .agg(n_users=("n_users", "sum")))
        return typed_table(g, cohort_day=pa.int64(), offset_days=pa.int64(),
                           n_users=pa.int64())

    return bucketed_group_apply(partials, "cohort_day", merge, 4)


def daily_actives(ds: ray.data.Dataset,
                  num_buckets: int = 16) -> ray.data.Dataset:
    """Per-day distinct actives, new users, and running cumulative
    distinct users.

    Output: ``(day, n_active, n_new, cum_users)``. n_active counts
    distinct (user, day); n_new counts users whose FIRST day is that day;
    cum_users is the prefix sum of n_new — exactly "distinct users seen
    so far" because each user is new exactly once. The cumsum runs in ONE
    final task over the per-day partials (bounded by calendar days, not
    data size)."""
    pairs = _distinct_user_days(ds)

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.drop_duplicates()
        active = (df.groupby("day", as_index=False)
                  .size().rename(columns={"size": "n_active"}))
        first = df.groupby("user_id", as_index=False)["day"].min()
        new = (first.groupby("day", as_index=False)
               .size().rename(columns={"size": "n_new"}))
        g = active.merge(new, on="day", how="left").fillna({"n_new": 0})
        return typed_table(g, day=pa.int64(), n_active=pa.int64(),
                           n_new=pa.int64())

    partials = bucketed_group_apply(pairs, "user_id", per_bucket, num_buckets)

    def final(df: pd.DataFrame) -> pa.Table:
        g = (df.groupby("day", as_index=False)
             .agg(n_active=("n_active", "sum"), n_new=("n_new", "sum"))
             .sort_values("day", kind="mergesort"))
        g["cum_users"] = g["n_new"].cumsum()
        return typed_table(g, day=pa.int64(), n_active=pa.int64(),
                           n_new=pa.int64(), cum_users=pa.int64())

    # single final bucket: the prefix sum needs the whole (bounded) day
    # axis in order; input here is num_buckets x days rows, not the corpus
    return bucketed_group_apply(partials, "day", final, 1)


def date_spine_counts(ds: ray.data.Dataset,
                      num_buckets: int = 16) -> ray.data.Dataset:
    """Calendar gap-fill: event counts per (day, event_type) over the FULL
    day range [min_day, max_day] x all observed types, zero-filled where
    nothing happened — the scaffold joins every downstream time series
    expects.

    Output: ``(day, event_type, n_events)``. One input pass produces
    per-batch partial counts; the final single task sees only the merged
    (days x types) grid plus the global extrema, both bounded by calendar
    x type cardinality."""

    def per_batch(df: pd.DataFrame) -> pa.Table:
        d = _with_day(df)
        g = (d.groupby(["day", "event_type"], as_index=False)
             .size().rename(columns={"size": "n_events"}))
        return typed_table(g, day=pa.int64(), event_type=pa.string(),
                           n_events=pa.int64())

    partials = ds.map_batches(per_batch, batch_format="pandas",
                              batch_size=None)

    def final(df: pd.DataFrame) -> pa.Table:
        g = (df.groupby(["day", "event_type"], as_index=False)
             .agg(n_events=("n_events", "sum")))
        days = np.arange(g["day"].min(), g["day"].max() + 1, dtype="int64")
        types = np.sort(g["event_type"].unique())
        spine = pd.MultiIndex.from_product(
            [days, types], names=["day", "event_type"]).to_frame(index=False)
        out = spine.merge(g, on=["day", "event_type"], how="left")
        out["n_events"] = out["n_events"].fillna(0)
        return typed_table(out, day=pa.int64(), event_type=pa.string(),
                           n_events=pa.int64())

    return bucketed_group_apply(partials, "day", final, 1)

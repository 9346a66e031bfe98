"""Windowed aggregates over the events stream table.

Ray Data has no event-time windowing; per the streaming-shaped pattern the
input is treated as a partitioned log — partition by key, order by ts
inside each partition (the ordering assumption; SURVEY.md §2.9). Three
window shapes:

- tumbling (queries.q_events_window): GROUP BY floor(ts / size)
- sliding (here): window size 1h, hop 30min — each event contributes to
  exactly size/hop = 2 windows, implemented as a vectorized explode
  (no self-join);
- session (here): per-user sessions split at >30min gaps — a per-key
  sorted cumulative-sum of gap indicators inside the user's hash bucket
  (exact: a user's events all land in one bucket).

Float sums use integer millis for bit-exact oracle comparison.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from dug_ray.shuffle import bucketed_group_apply

HOUR = 3600
HOP = 1800
SESSION_GAP = 1800


def _epoch_seconds(ts: pd.Series) -> pd.Series:
    return ((ts - pd.Timestamp(0)) // pd.Timedelta(seconds=1)).astype("int64")


def _epoch_us(ts: pd.Series) -> pd.Series:
    return ((ts - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)).astype("int64")


def banded_join(left: ray.data.Dataset, right: ray.data.Dataset,
                band_us: int, num_buckets: int = 16) -> ray.data.Dataset:
    """Range (banded) join: every LEFT event paired with every RIGHT event
    of the same user whose timestamp falls in ``[left.ts, left.ts +
    band_us)``.  Output (l_event, r_event, user_id, l_us, r_us, lag_us);
    both inputs must carry event_id, user_id, ts.

    The interval predicate co-partitions EXACTLY despite being an
    inequality: rows are keyed by ``(user_id, time-chunk)`` with chunk
    width = band width.  A right row lives in one chunk; a left row's band
    spans at most two, so it is emitted to both — each matching pair then
    shares exactly one (user, chunk) key, so the in-bucket merge sees it
    exactly once (no post-hoc dedup).  That bounds per-task fan-in by key
    x band time-locality instead of whole-key history — the reason this
    beats the naive equality-join-then-filter, whose hot-user groups grow
    with the full corpus timespan.  At 100 TB: same shape, wider
    num_buckets; skew only if one user emits a flood INSIDE one band
    width, which salting by finer sub-chunks + neighbor duplication
    absorbs the same way.
    """
    if band_us <= 0:
        raise ValueError(f"band_us must be positive, got {band_us}")

    def prep(is_right: bool):
        def _p(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            us = _epoch_us(df["ts"])
            base = pd.DataFrame({
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "us": us,
                # floor-div chunks (numpy // floors, matching SQL floor());
                # band_us > 0 enforced by the caller contract
                "chunk": (us // band_us).astype("int64"),
                "is_r": is_right,
            })
            if not is_right:
                above = base.assign(chunk=base["chunk"] + 1)
                base = pd.concat([base, above], ignore_index=True)
            return pa.Table.from_pandas(base, preserve_index=False)
        return _p

    u = (left.map_batches(prep(False), batch_format="pyarrow", batch_size=None)
         .union(right.map_batches(prep(True), batch_format="pyarrow",
                                  batch_size=None)))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        li = df[~df["is_r"]][["event_id", "user_id", "us", "chunk"]]
        ri = df[df["is_r"]][["event_id", "user_id", "us", "chunk"]]
        m = li.merge(ri, on=["user_id", "chunk"], suffixes=("_l", "_r"),
                     sort=False)
        m = m[(m["us_r"] >= m["us_l"]) & (m["us_r"] < m["us_l"] + band_us)]
        out = pd.DataFrame({
            "l_event": m["event_id_l"], "r_event": m["event_id_r"],
            "user_id": m["user_id"], "l_us": m["us_l"], "r_us": m["us_r"],
            "lag_us": m["us_r"] - m["us_l"]})
        return out

    joined = bucketed_group_apply(u, ["user_id", "chunk"], per_bucket,
                                  num_buckets)
    cols = ("l_event", "r_event", "user_id", "l_us", "r_us", "lag_us")

    def _typed(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if not all(c in df.columns for c in cols):
            # fully-empty pandas blocks lose their column schema (documented
            # Ray quirk, see shuffle.hash_join) — rebuild the typed empty
            df = pd.DataFrame({c: [] for c in cols})
        return pa.table({c: pa.array(df[c], type=pa.int64(),
                                     from_pandas=True) for c in cols})

    return joined.map_batches(_typed, batch_format="pyarrow",
                              batch_size=None)


def sliding_window(events: ray.data.Dataset) -> ray.data.Dataset:
    """1h windows hopping every 30min: (user_id, window_start, n_events,
    sum_value_milli). Each event explodes to its size/hop windows."""

    def per_batch(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        sec = _epoch_seconds(df["ts"])
        milli = (df["value"] * 1000).round().astype("int64")
        frames = []
        for k in range(HOUR // HOP):
            ws = (sec - k * HOP) // HOUR * HOUR + k * HOP
            frames.append(pd.DataFrame({
                "user_id": df["user_id"], "window_start": ws, "milli": milli}))
        x = pd.concat(frames)
        g = x.groupby(["user_id", "window_start"], as_index=False).agg(
            n_events=("milli", "size"), sum_value_milli=("milli", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    partial = events.map_batches(per_batch, batch_format="pyarrow", batch_size=None)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["user_id", "window_start"], as_index=False).agg(
            n_events=("n_events", "sum"), sum_value_milli=("sum_value_milli", "sum"))

    return bucketed_group_apply(partial, ["user_id", "window_start"], merge, 16)


def asof_join(ticks: ray.data.Dataset, quotes: ray.data.Dataset) -> ray.data.Dataset:
    """AS-OF join: each tick gets the latest quote of the same user strictly
    before it in the lexicographic ``(sec, event_id)`` order — total (input
    contract: event_ids unique), so 'before' is unambiguous even at equal
    timestamps and at any event_id magnitude (no composite numeric key that
    could collide).

    Ray Data has no asof primitive; the composition is union-tag -> per-user
    hash bucket -> one sort inside the bucket -> grouped forward-fill of the
    quote columns — the merge-sorted-streams algorithm, vectorized. Exact
    under the same partitioning assumption as sessions (a user's full
    history in one bucket; at 100 TB: time-range partitions with one
    boundary quote carried forward per partition). Ticks with no prior
    quote report -1. Both inputs must carry event_id, user_id, ts, value."""

    def prep(is_quote: bool):
        def _p(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            out = pd.DataFrame({
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "sec": _epoch_seconds(df["ts"]),
                "milli": (df["value"] * 1000).round().astype("int64"),
            })
            out["is_q"] = is_quote
            return pa.Table.from_pandas(out, preserve_index=False)
        return _p

    u = (ticks.map_batches(prep(False), batch_format="pyarrow", batch_size=None)
         .union(quotes.map_batches(prep(True), batch_format="pyarrow", batch_size=None)))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "sec", "event_id"], kind="mergesort")
        # nullable Int64, not float64: a float round-trip would corrupt
        # values above 2^53 (ids/millis stay exact integers end to end)
        qm = df["milli"].astype("Int64").where(df["is_q"])
        qe = df["event_id"].astype("Int64").where(df["is_q"])
        df["quote_milli"] = qm.groupby(df["user_id"]).ffill()
        df["quote_event"] = qe.groupby(df["user_id"]).ffill()
        t = df[~df["is_q"]].fillna({"quote_milli": -1, "quote_event": -1})
        t = t.astype({"quote_milli": "int64", "quote_event": "int64"})
        return t[["event_id", "user_id", "sec", "quote_milli", "quote_event"]]

    return bucketed_group_apply(u, "user_id", per_bucket, 16)


def session_window(events: ray.data.Dataset) -> ray.data.Dataset:
    """Gap-based sessions (>30min gap splits): per (user_id, session):
    session_start, n_events, duration_sec. Exact via per-user bucketing."""

    def to_rows(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[["user_id", "ts"]]
        df["sec"] = _epoch_seconds(df["ts"])
        return pa.Table.from_pandas(df[["user_id", "sec"]], preserve_index=False)

    rows = events.map_batches(to_rows, batch_format="pyarrow", batch_size=None)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "sec"], kind="mergesort")
        gap = (df["sec"].diff() > SESSION_GAP) | (df["user_id"] != df["user_id"].shift())
        df["session"] = np.cumsum(gap.to_numpy()) - 1
        g = df.groupby(["user_id", "session"], as_index=False).agg(
            session_start=("sec", "min"), session_end=("sec", "max"),
            n_events=("sec", "size"))
        g["duration_sec"] = g["session_end"] - g["session_start"]
        # session index relative within user (0-based, by start time)
        g["session"] = g.groupby("user_id").cumcount()
        return g[["user_id", "session", "session_start", "n_events", "duration_sec"]]

    return bucketed_group_apply(rows, "user_id", per_bucket, 16)

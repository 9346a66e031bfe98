"""Round-5 session-6: event-sequence analytics (transitions, retention
cohorts, daily actives, date-spine gap fill)."""

from __future__ import annotations

import pandas as pd
import ray.data

US_PER_DAY = 86_400_000_000


def _events(rows):
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_day",
                                     "event_type"])
    df["ts"] = pd.to_datetime(df["ts_day"] * US_PER_DAY, unit="us")
    return ray.data.from_pandas(
        df[["event_id", "user_id", "ts", "event_type"]]).repartition(3)


def test_event_transitions_order_and_user_boundary():
    from dug_ray.stages.sequence import event_transitions
    ds = _events([
        (1, 1, 0, "view"), (2, 1, 1, "click"), (3, 1, 2, "buy"),
        (4, 2, 0, "view"), (5, 2, 1, "view"),
        (6, 3, 5, "buy"),  # single event: no pair
    ])
    out = event_transitions(ds, num_buckets=2).to_pandas()
    got = {(r.prev_type, r.next_type): r.n for r in out.itertuples()}
    # no cross-user pair (buy->view between user 1 and 2 must NOT appear)
    assert got == {("view", "click"): 1, ("click", "buy"): 1,
                   ("view", "view"): 1}


def test_event_transitions_tiebreak_event_id():
    from dug_ray.stages.sequence import event_transitions
    # same timestamp: order by event_id decides the pair direction
    ds = _events([(2, 1, 0, "b"), (1, 1, 0, "a")])
    out = event_transitions(ds, num_buckets=2).to_pandas()
    assert {(r.prev_type, r.next_type) for r in out.itertuples()} == \
        {("a", "b")}


def test_retention_cohorts_offsets():
    from dug_ray.stages.sequence import retention_cohorts
    # user 1: days 10, 12, 12 (dup day counted once); user 2: day 10 only
    ds = _events([
        (1, 1, 10, "x"), (2, 1, 12, "x"), (3, 1, 12, "y"),
        (4, 2, 10, "x"),
    ])
    out = retention_cohorts(ds, num_buckets=2).to_pandas()
    got = {(r.cohort_day, r.offset_days): r.n_users for r in out.itertuples()}
    assert got == {(10, 0): 2, (10, 2): 1}


def test_daily_actives_cumulative_is_distinct_users_so_far():
    from dug_ray.stages.sequence import daily_actives
    ds = _events([
        (1, 1, 0, "x"), (2, 2, 0, "x"),          # day 0: users 1,2
        (3, 1, 1, "x"),                          # day 1: user 1 again
        (4, 3, 3, "x"), (5, 1, 3, "x"),          # day 3: new user 3 + 1
    ])
    out = (daily_actives(ds, num_buckets=2).to_pandas()
           .sort_values("day").reset_index(drop=True))
    assert out["day"].tolist() == [0, 1, 3]
    assert out["n_active"].tolist() == [2, 1, 2]
    assert out["n_new"].tolist() == [2, 0, 1]
    assert out["cum_users"].tolist() == [2, 2, 3]


def test_date_spine_zero_fills_missing_cells():
    from dug_ray.stages.sequence import date_spine_counts
    ds = _events([
        (1, 1, 5, "a"), (2, 1, 5, "a"), (3, 2, 7, "b"),
    ])
    out = date_spine_counts(ds).to_pandas()
    # full grid: days 5,6,7 x types a,b = 6 rows, zero-filled
    assert len(out) == 6
    got = {(r.day, r.event_type): r.n_events for r in out.itertuples()}
    assert got[(5, "a")] == 2 and got[(7, "b")] == 1
    assert got[(6, "a")] == 0 and got[(6, "b")] == 0 and got[(5, "b")] == 0

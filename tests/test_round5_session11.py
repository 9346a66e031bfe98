"""Round-5 session-11: weighted SSSP, time-weighted value, state dwell,
trailing-window actives."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def _linked(rows):
    """Minimal linked-mention table: (element_id, canonical_curie)."""
    df = pd.DataFrame(rows, columns=["element_id", "canonical_curie"])
    return ray.data.from_pandas(df).repartition(2)


def test_sssp_weighted_local_path_relaxation():
    from dug_ray.stages.graph import sssp_weighted
    # co-annotation: e1 {M:1, X:a}, e2 {M:1, X:a}, e3 {X:a, X:b}
    # edges: (M:1, X:a) n=2 -> w=1+500=501; (X:a, X:b) n=1 -> w=1001
    linked = _linked([("e1", "MONDO:1"), ("e1", "X:a"),
                      ("e2", "MONDO:1"), ("e2", "X:a"),
                      ("e3", "X:a"), ("e3", "X:b")])
    out = (sssp_weighted(linked, seed_prefix="MONDO:", rounds=3)
           .to_pandas().set_index("node"))
    assert out.loc["MONDO:1", "dist"] == 0
    assert out.loc["X:a", "dist"] == 501
    assert out.loc["X:b", "dist"] == 501 + 1001


def test_sssp_weighted_distributed_matches_local():
    from dug_ray.stages.graph import sssp_weighted
    linked = _linked([("e1", "MONDO:1"), ("e1", "X:a"),
                      ("e2", "X:a"), ("e2", "X:b"),
                      ("e3", "MONDO:2"), ("e3", "X:b"),
                      ("e4", "X:b"), ("e4", "X:c")])
    key = ["node", "dist"]
    local = (sssp_weighted(linked, rounds=3).to_pandas()
             .sort_values(key).reset_index(drop=True))
    dist = (sssp_weighted(linked, rounds=3, max_driver_edges=0)
            .to_pandas().sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(local, dist)


def _events(d, rows):
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type", "value"])
    df["props"] = ""
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "events.parquet"))


def test_time_weighted_value_and_state_dwell():
    import dug_ray.queries as q
    t0 = pd.Timestamp("2024-01-01")
    h = pd.Timedelta(hours=1)
    rows = [
        (1, 1, t0, "view", 1.50),        # 150 cents for 1h
        (2, 1, t0 + h, "view", 3.00),    # 300 cents for 2h
        (3, 1, t0 + 3 * h, "buy", 9.99),  # last: no interval
        (4, 2, t0, "view", 5.0),         # single event: dropped
    ]
    with tempfile.TemporaryDirectory() as d:
        _events(d, rows)
        twv = q.QUERIES["time_weighted_value"](d).to_pandas()
        dwell = q.QUERIES["state_dwell"](d).to_pandas()
    us_h = 3_600_000_000
    assert len(twv) == 1
    r = twv.iloc[0]
    assert r["user_id"] == 1
    assert r["span_us"] == 3 * us_h
    assert r["twv_num"] == 150 * us_h + 300 * 2 * us_h
    assert r["n_segments"] == 2
    dw = dwell.set_index("state")
    assert dw.loc["view", "dwell_us"] == 3 * us_h  # 1h + 2h
    assert dw.loc["view", "n_intervals"] == 2
    assert "buy" not in dw.index  # open interval


def test_weekly_actives_trailing_window():
    import dug_ray.queries as q
    t = lambda day: pd.Timestamp(f"2024-01-{day:02d}")
    rows = [
        (1, 1, t(1), "v", 0.0),
        (2, 2, t(1), "v", 0.0),
        (3, 1, t(10), "v", 0.0),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events(d, rows)
        out = (q.QUERIES["weekly_actives"](d).to_pandas()
               .set_index("day"))
    # days 1-7 see both users; day 8 sees none; days 10-16 see user 1
    assert out.loc[1, "n_active"] == 2
    assert out.loc[7, "n_active"] == 2
    assert 8 not in out.index
    assert out.loc[10, "n_active"] == 1
    assert out.loc[16, "n_active"] == 1
    assert 17 not in out.index

"""Round-5 session-31: watermark late-arrival audit."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_late_arrivals_prefix_max_semantics():
    import dug_ray.queries as q
    t0 = pd.Timestamp("2024-01-01")
    m = pd.Timedelta(minutes=1)
    # arrival order = event_id; event 2 arrives AFTER event 1 but its
    # event time is 30 min earlier -> late (> 10 min behind watermark);
    # event 3 is only 5 min behind -> on time
    rows = [
        (0, t0),
        (1, t0 + 60 * m),
        (2, t0 + 30 * m),   # 30 min behind seen-max (t0+60m): late
        (3, t0 + 56 * m),   # 4 min behind: on time
        (4, t0 + 61 * m),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts"])
    df["user_id"] = 1
    df["event_type"] = "v"
    df["value"] = 0.0
    df["props"] = ""
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "events.parquet"))
        out = q.QUERIES["late_arrivals"](d).to_pandas()
    assert out["n_events"].sum() == 5
    assert out["n_late"].sum() == 1
    late_win = out[out["n_late"] > 0]
    # the late event's 5-min window starts at t0+30m
    exp_win = int((t0 + 30 * m).value // 1000)  # ns -> us
    exp_win = exp_win // 300_000_000 * 300_000_000
    assert list(late_win["window_us"]) == [exp_win]

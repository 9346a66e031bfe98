"""Round-5 session-14: exact selection, debounce, coordinated sample."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def test_kth_value_matches_numpy_sort():
    from dug_ray.stages.selection import kth_value
    rng = np.random.RandomState(7)
    # huge domain forces at least one histogram-descent round
    vals = rng.randint(-10**15, 10**15, size=5000).astype("int64")
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(4)
    s = np.sort(vals)
    for k in (1, 2500, 5000):
        assert kth_value(ds, "v", k, int(vals.min()),
                         int(vals.max())) == int(s[k - 1])


def test_kth_value_duplicates_and_tiny_range():
    from dug_ray.stages.selection import kth_value
    vals = np.array([5, 5, 5, 7, 7, 9], dtype="int64")
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(2)
    assert kth_value(ds, "v", 3, 5, 9) == 5
    assert kth_value(ds, "v", 4, 5, 9) == 7
    assert kth_value(ds, "v", 6, 5, 9) == 9


def test_exact_quantiles_k_definition():
    from dug_ray.stages.selection import exact_quantiles
    vals = np.arange(1, 101, dtype="int64")  # 1..100
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(3)
    out = exact_quantiles(ds, "v", [500, 990]).to_pandas() \
        .set_index("q_milli")
    # k = ceil(q*n): ceil(0.5*100)=50 -> value 50; ceil(0.99*100)=99
    assert out.loc[500, "k"] == 50 and out.loc[500, "value"] == 50
    assert out.loc[990, "k"] == 99 and out.loc[990, "value"] == 99


def test_debounce_keeps_first_and_spaced_events():
    import os
    import tempfile

    import pyarrow.parquet as pq

    import dug_ray.queries as q
    t0 = pd.Timestamp("2024-01-01")
    m = pd.Timedelta(minutes=1)
    h = pd.Timedelta(hours=1)
    rows = [
        (1, 1, t0, "view"),               # kept (first)
        (2, 1, t0 + m, "view"),           # dropped (within 1h)
        (3, 1, t0 + h + 2 * m, "view"),   # kept (> 1h after #1? no — after
                                          # previous KEPT-or-not? lag sees
                                          # event 2: gap 61min > 1h: kept)
        (4, 1, t0 + m, "click"),          # kept (different type)
        (5, 2, t0 + m, "view"),           # kept (different user)
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type"])
    df["value"] = 0.0
    df["props"] = ""
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "events.parquet"))
        out = q.QUERIES["debounce_events"](d).to_pandas()
    assert sorted(out["event_id"]) == [1, 3, 4, 5]

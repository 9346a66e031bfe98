"""Round-5 session-19: hourly profile, degree assortativity."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_hourly_profile_peak_tiebreak():
    import dug_ray.queries as q
    rows = []
    eid = 0
    # 'view': 2 at hour 3, 2 at hour 1 -> tie, peak = smallest hour 1
    for h in (3, 3, 1, 1):
        eid += 1
        rows.append((eid, pd.Timestamp(f"2024-01-05 {h:02d}:30:00"),
                     1, "view"))
    # 'buy': single event at hour 22
    rows.append((99, pd.Timestamp("2024-01-06 22:00:01"), 2, "buy"))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type"])
    df["value"] = 0.0
    df["props"] = ""
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "events.parquet"))
        out = q.QUERIES["hourly_profile"](d).to_pandas()
    v = out[out["event_type"] == "view"].set_index("hour")
    assert v.loc[1, "n"] == 2 and v.loc[3, "n"] == 2
    assert (v["peak_hour"] == 1).all()
    b = out[out["event_type"] == "buy"]
    assert list(b["peak_hour"]) == [22]


def test_degree_assortativity_moments_by_hand():
    # star graph a-b, a-c: degrees a=2, b=1, c=1
    # directed edges (both orientations): (2,1)x2, (1,2)x2
    # m=4, sum_x = 2+2+1+1 = 6 = sum_y, sum_xy = 2+2+2+2 = 8,
    # sum_x2 = 4+4+1+1 = 10 = sum_y2
    from dug_ray.stages.graph import concept_cooccurrence
    import numpy as np
    import ray.data

    linked = ray.data.from_pandas(pd.DataFrame({
        "element_id": ["e1", "e1", "e2", "e2"],
        "canonical_curie": ["A:a", "X:b", "A:a", "X:c"]}))
    cooc = concept_cooccurrence(linked).to_pandas()
    deg = pd.concat([cooc["subj"], cooc["obj"]]).value_counts()
    x = cooc["subj"].map(deg).to_numpy(dtype="int64")
    y = cooc["obj"].map(deg).to_numpy(dtype="int64")
    xs = np.concatenate([x, y])
    ys = np.concatenate([y, x])
    assert len(xs) == 4
    assert xs.sum() == 6 and ys.sum() == 6
    assert (xs * ys).sum() == 8
    assert (xs * xs).sum() == 10

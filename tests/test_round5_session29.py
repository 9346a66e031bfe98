"""Round-5 session-29: langid margin, arrival moments."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_langid_margin_consistent_with_langid():
    import dug_ray.queries as q
    df = pd.DataFrame({
        "doc_id": [1], "text": ["the and of fast sort join"],
        "lang": ["en"], "source": ["s"], "n_chars": [25]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        m = q.QUERIES["langid_margin"](d).to_pandas().iloc[0]
        p = q.QUERIES["langid"](d).to_pandas().iloc[0]
    assert m["pred_lang"] == p["pred_lang"]
    assert m["margin"] >= 0
    assert m["second_lang"] != m["pred_lang"]


def test_arrival_moments_by_hand():
    import dug_ray.queries as q
    t0 = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    rows = [
        (1, 1, t0, "view"), (2, 1, t0 + 10 * s, "view"),
        (3, 1, t0 + 40 * s, "view"),
        # different user, same type: its own stream (single -> no gap)
        (4, 2, t0, "view"),
        (5, 1, t0, "buy"),  # single-event stream: no gap
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type"])
    df["value"] = 0.0
    df["props"] = ""
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "events.parquet"))
        out = (q.QUERIES["arrival_moments"](d).to_pandas()
               .set_index("event_type"))
    # gaps for (user1, view): 10s and 30s
    assert out.loc["view", "n_gaps"] == 2
    assert out.loc["view", "sum_gap_s"] == 40
    assert out.loc["view", "sumsq_gap_s"] == 100 + 900
    assert "buy" not in out.index

"""Round-5 session-16: read-time pushdown, k-fold assignment."""

from __future__ import annotations

import hashlib
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_pruned_read_day_window():
    import dug_ray.queries as q
    rows = [
        (1, pd.Timestamp("2024-01-09 23:59:59"), 1, "view"),
        (2, pd.Timestamp("2024-01-10 00:00:00"), 1, "view"),
        (3, pd.Timestamp("2024-01-10 12:00:00"), 2, "click"),
        (4, pd.Timestamp("2024-01-11 00:00:00"), 2, "view"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type"])
    df["value"] = 0.0
    df["props"] = ""
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "events.parquet"))
        out = (q.QUERIES["pruned_read"](d).to_pandas()
               .set_index("event_type"))
    # half-open [Jan 10, Jan 11): events 2 and 3 only
    assert out.loc["view", "n"] == 1
    assert out.loc["click", "n"] == 1
    assert out["n"].sum() == 2


def test_kfold_assign_matches_hashlib():
    import dug_ray.queries as q
    df = pd.DataFrame({
        "doc_id": range(1, 21), "text": [""] * 20,
        "lang": (["en"] * 10 + ["fr"] * 10), "source": ["s"] * 20,
        "n_chars": [0] * 20})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        out = q.QUERIES["kfold_assign"](d).to_pandas()

    def fold(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 5

    exp = (pd.DataFrame({
        "fold": [fold(i) for i in df["doc_id"]],
        "lang": df["lang"]})
        .groupby(["fold", "lang"]).size().rename("n").reset_index())
    key = ["fold", "lang"]
    pd.testing.assert_frame_equal(
        out.sort_values(key).reset_index(drop=True),
        exp.sort_values(key).reset_index(drop=True),
        check_dtype=False)
    assert out["n"].sum() == 20

"""Round-5 session-37: weighted (multiset) Jaccard between sources and
the Kaplan-Meier survival ledger — hand-computed value pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import dug_ray.queries as q


def _write_docs(d, rows):
    df = pd.DataFrame(rows, columns=["source", "text"])
    df["doc_id"] = range(len(df))
    df["lang"] = "en"
    df["n_chars"] = df["text"].str.len()
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "documents.parquet"))


def _write_events(d, rows):
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df["event_id"] = range(len(df))
    df["event_type"] = "view"
    df["value"] = 1.0
    df["props"] = ""
    df["ts"] = pd.to_datetime(df["ts"])
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "events.parquet"))


def test_weighted_jaccard_multiset_minmax():
    # src0 counts {a:2, b:1}; src1 counts {a:1, b:2, c:1}
    # sum_min = min(2,1)+min(1,2)+min(0,1) = 2
    # sum_max = max(2,1)+max(1,2)+max(0,1) = 5 -> wj_ppm = 400000
    rows = [("src0", "a a b"),
            ("src1", "a b b c"),
            ("other", "a a a a")]        # filtered out (not a JS source)
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["weighted_jaccard"](d).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["source_a"], r["source_b"]) == ("src0", "src1")
    assert int(r["sum_min"]) == 2
    assert int(r["sum_max"]) == 5
    assert int(r["wj_ppm"]) == 400_000


def test_km_survival_product_limit_ledger():
    # u1: days 0..10 -> t=10, l=10 >= 8 -> censored
    # u2: days 0..5  -> t=5, death
    # u3: days 9..10 -> t=1, l=10 -> censored
    # u4: days 0..4  -> t=4, death
    rows = [(1, "2024-01-01"), (1, "2024-01-11"),
            (2, "2024-01-01"), (2, "2024-01-06"),
            (3, "2024-01-10"), (3, "2024-01-11"),
            (4, "2024-01-01"), (4, "2024-01-05")]
    with tempfile.TemporaryDirectory() as d:
        _write_events(d, rows)
        out = q.QUERIES["km_survival"](d)
    df = out.to_pandas().sort_values("t").reset_index(drop=True)
    assert df["t"].tolist() == [1, 4, 5, 10]
    assert df["n_at_risk"].tolist() == [4, 3, 2, 1]
    assert df["deaths"].tolist() == [0, 1, 1, 0]
    assert df["censored"].tolist() == [1, 0, 0, 1]
    t4 = math.floor(math.log(2 / 3) * 1_000_000)
    t5 = math.floor(math.log(1 / 2) * 1_000_000)
    assert df["log_km_micro"].tolist() == [0, t4, t4 + t5, t4 + t5]

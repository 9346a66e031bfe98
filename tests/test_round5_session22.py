"""Round-5 session-22: distinctive terms, session paths."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_distinctive_terms_lift():
    import dug_ray.queries as q
    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["uniq uniq common", "common common common"],
        "lang": ["en", "fr"], "source": ["s", "s"],
        "n_chars": [16, 20]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        out = q.QUERIES["distinctive_terms"](d).to_pandas()
    en = out[out["lang"] == "en"].set_index("term")
    # N=6, n_en=3; 'uniq': c=2, C=2 -> lift = 2*6*1e6 // (3*2) = 2e6
    assert en.loc["uniq", "lift_ppm"] == 2_000_000
    assert en.loc["uniq", "rank"] == 1
    # 'common' in en: c=1, C=4 -> 1*6*1e6 // (3*4) = 500000
    assert en.loc["common", "lift_ppm"] == 500_000


def test_session_paths_gap_cut_and_order():
    import dug_ray.queries as q
    t0 = pd.Timestamp("2024-01-01")
    m = pd.Timedelta(minutes=1)
    rows = [
        # user 1 session A: view>click ; 40-min gap ; session B: buy
        (1, 1, t0, "view"), (2, 1, t0 + m, "click"),
        (3, 1, t0 + 41 * m, "buy"),
        # user 2: same view>click shape
        (4, 2, t0, "view"), (5, 2, t0 + 2 * m, "click"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type"])
    df["value"] = 0.0
    df["props"] = ""
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "events.parquet"))
        out = q.QUERIES["session_paths"](d).to_pandas()
    got = dict(zip(out["path"], out["n"]))
    assert got == {"view>click": 2, "buy": 1}
    # frequency-desc rank: view>click first
    assert out.iloc[0]["path"] == "view>click"

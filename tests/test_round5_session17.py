"""Round-5 session-17: KWIC concordance, join-cardinality profile."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_kwic_windows_clamp_at_doc_boundaries():
    import dug_ray.queries as q
    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["stream a b c stream", "x y z stream"],
        "lang": ["en"] * 2, "source": ["s"] * 2, "n_chars": [19, 12]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        out = q.QUERIES["kwic_concordance"](d).to_pandas()
    got = {(r.doc_id, r.pos): (r.left_ctx, r.right_ctx)
           for r in out.itertuples()}
    assert got[(1, 1)] == ("", "a b c")          # clamped left
    assert got[(1, 5)] == ("a b c", "")          # clamped right
    assert got[(2, 4)] == ("x y z", "")
    assert len(got) == 3
    # no cross-doc bleed: doc 2's left context never includes doc 1 tokens
    assert "stream" not in got[(2, 4)][0]


def test_join_cardinality_exact_product():
    import dug_ray.queries as q
    li = pd.DataFrame({"l_orderkey": [1, 1, 1, 2, 9]})
    od = pd.DataFrame({"o_orderkey": [1, 2, 2, 3]})
    ev = pd.DataFrame({"user_id": [5], "event_id": [1],
                       "ts": [pd.Timestamp("2024-01-01")],
                       "event_type": ["v"], "value": [0.0],
                       "props": [""]})
    dc = pd.DataFrame({"doc_id": [5, 5], "text": ["", ""],
                       "lang": ["en", "en"], "source": ["s", "s"],
                       "n_chars": [0, 0]})
    with tempfile.TemporaryDirectory() as d:
        for n, f in (("lineitem", li), ("orders", od), ("events", ev),
                     ("documents", dc)):
            pq.write_table(pa.Table.from_pandas(f),
                           os.path.join(d, f"{n}.parquet"))
        out = (q.QUERIES["join_cardinality"](d).to_pandas()
               .set_index("relation"))
    # key 1: 3x1, key 2: 1x2, key 9: unmatched -> 5 rows
    assert out.loc["lineitem*orders", "est_rows"] == 5
    assert out.loc["events*documents", "est_rows"] == 2

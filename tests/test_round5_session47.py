"""Round-5 session-47: learned-index audit, cross-source dups, decayed
popularity — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import dug_ray.queries as q


def _write_docs(d, rows):
    df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    df["lang"] = "en"
    df["n_chars"] = df["text"].str.len()
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "documents.parquet"))


def test_learned_index_interpolation_error():
    # decile 9 holds {90, 91, 99}: residual nums |1*9-1*2|=7 ->
    # eps = ceil(7/9) = 1; singleton deciles pin eps 0
    df = pd.DataFrame({"o_orderkey": [0, 10, 20, 90, 91, 99]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["learned_index_audit"](d).to_pandas()
    got = {r.decile: (r.n_keys, r.key_lo, r.key_hi, r.eps)
           for r in out.itertuples()}
    assert got == {0: (1, 0, 0, 0), 1: (1, 10, 10, 0),
                   2: (1, 20, 20, 0), 9: (3, 90, 99, 1)}


def test_cross_source_dup_spans():
    rows = [(0, "A", "x"), (1, "B", "x"), (2, "A", "y"), (3, "A", "y"),
            (4, "B", "z")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["cross_source_dups"](d).to_pandas()
    got = {(r.span, r.n_docs): r.n_groups for r in out.itertuples()}
    assert got == {(2, 2): 1, (1, 2): 1, (1, 1): 1}


def test_decayed_popularity_integer_ladder():
    # w: age0=1e6, age1=875000, age2=765625; max day = 2
    ev = pd.DataFrame({
        "event_type": ["a", "a", "a", "b"],
        "ts": pd.to_datetime([0, 0, 2, 2], unit="D")})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(ev),
                       os.path.join(d, "events.parquet"))
        out = q.QUERIES["decayed_popularity"](d).to_pandas()
    got = {r.event_type: (r.n_events, r.decayed_micro)
           for r in out.itertuples()}
    assert got == {"a": (3, 2 * 765625 + 1_000_000),
                   "b": (1, 1_000_000)}

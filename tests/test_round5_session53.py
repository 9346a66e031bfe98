"""Round-5 session-53: PRF expansion, inverse consistency, lift chart
— hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import duckdb
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


def test_prf_expansion_feedback_terms():
    # 'fast' feedback docs {0,1}; expansion counts x:2, y:1
    rows = [(0, "s", "fast x y"), (1, "s", "fast x"), (2, "s", "z")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["prf_expansion"](d).to_pandas()
    got = {(r.query_term, r.exp_term): (r.n, r.rank)
           for r in out.itertuples()}
    assert got == {("fast", "x"): (2, 1), ("fast", "y"): (1, 2)}


def test_inverse_consistency_matches_oracle():
    rows = [(0, "s", "merge the join spark")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        eng = q.QUERIES["inverse_consistency"](d).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
        ora = con.sql(q.ORACLES["inverse_consistency"]).df()
    assert eng.iloc[0].to_dict() == {
        c: int(ora[c].iloc[0]) for c in ("matched", "fwd_orphan",
                                         "inv_orphan")}
    assert int(eng["matched"].iloc[0]) >= 1


def test_lift_chart_single_repeat_decile():
    # customers 1..10, first-order cents 100k; only cust 10 repeats
    orders = pd.DataFrame({
        "o_custkey": list(range(1, 11)) + [10],
        "o_orderkey": [k * 10 for k in range(1, 11)] + [999],
        "o_orderdate": pd.to_datetime(list(range(1, 11)) + [100],
                                      unit="D"),
        "o_totalprice": [float(k) for k in range(1, 11)] + [5.0]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(orders),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["lift_chart"](d).to_pandas()
    got = {r.bucket: (r.n_customers, r.n_repeat, r.repeat_ppm,
                      r.lift_ppm) for r in out.itertuples()}
    expect = {b: (1, 0, 0, 0) for b in range(1, 10)}
    expect[10] = (1, 1, 1_000_000, 10_000_000)
    assert got == expect

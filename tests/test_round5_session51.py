"""Round-5 session-51: ANOVA lead time, predicate cardinality, OOV
rate — hand-computed pins."""

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


def test_anova_leadtime_two_nations():
    # nation0 x={2,4}; nation1 x={10}: sb=118000, ssb=32667,
    # ssw=2000, f=16333
    supp = pd.DataFrame({"s_suppkey": [1, 2], "s_nationkey": [0, 1]})
    orders = pd.DataFrame({
        "o_orderkey": [1, 2],
        "o_orderdate": pd.to_datetime([0, 0], unit="D")})
    lines = pd.DataFrame({
        "l_orderkey": [1, 1, 2], "l_suppkey": [1, 1, 2],
        "l_shipdate": pd.to_datetime([2, 4, 10], unit="D")})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(supp),
                       os.path.join(d, "supplier.parquet"))
        pq.write_table(pa.Table.from_pandas(orders),
                       os.path.join(d, "orders.parquet"))
        pq.write_table(pa.Table.from_pandas(lines),
                       os.path.join(d, "lineitem.parquet"))
        out = q.QUERIES["anova_leadtime"](d).to_pandas()
    assert out.iloc[0].to_dict() == {
        "k_groups": 2, "n": 3, "ssb_milli": 32667, "ssw_milli": 2000,
        "f_milli": 16333}


def test_pred_cardinality_matches_oracle():
    # engine vs DuckDB oracle equality on a small two-concept fixture
    rows = [(0, "s", "merge hash"), (1, "s", "scan")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        eng = q.QUERIES["pred_cardinality"](d).to_pandas() \
            .sort_values("pred").reset_index(drop=True)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
        ora = con.sql(q.ORACLES["pred_cardinality"]).df() \
            .sort_values("pred").reset_index(drop=True)
    assert len(eng) >= 2 and "dug:annotates" in set(eng["pred"])
    pd.testing.assert_frame_equal(eng[ora.columns], ora,
                                  check_dtype=False)
    # the shared element of doc0 gives annotates max_in = 2 -> 1:N
    ann = eng[eng["pred"] == "dug:annotates"].iloc[0]
    assert (ann.max_out, ann.max_in, ann.card_class) == (1, 2, "1:N")


def test_oov_rate_counts():
    rows = [(0, "s", "merge qqq www")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["oov_rate"](d).to_pandas()
    assert out.iloc[0].to_dict() == {
        "source": "s", "n_tokens": 3, "n_oov": 2, "oov_ppm": 666666}

"""Round-5 session-52: metapath instances, source card, top-1% share —
hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import dug_ray.queries as q


def _write_docs(d, rows, langs=None):
    df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    df["lang"] = langs if langs is not None else "en"
    df["n_chars"] = df["text"].str.len()
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "documents.parquet"))


def test_metapath_phenotype_bridge():
    # present concepts: merge->MONDO:0005148, the->MONDO:0004976,
    # join->HP:0000002, spark->HP:0000001; the has_phenotype /
    # phenotype_of chains close reflexively on the two diseases
    rows = [(0, "s", "merge the join spark")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        eng = q.QUERIES["metapath_instances"](d).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
        ora = con.sql(q.ORACLES["metapath_instances"]).df()
    key = lambda df: sorted(map(tuple, df[["a", "mid", "b"]]
                                .to_numpy()))
    assert key(eng) == key(ora)
    assert ("MONDO:0005148", "HP:0000002", "MONDO:0005148") in key(eng)


def test_source_card_summary():
    rows = [(0, "A", "x y"), (1, "A", "x y"), (2, "A", "z")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows, langs=["en", "en", "fr"])
        out = q.QUERIES["source_card"](d).to_pandas()
    assert out.iloc[0].to_dict() == {
        "source": "A", "n_docs": 3, "n_tokens": 5, "n_langs": 2,
        "dups": 1, "dup_ppm": 333333, "mean_chars_milli": 2333}


def test_top1pct_share_threshold_and_share():
    # 200 orders of 1..200 dollars: k=2, threshold = 19900 cents,
    # top revenue = 39900 cents of 2010000 -> 19850 ppm
    df = pd.DataFrame({"o_totalprice": [float(i) for i in
                                        range(1, 201)]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["top1pct_share"](d).to_pandas()
    assert out.iloc[0].to_dict() == {
        "n_orders": 200, "k": 2, "threshold_cents": 19900,
        "rev_total": 2_010_000, "rev_top": 39_900, "share_ppm": 19850}

"""Round-5 session-44: Dirichlet QL retrieval, t-closeness, order
status audit — hand-computed pins."""

from __future__ import annotations

import math
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


def test_qlm_dirichlet_scores():
    # 'fast': doc0 tf=2 dl=3, doc1 tf=1 dl=2; cf=3, n_tokens=5
    rows = [(0, "s", "fast fast x"), (1, "s", "fast y")]
    p = 2000.0 * (3.0 / 5.0)
    s0 = math.log((2.0 + p) / (3.0 + 2000.0))
    s1 = math.log((1.0 + p) / (2.0 + 2000.0))
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["qlm_topk"](d).to_pandas()
    got = {(r.term, r.doc_id): (r.tf, r.dl, r.score, r.rank)
           for r in out.itertuples()}
    # s0 > s1 (higher tf, comparable dl)
    assert got == {("fast", 0): (2, 3, s0, 1),
                   ("fast", 1): (1, 2, s1, 2)}


def test_t_closeness_two_group_split():
    # nation 0 all priority A, nation 1 all priority B; global 50/50
    # normalized EMD each = 0.5 -> 500000 ppm
    cust = pd.DataFrame({"c_custkey": [1, 2],
                         "c_nationkey": [0, 1]})
    orders = pd.DataFrame({
        "o_custkey": [1, 1, 2, 2],
        "o_orderpriority": ["1-A", "1-A", "2-B", "2-B"]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(cust),
                       os.path.join(d, "customer.parquet"))
        pq.write_table(pa.Table.from_pandas(orders),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["t_closeness"](d).to_pandas()
    got = {r.nationkey: (r.n_rows, r.t_ppm) for r in out.itertuples()}
    assert got == {0: (2, 500000), 1: (2, 500000)}


def test_order_status_classes():
    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4, 5],
        "o_orderstatus": ["F", "F", "O", "P", "P"]})
    lines = pd.DataFrame({
        "l_orderkey": [1, 1, 2, 2, 3, 4, 4],
        "l_linestatus": ["F", "F", "F", "O", "O", "F", "O"]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(orders),
                       os.path.join(d, "orders.parquet"))
        pq.write_table(pa.Table.from_pandas(lines),
                       os.path.join(d, "lineitem.parquet"))
        out = q.QUERIES["order_status_audit"](d).to_pandas()
    got = {(s, c): n for s, c, n in
           zip(out["status"], out["class"], out["n_orders"])}
    assert got == {("F", "consistent"): 1, ("F", "violating"): 1,
                   ("O", "consistent"): 1, ("P", "consistent"): 1,
                   ("P", "no_lines"): 1}

"""Round-5 session-45: triplet violations, Theil index, MI contingency
— hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import dug_ray.queries as q


def test_triplet_violation_census():
    # l0: v0=[1,0], v1=[0,1] (pos_min 0 for both)
    # l1: v2=[1,0.001] -> neg_max(v0) ~1 >= 0, neg_max(v1) ~0.001 >= 0
    # v2 has no positive -> not an anchor
    emb = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.001]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1], pa.int32())})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(emb, os.path.join(d, "embeddings.parquet"))
        out = q.QUERIES["triplet_violations"](d).to_pandas()
    got = {r.label: (r.n_anchors, r.n_violations)
           for r in out.itertuples()}
    assert got == {0: (2, 2)}


def test_theil_index_two_customers():
    cust = pd.DataFrame({"c_custkey": [1, 2], "c_nationkey": [0, 0]})
    orders = pd.DataFrame({"o_custkey": [1, 2],
                           "o_totalprice": [1.00, 3.00]})
    t1 = math.floor(1_000_000 * (100.0 * math.log(100.0 * 2.0 / 400.0))
                    / 400.0)
    t2 = math.floor(1_000_000 * (300.0 * math.log(300.0 * 2.0 / 400.0))
                    / 400.0)
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(cust),
                       os.path.join(d, "customer.parquet"))
        pq.write_table(pa.Table.from_pandas(orders),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["theil_index"](d).to_pandas()
    assert out.iloc[0].to_dict() == {
        "nationkey": 0, "n_customers": 2, "total_cents": 400,
        "theil_micro": t1 + t2}


def test_mi_contingency_perfect_association():
    cust = pd.DataFrame({"c_custkey": [1, 2],
                         "c_mktsegment": ["A", "B"]})
    orders = pd.DataFrame({
        "o_custkey": [1, 1, 2, 2],
        "o_orderpriority": ["X", "X", "Y", "Y"]})
    term = math.floor(1_000_000 * (2.0 / 4.0)
                      * math.log(2.0 * 4.0 / (2.0 * 2.0)))
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(cust),
                       os.path.join(d, "customer.parquet"))
        pq.write_table(pa.Table.from_pandas(orders),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["mi_contingency"](d).to_pandas()
    got = {(r.segment, r.priority): (r.n, r.term_micro)
           for r in out.itertuples()}
    assert got == {("A", "X"): (2, term), ("B", "Y"): (2, term)}

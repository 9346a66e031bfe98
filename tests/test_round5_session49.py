"""Round-5 session-49: churn labels, erasure cascade, HLL eval —
hand-computed pins."""

from __future__ import annotations

import hashlib
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


def test_churn_labels_midpoint_split():
    # span 0..3 -> mid 2; u1 days {0,1} churned; u2 {0,2} retained;
    # u3 {3} has no first-half activity -> excluded
    ev = pd.DataFrame({
        "user_id": [1, 1, 2, 2, 3],
        "ts": pd.to_datetime([0, 1, 0, 2, 3], unit="D")})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(ev),
                       os.path.join(d, "events.parquet"))
        out = q.QUERIES["churn_labels"](d).to_pandas()
    got = {r.h1_days: (r.churned, r.retained) for r in out.itertuples()}
    assert got == {2: (1, 0), 1: (0, 1)}


def _deleted(k: int) -> bool:
    h = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
    return h % 1_000_000 < 20_000


def test_erasure_cascade_counts():
    keys = list(range(1, 300))
    n_del = sum(1 for k in keys if _deleted(k))
    assert n_del > 0  # rule fires within this key range
    cust = pd.DataFrame({"c_custkey": keys})
    orders = pd.DataFrame({"o_orderkey": [k * 10 for k in keys],
                           "o_custkey": keys})
    lines = pd.DataFrame({
        "l_orderkey": [k * 10 for k in keys for _ in range(2)]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(cust),
                       os.path.join(d, "customer.parquet"))
        pq.write_table(pa.Table.from_pandas(orders),
                       os.path.join(d, "orders.parquet"))
        pq.write_table(pa.Table.from_pandas(lines),
                       os.path.join(d, "lineitem.parquet"))
        out = q.QUERIES["erasure_cascade"](d).to_pandas()
    assert out.iloc[0].to_dict() == {
        "n_customers": n_del, "n_orders": n_del,
        "n_lineitems": 2 * n_del}


def test_hll_eval_linear_counting_range():
    # 3 distinct terms -> small-range linear counting estimate
    rows = [(0, "A", "alpha beta gamma")]
    idxs = {int(hashlib.md5(t.encode()).hexdigest()[:16], 16) >> 54
            for t in ("alpha", "beta", "gamma")}
    zeros = 1024 - len(idxs)
    approx = 1024.0 * math.log(1024.0 / float(zeros))
    err = math.floor(1_000_000 * abs(approx - 3.0) / 3.0)
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["hll_eval"](d).to_pandas()
    r = out.iloc[0]
    assert (r.source, r.exact_distinct) == ("A", 3)
    assert r.approx_distinct == approx
    assert r.err_ppm == err

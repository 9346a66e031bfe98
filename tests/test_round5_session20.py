"""Round-5 session-20: RFM segmentation."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_rfm_metrics_and_bucket_thresholds():
    import dug_ray.queries as q
    rows = []
    # 5 customers with 1..5 orders of 100.00 each, last orders on
    # successive days (customer i's last order on day i)
    for c in range(1, 6):
        for j in range(c):
            rows.append((c * 100 + j, c,
                         pd.Timestamp(f"2024-01-{c:02d}"), 100.0))
    df = pd.DataFrame(rows, columns=["o_orderkey", "o_custkey",
                                     "o_orderdate", "o_totalprice"])
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "orders.parquet"))
        out = (q.QUERIES["rfm_segments"](d).to_pandas()
               .set_index("c_custkey").sort_index())
    # metrics
    assert list(out["frequency"]) == [1, 2, 3, 4, 5]
    assert list(out["recency_days"]) == [4, 3, 2, 1, 0]
    assert list(out["monetary_cents"]) == [10000 * i for i in
                                           (1, 2, 3, 4, 5)]
    # distinct values 1..5: quintile boundaries are ceil(q*5)-th values
    # = (1,2,3,4); bucket = 1 + #(b < v) -> identity ranking
    assert list(out["f_bucket"]) == [1, 2, 3, 4, 5]
    assert list(out["m_bucket"]) == [1, 2, 3, 4, 5]
    # recency: customer 5 most recent (0 days) -> bucket 1
    assert out.loc[5, "r_bucket"] == 1 and out.loc[1, "r_bucket"] == 5

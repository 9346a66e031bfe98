"""Round-5 session-101: quantity-discount slope, KG degree Gini,
Simpson-reversal detector — pins and mirrors."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_quantity_discount_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s101qd_")
    pd.DataFrame({
        "l_quantity": [1.0, 2.0],
        "l_extendedprice": [2.00, 3.00],
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["quantity_discount"](d).to_pandas().iloc[0]
    # unit prices 200, 150 at qty 1, 2 -> slope -50 cents = -50000
    assert (int(out["n_lines"]), int(out["slope_milli"])) \
        == (2, -50_000)


def test_degree_gini_mirror():
    import dug_ray.queries as q
    from dug_ray.stages.graph import triple_degrees
    import dug_ray.pipelines.kg as kg
    sf = "/root/testdata/sf0.001"
    out = q.QUERIES["degree_gini"](sf).to_pandas().iloc[0]
    deg = triple_degrees(kg.kg_triples_cached(sf)).to_pandas()
    xs = sorted(int(v) for v in deg["n_triples"])
    n = len(xs)
    s = sum(xs)
    b1 = sum(v * i for i, v in enumerate(xs))
    gini = (1_000_000 * (2 * b1 - (n - 1) * s)) // (n * s)
    assert (int(out["n_subjects"]), int(out["sum_triples"])) == (n, s)
    assert int(out["gini_ppm"]) == gini
    assert 0 <= gini <= 1_000_000


def test_simpson_detector_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s101sd_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    rows = [
        (1, "1994-03-01", "3-MEDIUM"), (1, "1994-04-01", "3-MEDIUM"),
        (1, "1995-03-01", "1-URGENT"),
        (2, "1994-03-01", "1-URGENT"), (2, "1995-03-01", "3-MEDIUM"),
    ]
    pd.DataFrame({
        "o_custkey": [r[0] for r in rows],
        "o_orderdate": pd.Series([pd.Timestamp(r[1]) for r in rows]
                                 ).astype("datetime64[us]"),
        "o_orderpriority": [r[2] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["simpson_detector"](d).to_pandas().iloc[0]
    # pooled: 1994 share 1/3, 1995 share 1/2 -> positive slope
    # nation0 rises (0 -> 1), nation1 falls (1 -> 0): one reversal
    assert int(out["pooled_slope_milli"]) > 0
    assert (int(out["n_nations"]), int(out["n_reversed"])) == (2, 1)

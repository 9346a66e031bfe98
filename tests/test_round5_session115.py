"""Round-5 session-115: mediation, DEA efficiency, top-k stability —
hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_mediation_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s115md_")
    base = pd.Timestamp("1970-01-01")
    # daily: m = [1,2,2] orders, y = [2,4,4] dollars (y = 2m)
    rows = [(0, [2.00]), (1, [2.00, 2.00]), (2, [2.00, 2.00])]
    flat = [(day, p) for day, ps in rows for p in ps]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=r[0]) for r in flat]
        ).astype("datetime64[us]"),
        "o_totalprice": [r[1] for r in flat],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["mediation_lite"](d).to_pandas().iloc[0]
    # a = 500 (m ~ x), b = 2000 (y = 2m), c = 1000
    # indirect = 1000 = c -> full mediation
    assert (int(out["a_milli"]), int(out["b_milli"]),
            int(out["c_milli"])) == (500, 2000, 1000)
    assert int(out["indirect_milli"]) == 1000
    assert int(out["prop_mediated_ppm"]) == 1_000_000


def test_dea_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s115de_")
    pd.DataFrame({"c_custkey": [1, 2, 3],
                  "c_nationkey": [0, 0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    pd.DataFrame({
        "o_custkey": [1, 3],
        "o_totalprice": [10.00, 6.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["dea_efficiency"](d).to_pandas() \
        .set_index("nation")
    # n0: y=10, x=2 (ratio 5); n1: y=6, x=1 (ratio 6, frontier)
    assert int(out.loc[1, "eff_milli"]) == 1000
    assert int(out.loc[0, "eff_milli"]) == (1000 * 10 * 1) // (2 * 6)


def test_topk_stability_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s115tk_")
    pd.DataFrame({"c_custkey": [1, 2, 3],
                  "c_nationkey": [0, 1, 2]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    rows = [(1, "1994-01-05", 3.00), (2, "1994-01-10", 2.00),
            (3, "1994-01-15", 1.00),
            (1, "1994-02-05", 3.00), (2, "1994-02-10", 2.00)]
    pd.DataFrame({
        "o_custkey": [r[0] for r in rows],
        "o_orderdate": pd.Series([pd.Timestamp(r[1]) for r in rows]
                                 ).astype("datetime64[us]"),
        "o_totalprice": [r[2] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["topk_stability"](d).to_pandas().iloc[0]
    # sets {0,1,2} then {0,1}: Jaccard 2/3
    assert (int(out["n_pairs"]), int(out["mean_jaccard_milli"]),
            int(out["min_jaccard_milli"])) == (1, 666, 666)

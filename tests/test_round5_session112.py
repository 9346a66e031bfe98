"""Round-5 session-112: percolation sweep, TOPSIS, Nelson rules —
pins and sanity."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_percolation_sweep_sanity():
    import dug_ray.queries as q
    out = q.QUERIES["percolation_sweep"]("/root/testdata/sf0.001") \
        .to_pandas().set_index("w_min")
    # monotone: higher threshold keeps fewer edges/nodes
    assert int(out.loc[1, "n_edges"]) >= int(out.loc[2, "n_edges"]) \
        >= int(out.loc[3, "n_edges"])
    assert int(out.loc[1, "n_nodes"]) >= int(out.loc[2, "n_nodes"])
    for w in (1, 2, 3):
        assert 0 <= int(out.loc[w, "giant_ppm"]) <= 1_000_000


def test_topsis_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s112tp_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    # nation0 dominates every criterion
    pd.DataFrame({
        "o_custkey": [1, 1, 2],
        "o_totalprice": [50.00, 50.00, 10.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["topsis_nations"](d).to_pandas() \
        .set_index("nation")
    # dominant nation sits at the ideal: closeness 1000, rank 1
    assert (int(out.loc[0, "close_milli"]),
            int(out.loc[0, "rank"])) == (1000, 1)
    assert (int(out.loc[1, "close_milli"]),
            int(out.loc[1, "rank"])) == (0, 2)


def test_nelson_rules_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s112nr_")
    base = pd.Timestamp("1970-01-01")
    # 9 low days then 9 high days: two rule-2 runs, no 3-sigma days,
    # no 6-long strict monotone run (flat within halves)
    vals = [1.00] * 9 + [2.00] * 9
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(len(vals))]
        ).astype("datetime64[us]"),
        "o_totalprice": vals,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["nelson_rules"](d).to_pandas().iloc[0]
    assert int(out["n_days"]) == 18
    assert int(out["rule1_beyond3"]) == 0
    assert int(out["rule2_runs9"]) == 2
    assert int(out["rule3_mono6"]) == 0

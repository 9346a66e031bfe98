"""Round-5 session-129: ARI of 1-NN, WW runs, concentration index —
pins and mirrors."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_ari_knn_sanity():
    import dug_ray.queries as q
    out = q.QUERIES["ari_knn"]("/root/testdata/sf0.001") \
        .to_pandas().iloc[0]
    assert int(out["n_sample"]) > 0
    assert -1_000_000 <= int(out["ari_ppm"]) <= 1_000_000


def test_ww_runs_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s129ww_")
    pd.DataFrame({
        "o_orderstatus": ["F", "F", "O", "O"],
        "o_totalprice": [10.00, 20.00, 10.00, 30.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["ww_runs"](d).to_pandas().iloc[0]
    # sorted (v, st): (10,F)(10,O)(20,F)(30,O) -> 4 runs
    # expected = 1000 + 2000*4//4 = 3000
    assert (int(out["n_f"]), int(out["n_o"]), int(out["runs"])) \
        == (2, 2, 4)
    assert int(out["expected_milli"]) == 3000
    assert int(out["ratio_ppm"]) == (1_000_000 * 4) // 3000


def test_concentration_index_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s129ci_")
    pd.DataFrame({
        "o_custkey": [1, 2],
        "o_orderpriority": ["3-MEDIUM", "1-URGENT"],
        "o_totalprice": [1.00, 3.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["concentration_index"](d).to_pandas().iloc[0]
    # ranks by spend: c1=1 (u 0), c2=2 (u 300)
    # C = (2*600 - 3*300)/(2*300) = 0.5
    assert (int(out["n_customers"]), int(out["urgent_cents"])) \
        == (2, 300)
    assert int(out["c_ppm"]) == 500_000

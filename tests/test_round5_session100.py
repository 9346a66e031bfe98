"""Round-5 session-100: Menzerath's law, location quotients,
Gallagher index — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_menzerath_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s100mz_")
    df = pd.DataFrame({
        "doc_id": [1],
        "text": ["aaaa. bb cc! dd e"],
        "lang": ["en"], "source": ["s"], "n_chars": [17]})
    df.to_parquet(os.path.join(d, "documents.parquet"))
    out = q.QUERIES["menzerath_law"](d).to_pandas().set_index("m")
    # sentences: [aaaa] m=1 (4 ch); [bb,cc] m=2 (4 ch);
    # [dd,e] m=2 (3 ch)
    assert (int(out.loc[1, "n_sent"]),
            int(out.loc[1, "mean_wlen_milli"])) == (1, 4000)
    # m=2 bucket: 4 words, 7 chars -> 1750
    assert (int(out.loc[2, "n_sent"]),
            int(out.loc[2, "mean_wlen_milli"])) == (2, 1750)


def test_location_quotient_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s100lq_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    pd.DataFrame({
        "o_custkey": [1, 1, 2, 2],
        "o_orderpriority": ["1-URGENT", "1-URGENT",
                            "1-URGENT", "5-LOW"],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["location_quotient"](d).to_pandas()
    m = {(int(r["nation"]), r["priority"]): int(r["lq_milli"])
         for _, r in out.iterrows()}
    # N=4; nation0 urgent: 2*4/(2*3) -> 1333; nation1 urgent:
    # 1*4/(2*3) -> 666; nation1 low: 1*4/(2*1) -> 2000
    assert m == {(0, "1-URGENT"): 1333, (1, "1-URGENT"): 666,
                 (1, "5-LOW"): 2000}


def test_gallagher_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s100gi_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    pd.DataFrame({
        "o_custkey": [1, 2],
        "o_totalprice": [3.00, 1.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["gallagher_index"](d).to_pandas().iloc[0]
    # rev shares 750000/250000; cust shares 500000/500000
    # d = +-250000 -> G = sqrt(2*250000^2/2) = 250000
    assert (int(out["n_nations"]), int(out["g_ppm"])) == (2, 250_000)
    assert int(out["g_ppm"]) == math.floor(
        math.sqrt((250_000 ** 2 * 2) / 2.0))

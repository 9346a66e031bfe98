"""Round-5 session-119: differencing order, LSH plan, catalog
freshness — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_differencing_order_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s119do_")
    base = pd.Timestamp("1970-01-01")
    vals = [1000.00, 2000.00, 3000.00]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(3)]
        ).astype("datetime64[us]"),
        "o_totalprice": vals,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["differencing_order"](d).to_pandas() \
        .set_index("d")
    # kilo-dollars [1,2,3]: var0 = 666 milli; d1 [1,1]: 0; d2 [0]: 0
    assert int(out.loc[0, "var_milli"]) == 666
    assert int(out.loc[1, "var_milli"]) == 0
    assert int(out.loc[2, "var_milli"]) == 0
    # tie between d=1 and d=2 -> smaller d wins
    assert (int(out.loc[1, "is_min"]), int(out.loc[2, "is_min"])) \
        == (1, 0)


def test_lsh_plan_mirror():
    import dug_ray.queries as q
    out = q.QUERIES["lsh_plan"]("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 6
    row = out[(out["b"] == 16) & (out["r"] == 4)].iloc[0]
    assert int(row["threshold_milli"]) == math.floor(
        1000 * (1.0 / 16) ** (1.0 / 4))
    assert int(row["p50_milli"]) == math.floor(
        1000 * (1 - (1 - 0.5 ** 4) ** 16))
    assert int(out["recommended"].sum()) == 1
    assert int(out["n_docs"].iloc[0]) > 0


def test_catalog_freshness_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s119cf_")
    rows = [(1, "1994-01-05"), (1, "1994-01-20"),
            (1, "1994-02-05"), (2, "1994-02-20")]
    pd.DataFrame({
        "l_partkey": [r[0] for r in rows],
        "l_shipdate": pd.Series([pd.Timestamp(r[1]) for r in rows]
                                ).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["catalog_freshness"](d).to_pandas() \
        .set_index("ym")
    m0 = 1994 * 12 + 0
    m1 = 1994 * 12 + 1
    # month 1: part1 debuts, 2/2 lines new; month 2: part2 debuts,
    # 1/2 lines new
    assert (int(out.loc[m0, "n_new_parts"]),
            int(out.loc[m0, "share_ppm"])) == (1, 1_000_000)
    assert (int(out.loc[m1, "n_new_parts"]),
            int(out.loc[m1, "share_ppm"])) == (1, 500_000)

"""Round-5 session-92: KPSS, weighted kappa, partial correlation —
hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_kpss_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s92kp_")
    base = pd.Timestamp("1970-01-01")
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(3)]
        ).astype("datetime64[us]"),
        "o_totalprice": [1.00, 2.00, 3.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["kpss_stat"](d).to_pandas().iloc[0]
    # x=[1,2,3]: T = [-3,-3,0], num=18; den = 9*(42-36) = 54
    assert (int(out["n_days"]), int(out["eta_micro"])) == (3, 333_333)


def test_weighted_kappa_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s92wk_")
    pd.DataFrame({
        "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM",
                            "4-NOT", "5-LOW"],
        "o_totalprice": [10.00, 20.00, 30.00, 40.00, 50.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["weighted_kappa"](d).to_pandas().iloc[0]
    # perfect diagonal: priority i pairs with quintile i -> kappa 1
    assert (int(out["n"]), int(out["kappa_ppm"])) == (5, 1_000_000)


def test_partial_correlation_mirror():
    import math
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s92pc_")
    base = pd.Timestamp("1970-01-01")
    rows = [(0, 1.00), (1, 2.00), (1, 3.00), (2, 3.00),
            (3, 1.00), (3, 3.00)]
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=r[0]) for r in rows]
        ).astype("datetime64[us]"),
        "o_totalprice": [r[1] for r in rows],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["partial_correlation"](d).to_pandas().iloc[0]
    # daily: x=[1,5,3,4], y=[1,2,1,2], z=[1,2,3,4] — mirror ledger
    xs, ys, zs = [1, 5, 3, 4], [1, 2, 1, 2], [1, 2, 3, 4]
    n = 4

    def led(a, b):
        return (n * sum(p * q for p, q in zip(a, b))
                - sum(a) * sum(b))

    def r_m(c, va, vb):
        return math.floor(1000 * c / math.sqrt(float(va) * vb))

    rxy = r_m(led(xs, ys), led(xs, xs), led(ys, ys))
    rxz = r_m(led(xs, zs), led(xs, xs), led(zs, zs))
    ryz = r_m(led(ys, zs), led(ys, ys), led(zs, zs))
    assert (int(out["rxy_milli"]), int(out["rxz_milli"]),
            int(out["ryz_milli"])) == (rxy, rxz, ryz)
    den = (math.isqrt(1_000_000 - rxz * rxz)
           * math.isqrt(1_000_000 - ryz * ryz))
    num = 1000 * (1000 * rxy - rxz * ryz)
    exp = -((-num) // den) if num < 0 else num // den
    assert int(out["partial_milli"]) == exp

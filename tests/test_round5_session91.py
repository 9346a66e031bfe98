"""Round-5 session-91: Theil's U, systematic design effect, Spearman
footrule — hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_theil_u_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s91tu_")
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "lang": ["en", "en", "fr", "fr"],
        "source": ["s1", "s1", "s2", "s2"],
    })
    df["text"] = "x"
    df["n_chars"] = 1
    df.to_parquet(os.path.join(d, "documents.parquet"))
    out = q.QUERIES["theil_u"](d).to_pandas().iloc[0]
    # perfect association: MI = H(lang) = H(source) -> both U = 1e6
    assert (int(out["n_docs"]), int(out["u_lang_ppm"]),
            int(out["u_source_ppm"])) == (4, 1_000_000, 1_000_000)


def test_systematic_sampling_mirror():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s91sy_")
    base = pd.Timestamp("1970-01-01")
    n = 20
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in range(n)]
        ).astype("datetime64[us]"),
        "o_totalprice": [float(i + 1) for i in range(n)],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["systematic_sampling"](d).to_pandas().iloc[0]
    # mirror ledger: cents 100..2000 in day order, offsets i % 10
    x = [100 * (i + 1) for i in range(n)]
    groups = {}
    for i, v in enumerate(x):
        g = groups.setdefault(i % 10, [0, 0, 0])
        g[0] += 1
        g[1] += v
        g[2] += v * v
    s_tot, ss_tot = sum(x), sum(g[2] for g in groups.values())
    per = sum((10 ** 6 * g[1] * g[1]) // g[0] for g in groups.values())
    msb = (per - (10 ** 6 * s_tot * s_tot) // n) // 9
    msw = (10 ** 6 * ss_tot - per) // (n - 10)
    assert (int(out["n_days"]), int(out["k"])) == (20, 10)
    assert int(out["deff_milli"]) == (1000 * msb) // msw


def test_spearman_footrule_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s91sf_")
    pd.DataFrame({"c_custkey": [1, 2],
                  "c_nationkey": [0, 1]}).to_parquet(
        os.path.join(d, "customer.parquet"))
    # nation0: one 3.00 order; nation1: two 1.00 orders
    pd.DataFrame({
        "o_custkey": [1, 2, 2],
        "o_totalprice": [3.00, 1.00, 1.00],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["spearman_footrule"](d).to_pandas().iloc[0]
    # rev ranks: n0=1 n1=2; cnt ranks: n1=1 n0=2 -> F=2, max=2
    assert (int(out["k"]), int(out["f_sum"]),
            int(out["foot_ppm"])) == (2, 2, 1_000_000)

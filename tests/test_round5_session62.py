"""Round-5 session-62: Cronbach's alpha, Fleiss' kappa, Mood's median
test — hand-computed pins."""

from __future__ import annotations

import hashlib
import math
import os
import tempfile

import pandas as pd


def _mini(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s62_")
    # cust 1: items (2, 1, 0); cust 2: items (0, 1, 2); cust 3: (1, 1, 1)
    dates = (["1992-06-01", "1993-06-01", "1994-06-01"]          # cust 1
             + ["1995-06-01", "1996-06-01", "1997-06-01"]        # cust 2
             + ["1992-01-01", "1994-01-01", "1996-01-01"])       # cust 3
    pd.DataFrame({
        "o_orderkey": range(1, 10),
        "o_custkey": [1, 1, 1, 2, 2, 2, 3, 3, 3],
        "o_orderdate": pd.to_datetime(dates).astype("datetime64[us]"),
        "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM"] * 3,
        "o_totalprice": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0,
                         70.0, 80.0, 90.0],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_cronbach_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["cronbach_alpha"](_mini()).to_pandas().iloc[0]
    # items per cust: (2,1,0), (0,1,2), (1,1,1); totals all 3
    # var numerators (n=3): item0: 3*5-9=6; item1: 3*3-9=0; item2: 6
    # total: 3*27-81=0 -> den=0 -> alpha sentinel 0
    assert int(out["n_subjects"]) == 3
    assert int(out["svar_num"]) == 12
    assert int(out["tvar_num"]) == 0
    assert int(out["alpha_micro"]) == 0


def test_fleiss_hand_replay():
    import dug_ray.queries as q
    out = q.QUERIES["fleiss_kappa"](_mini()).to_pandas().iloc[0]
    base = {1: 0, 2: 1, 3: 2, 4: 0, 5: 1, 6: 2, 7: 0, 8: 1, 9: 2}
    n, r = 9, 4
    qsum, cs = 0, [0, 0, 0]
    for okey, c in base.items():
        nj = [0, 0, 0]
        for rr in range(4):
            h = int(hashlib.md5(f"fk:{rr}:{okey}".encode())
                    .hexdigest()[:15], 16)
            rating = (c + 1) % 3 if h % 5 == 0 else c
            nj[rating] += 1
        qsum += sum(x * x for x in nj)
        for j in range(3):
            cs[j] += nj[j]
    assert int(out["n_items"]) == n
    assert int(out["q_sum"]) == qsum
    assert [int(out["c0"]), int(out["c1"]), int(out["c2"])] == cs
    a, b = qsum - n * r, n * r * (r - 1)
    e, f = sum(c * c for c in cs), (n * r) ** 2
    want = math.floor(1000000.0 * float(a * f - e * b)
                      / float(b * (f - e)))
    assert int(out["kappa_micro"]) == want


def test_mood_median_hand_pin():
    import dug_ray.queries as q
    out = q.QUERIES["mood_median"](_mini()).to_pandas()
    # dollars 10..90, N=9, lower median = 5th smallest = 50
    assert out["median_dollars"].nunique() == 1
    assert int(out["median_dollars"].iloc[0]) == 50
    m = {r["prio"]: (int(r["n"]), int(r["n_above"]))
         for _, r in out.iterrows()}
    # above 50: 60, 70, 80, 90 -> MEDIUM (30,60,90): 2 above;
    # URGENT (10,40,70): 1; HIGH (20,50,80): 1
    assert m == {"1-URGENT": (3, 1), "2-HIGH": (3, 1),
                 "3-MEDIUM": (3, 2)}
    # chi2 = sum of the floored per-group terms, constant column
    want = int(out["term_above_micro"].sum()
               + out["term_below_micro"].sum())
    assert out["chi2_micro"].nunique() == 1
    assert int(out["chi2_micro"].iloc[0]) == want
    # one term replicated: URGENT above: e = 3*4/9; term =
    # floor(1e6*(1-4/3)^2/(4/3))
    e = 3.0 * 4 / 9.0
    t = math.floor(1000000.0 * (1 - e) * (1 - e) / e)
    row = out[out["prio"] == "1-URGENT"].iloc[0]
    assert int(row["term_above_micro"]) == t

"""Round-5 session-61: power-of-two-choices placement, rendezvous
hashing failover plan, DP sensitivity audit — hand-computed pins."""

from __future__ import annotations

import hashlib
import os
import tempfile

import pandas as pd


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _mini(_cache={}):
    if "dir" in _cache:
        return _cache["dir"]
    d = tempfile.mkdtemp(prefix="s61_")
    # cust 1: 3 orders on day A + 1 on day B (linf=3, l1=4);
    # cust 2: 1 order each on two days (l1=2)
    pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4, 5, 6],
        "o_custkey": [1, 1, 1, 1, 2, 2],
        "o_orderdate": pd.to_datetime(
            ["1996-01-01"] * 3 + ["1996-01-02", "1996-01-03",
                                  "1996-01-04"]).astype("datetime64[us]"),
        "o_totalprice": [10.0] * 6,
    }).to_parquet(os.path.join(d, "orders.parquet"))
    _cache["dir"] = d
    return d


def test_two_choice_hand_replay():
    import dug_ray.queries as q
    out = q.QUERIES["two_choice_load"](_mini()).to_pandas()
    assert len(out) == 64
    assert int(out["load_single"].sum()) == 6
    assert int(out["load_two"].sum()) == 6
    # replay the rule by hand
    keys = [1, 2, 3, 4, 5, 6]
    h1 = {k: _h60(f"tc1:{k}") % 64 for k in keys}
    h2 = {k: _h60(f"tc2:{k}") % 64 for k in keys}
    load1 = [0] * 64
    for k in keys:
        load1[h1[k]] += 1
    load2 = [0] * 64
    for k in keys:
        b = h1[k] if load1[h1[k]] <= load1[h2[k]] else h2[k]
        load2[b] += 1
    got = out.sort_values("bucket")
    assert list(got["load_single"]) == load1
    assert list(got["load_two"]) == load2


def test_rendezvous_hand_replay():
    import dug_ray.queries as q
    out = q.QUERIES["rendezvous_hash"](_mini()).to_pandas()
    assert int(out["n_keys"].sum()) == 6
    ref = {}
    for k in [1, 2, 3, 4, 5, 6]:
        w = [(_h60(f"hrw:{i}:{k}"), -i) for i in range(8)]
        order = sorted(range(8), key=lambda i: w[i], reverse=True)
        p, s = order[0], order[1]
        ref[(p, s)] = ref.get((p, s), 0) + 1
    got = {(int(r["primary"]), int(r["secondary"])): int(r["n_keys"])
           for _, r in out.iterrows()}
    assert got == ref
    # HRW minimal disruption: primary != secondary always
    assert all(p != s for p, s in got)


def test_dp_sensitivity_pins():
    import dug_ray.queries as q
    out = q.QUERIES["dp_sensitivity"](_mini()).to_pandas()
    m = {(r["metric"], int(r["eps_milli"])): (int(r["sensitivity"]),
                                              int(r["b_milli"]))
         for _, r in out.iterrows()}
    assert m[("linf_cell", 1000)] == (3, 3000)
    assert m[("linf_cell", 500)] == (3, 6000)
    assert m[("l1_user", 1000)] == (4, 4000)
    assert m[("l1_user", 500)] == (4, 8000)

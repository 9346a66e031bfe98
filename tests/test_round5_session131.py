"""Round-5 session-131: avalanche audit, position attribution,
yearly retention — hand-computed pins."""

from __future__ import annotations

import hashlib
import os
import tempfile

import pandas as pd


def test_avalanche_mirror():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s131av_")
    keys = [1, 2, 3]
    pd.DataFrame({"o_orderkey": keys}).to_parquet(
        os.path.join(d, "orders.parquet"))
    out = q.QUERIES["avalanche_audit"](d).to_pandas().iloc[0]

    def h32(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)

    pops = [bin(h32(k) ^ h32(k + 1)).count("1") for k in keys]
    assert int(out["n"]) == 3
    assert int(out["mean_milli"]) == (1000 * sum(pops)) // 3
    assert int(out["min_bits"]) == min(pops)
    assert int(out["max_bits"]) == max(pops)


def test_position_attribution_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s131pa_")
    base = pd.Timestamp("2024-01-01")
    rows = [(1, "view"), (1, "click"), (1, "signup"),
            (1, "purchase"), (2, "view"), (2, "purchase")]
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "event_id": list(range(len(rows))),
        "ts": pd.Series([base + pd.Timedelta(minutes=i)
                         for i in range(len(rows))]
                        ).astype("datetime64[us]"),
        "event_type": [r[1] for r in rows],
    }).to_parquet(os.path.join(d, "events.parquet"))
    out = q.QUERIES["position_attribution"](d).to_pandas() \
        .set_index("channel")
    # u1 path [view,click,signup]: 1008/504/1008; u2 [view]: 2520
    assert int(out.loc["view", "credit"]) == 1008 + 2520
    assert int(out.loc["click", "credit"]) == 504
    assert int(out.loc["signup", "credit"]) == 1008
    total = 1008 + 2520 + 504 + 1008
    assert int(out.loc["view", "share_ppm"]) == \
        (1_000_000 * 3528) // total


def test_yearly_retention_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s131yr_")
    rows = [(1, "1994-05-01"), (2, "1994-06-01"),
            (2, "1995-05-01"), (3, "1995-06-01")]
    pd.DataFrame({
        "o_custkey": [r[0] for r in rows],
        "o_orderdate": pd.Series([pd.Timestamp(r[1]) for r in rows]
                                 ).astype("datetime64[us]"),
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["yearly_retention_jaccard"](d).to_pandas() \
        .iloc[0]
    # 1994 {1,2}, 1995 {2,3}: inter 1, union 3, repeat 1/2
    assert (int(out["yr_a"]), int(out["yr_b"])) == (1994, 1995)
    assert int(out["jaccard_milli"]) == 333
    assert int(out["repeat_ppm"]) == 500_000

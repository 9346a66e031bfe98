"""Round-5 session-86: Agresti-Coull bounds, coupon-collector audit,
birthday collision audit — hand-computed pins."""

from __future__ import annotations

import hashlib
import math
import os
import tempfile

import pandas as pd


def test_wilson_bounds_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s86wb_")
    pd.DataFrame({
        "event_type": ["purchase", "view", "click", "view"],
    }).to_parquet(os.path.join(d, "events.parquet"))
    out = q.QUERIES["wilson_bounds"](d).to_pandas().iloc[0]
    # k=1, n=4: p_milli = 3000 // 8 = 375
    assert (int(out["n"]), int(out["k"]), int(out["p_milli"])) \
        == (4, 1, 375)
    se = math.sqrt(3.0 * 5 / (8.0 * 8 * 8))
    assert int(out["lo_milli"]) == math.floor(1000 * (3.0 / 8 - 2 * se))
    assert int(out["hi_milli"]) == math.floor(1000 * (3.0 / 8 + 2 * se))


def test_coupon_collector_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s86cc_")
    pd.DataFrame({"p_partkey": [1, 2, 3],
                  "p_brand": ["B"] * 3}).to_parquet(
        os.path.join(d, "part.parquet"))
    pd.DataFrame({"l_partkey": [1, 1, 2]}).to_parquet(
        os.path.join(d, "lineitem.parquet"))
    out = q.QUERIES["coupon_collector"](d).to_pandas().iloc[0]
    # K=3, m=3: v_exp = floor(3*(1 - (2/3)^3)) = floor(19/9) = 2
    assert (int(out["k_parts"]), int(out["m"]), int(out["v_obs"]),
            int(out["v_exp"]), int(out["deficit"])) == (3, 3, 2, 2, 0)


def test_birthday_audit_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s86ba_")
    keys = [1, 1, 2, 3]
    pd.DataFrame({"o_orderkey": keys}).to_parquet(
        os.path.join(d, "orders.parquet"))
    out = q.QUERIES["birthday_audit"](d).to_pandas().iloc[0]
    # independent bucket computation via hashlib
    b = [int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
         % 1_048_576 for k in keys]
    vc = pd.Series(b).value_counts()
    obs = int(sum(c * (c - 1) // 2 for c in vc))
    assert (int(out["m"]), int(out["n_buckets_used"]),
            int(out["obs_pairs"]), int(out["max_load"])) \
        == (4, len(vc), obs, int(vc.max()))
    # duplicate key 1 guarantees at least one colliding pair
    assert obs >= 1
    assert int(out["exp_milli"]) == (1000 * 4 * 3) // (2 * 1_048_576)

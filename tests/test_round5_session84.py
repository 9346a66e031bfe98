"""Round-5 session-84: Yule's K, rank-turbulence movers, Atkinson
index — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def _docs(rows, prefix, _cache={}):
    key = (prefix, tuple(rows))
    if key in _cache:
        return _cache[key]
    d = tempfile.mkdtemp(prefix=prefix)
    df = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    df["source"] = "s"
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(os.path.join(d, "documents.parquet"))
    _cache[key] = d
    return d


def test_yule_k_hand_pin():
    import dug_ray.queries as q
    rows = [(1, "en", "a a b"), (2, "en", "b c")]
    out = q.QUERIES["yule_k"](_docs(rows, "s84yk_")).to_pandas().iloc[0]
    # f: a=2 b=2 c=1 -> N=5, V=3, S2=9
    # yule_milli = 10^7 * 4 // 25 = 1_600_000
    assert (int(out["n_tokens"]), int(out["n_types"]),
            int(out["yule_milli"])) == (5, 3, 1_600_000)


def test_rank_turbulence_hand_pin():
    import dug_ray.queries as q
    rows = [(1, "en", "x x y z"), (2, "fr", "y y x"),
            (3, "de", "zzz zzz")]
    out = q.QUERIES["rank_turbulence"](
        _docs(rows, "s84rt_")).to_pandas()
    m = {r["term"]: (int(r["r_en"]), int(r["r_fr"]),
                     int(r["delta_nano"]))
         for _, r in out.iterrows()}
    # en ranks: x=1 y=2 z=3; fr ranks: y=1 x=2; shared {x, y}
    assert m == {"x": (1, 2, 500_000_000),
                 "y": (2, 1, 500_000_000)}
    # tie on delta -> term asc ordering puts x first
    assert out.iloc[0]["term"] == "x"


def test_atkinson_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s84at_")
    pd.DataFrame({"o_totalprice": [1.00, 2.00, 4.00]}).to_parquet(
        os.path.join(d, "orders.parquet"))
    out = q.QUERIES["atkinson_index"](d).to_pandas().iloc[0]
    # cents [100,200,400]: s_milli = 4605 + 5298 + 5991 = 15894
    s = (math.floor(1000 * math.log(100))
         + math.floor(1000 * math.log(200))
         + math.floor(1000 * math.log(400)))
    assert int(out["s_milli"]) == s == 15_894
    exp = 1_000_000 - math.floor(
        1_000_000 * math.exp(s / 3000.0) * 3 / 700)
    assert (int(out["n"]), int(out["sum_cents"]),
            int(out["atkinson_ppm"])) == (3, 700, exp)
    # geomean of (1,2,4) = 2, mean = 7/3 -> A ~ 1 - 6/7 ~ 0.1428
    assert abs(int(out["atkinson_ppm"]) - 142_857) < 500

"""Round-5 session-118: Poisson mixture, Molloy-Reed, quantile
ratios — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_poisson_mixture_mirror():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s118pm_")
    base = pd.Timestamp("1970-01-01")
    # daily counts [1,1,1,5]
    rows = [(0, 1), (1, 1), (2, 1)] + [(3, 1)] * 5
    days = [0, 1, 2] + [3] * 5
    pd.DataFrame({
        "o_orderdate": pd.Series(
            [base + pd.Timedelta(days=i) for i in days]
        ).astype("datetime64[us]"),
        "o_totalprice": [1.00] * len(days),
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["poisson_mixture"](d).to_pandas().iloc[0]
    # S1=8 S2=20 S3=60, D=4: B=5, C=5
    b_f, c_f = 80 / 16, 80 / 16
    disc = b_f * b_f - 4 * c_f
    la = (b_f - math.sqrt(disc)) / 2
    lb = (b_f + math.sqrt(disc)) / 2
    w = (lb - 2.0) / (lb - la)
    assert int(out["n_days"]) == 4
    assert int(out["lam1_milli"]) == math.floor(1000 * la)
    assert int(out["lam2_milli"]) == math.floor(1000 * lb)
    assert int(out["w_ppm"]) == math.floor(1_000_000 * w)


def test_molloy_reed_mirror():
    import dug_ray.queries as q
    from dug_ray.stages.graph import concept_cooccurrence
    import dug_ray.pipelines.kg as kg
    sf = "/root/testdata/sf0.001"
    out = q.QUERIES["molloy_reed"](sf).to_pandas().iloc[0]
    edges = concept_cooccurrence(
        kg.linked_mentions_cached(sf), 16).to_pandas()
    deg = {}
    for s_, o_ in zip(edges["subj"], edges["obj"]):
        deg[s_] = deg.get(s_, 0) + 1
        deg[o_] = deg.get(o_, 0) + 1
    sk = sum(deg.values())
    sk2 = sum(v * v for v in deg.values())
    assert int(out["n_nodes"]) == len(deg)
    assert int(out["kappa_milli"]) == (1000 * sk2) // sk
    assert int(out["giant_predicted"]) in (0, 1)


def test_quantile_ratio_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s118qr_")
    pd.DataFrame({
        "o_totalprice": [float(i) for i in range(1, 11)],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    out = q.QUERIES["quantile_ratio"](d).to_pandas().iloc[0]
    # p50=5, p90=9, p99=10
    assert (int(out["p50"]), int(out["p90"]), int(out["p99"])) \
        == (5, 9, 10)
    assert (int(out["r90_milli"]), int(out["r99_milli"])) \
        == (1800, 2000)

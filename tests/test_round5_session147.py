"""Round-5 session-147: edge embeddedness, AEP coverage, sample-size
plan — pins and mirrors."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd


def test_edge_embeddedness_mirror():
    import dug_ray.queries as q
    from dug_ray.stages.graph import concept_cooccurrence
    import dug_ray.pipelines.kg as kg
    sf = "/root/testdata/sf0.001"
    out = q.QUERIES["edge_embeddedness"](sf).to_pandas().iloc[0]
    edges = concept_cooccurrence(
        kg.linked_mentions_cached(sf), 16).to_pandas()
    adj = {}
    for s_, o_ in zip(edges["subj"], edges["obj"]):
        adj.setdefault(s_, set()).add(o_)
        adj.setdefault(o_, set()).add(s_)
    n_bridge = sum(1 for s_, o_ in zip(edges["subj"], edges["obj"])
                   if not (adj[s_] & adj[o_]))
    assert int(out["n_edges"]) == len(edges)
    assert int(out["n_bridges"]) == n_bridge


def test_aep_coverage_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s147ae_")
    base = pd.Timestamp("2024-01-01")
    rows = [(1, "view"), (1, "click"), (2, "view"), (2, "click"),
            (3, "view"), (3, "error")]
    pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "event_id": list(range(len(rows))),
        "ts": pd.Series([base + pd.Timedelta(minutes=i)
                         for i in range(len(rows))]
                        ).astype("datetime64[us]"),
        "event_type": [r[1] for r in rows],
    }).to_parquet(os.path.join(d, "events.parquet"))
    out = q.QUERIES["aep_coverage"](d).to_pandas().iloc[0]
    s1 = math.floor(1_000_000 * math.log(3 / 2))
    s2 = math.floor(1_000_000 * math.log(3 / 1))
    h = (2 * s1 + s2) // 3
    cov = sum(1 for m in (s1, s1, s2) if abs(m - h) <= h // 4)
    assert int(out["h_micro"]) == h
    assert int(out["covered_ppm"]) == (1_000_000 * cov) // 3


def test_sample_size_plan_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s147sp_")
    pd.DataFrame({
        "event_type": ["purchase", "view", "view", "view"],
    }).to_parquet(os.path.join(d, "events.parquet"))
    out = q.QUERIES["sample_size_plan"](d).to_pandas().iloc[0]
    # p = 250000 ppm; n_req = ceil(7.5e15 / 9e12) = 834
    assert (int(out["n_obs"]), int(out["p_ppm"])) == (4, 250_000)
    assert int(out["n_required"]) == 834
    assert int(out["sufficient"]) == 0

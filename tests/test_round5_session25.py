"""Round-5 session-25: integer HITS."""

from __future__ import annotations

import pandas as pd
import ray.data


def _triples(rows):
    df = pd.DataFrame(rows, columns=["subj", "obj"])
    df["pred"] = "p"
    return ray.data.from_pandas(df).repartition(2)


def test_hits_star_graph_hand_values():
    from dug_ray.stages.graph import hits_scores
    # hub h points at a1, a2; scale 1000
    ds = _triples([("h", "a1"), ("h", "a2")])
    out = (hits_scores(ds, rounds=1, scale=1000).to_pandas()
           .set_index("node"))
    # round 1: h_raw(h) = a0(a1)+a0(a2) = 2000, others 0; divisor
    # 2000//1000+1 = 3 -> h = [666, 0, 0]
    assert out.loc["h", "hub_mass"] == 666
    assert out.loc["a1", "hub_mass"] == 0
    # a_raw(a1) = h(h) = 666, divisor 666//1000+1 = 1 -> 666
    assert out.loc["a1", "auth_mass"] == 666
    assert out.loc["a2", "auth_mass"] == 666
    assert out.loc["h", "auth_mass"] == 0


def test_hits_distributed_matches_driver_gate():
    from dug_ray.stages.graph import hits_scores
    rows = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "a"), ("d", "a")]
    ds = _triples(rows)
    key = "node"
    local = (hits_scores(ds, rounds=2, scale=1000).to_pandas()
             .sort_values(key).reset_index(drop=True))
    dist = (hits_scores(ds, rounds=2, scale=1000, max_driver_edges=0)
            .to_pandas().sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(local, dist)

"""Round-5 session-34: local clustering coefficient and Adamic-Adar
link prediction — the bounded driver fast path must be bit-identical to
the distributed wedge path (forced via max_driver_edges=0), the same
two-path contract triangle_counts / neighbor_jaccard carry, plus
hand-computed value pins."""

from __future__ import annotations

import math

import pandas as pd
import ray.data

from dug_ray.stages.graph import adamic_adar, clustering_coefficient

# two triangles sharing the edge (b, c), plus a pendant chain
EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d"),
         ("d", "e")]


def _edges():
    return ray.data.from_pandas(pd.DataFrame(EDGES,
                                             columns=["subj", "obj"]))


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_clustering_coeff_values_and_paths():
    local = clustering_coefficient(_edges(), num_buckets=4).to_pandas()
    dist = clustering_coefficient(_edges(), num_buckets=4,
                                  max_driver_edges=0).to_pandas()
    pd.testing.assert_frame_equal(_sorted(local), _sorted(dist))
    got = local.set_index("node")
    # deg: a=2 b=3 c=3 d=3 e=1; triangles: a=1 b=2 c=2 d=1
    # cc = 2T/(d(d-1)): a -> 2/2 = 1000; b -> 4/6 = 666; d -> 2/6 = 333
    assert got.loc["a", "cc_milli"] == 1000
    assert got.loc["b", "cc_milli"] == 666
    assert got.loc["d", "cc_milli"] == 333
    # e has deg 1 -> coefficient undefined -> omitted
    assert "e" not in got.index
    assert got.loc["b", "deg"] == 3 and got.loc["b", "n_triangles"] == 2


def test_adamic_adar_values_and_paths():
    local = adamic_adar(_edges(), num_buckets=4).to_pandas()
    dist = adamic_adar(_edges(), num_buckets=4,
                       max_driver_edges=0).to_pandas()
    pd.testing.assert_frame_equal(_sorted(local), _sorted(dist))
    got = local.set_index(["node_a", "node_b"])
    w3 = math.floor(1_000_000.0 / math.log(3))
    # (a, d): non-adjacent, common {b, c} both deg 3 -> 2 * w3
    assert got.loc[("a", "d"), "n_common"] == 2
    assert got.loc[("a", "d"), "aa_micro"] == 2 * w3
    # (b, e) / (c, e): common {d}, deg(d) = 3
    assert got.loc[("b", "e"), "aa_micro"] == w3
    assert got.loc[("c", "e"), "aa_micro"] == w3
    # adjacent pairs are anti-joined away
    assert ("a", "b") not in got.index and ("d", "e") not in got.index
    assert len(got) == 3


def test_adamic_adar_degree_cap():
    # a star hub z--{n1..n5} plus one side edge; cap 4 silences the hub
    edges = [("z", f"n{i}") for i in range(1, 6)] + [("n1", "n2")]
    ds = ray.data.from_pandas(pd.DataFrame(
        [(min(a, b), max(a, b)) for a, b in edges],
        columns=["subj", "obj"]))
    capped = adamic_adar(ds, num_buckets=4, max_apex_deg=4).to_pandas()
    # hub deg 5 > 4 -> no wedges through z; n1/n2 (deg 2) apexes produce
    # only pairs involving z and each other, all adjacent except (n2, z)
    # via apex n1 and (n1, z) via apex n2 -- both ADJACENT, so filtered;
    # remaining candidate: none
    assert len(capped) == 0
    uncapped = adamic_adar(ds, num_buckets=4, max_apex_deg=64).to_pandas()
    # with the hub active: all n_i pairs except the (n1, n2) edge
    assert len(uncapped) == 9
    w5 = math.floor(1_000_000.0 / math.log(5))
    got = uncapped.set_index(["node_a", "node_b"])
    assert got.loc[("n3", "n4"), "aa_micro"] == w5

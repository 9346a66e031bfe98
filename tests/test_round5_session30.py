"""Round-5 session-30: PPJoin prefix-filtered set-similarity join."""

from __future__ import annotations

import pandas as pd
import ray.data


def _jac_bruteforce(texts, t_milli=500):
    sets = {i: set(x.split(" ")) for i, x in enumerate(texts)}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if 1000 * inter >= t_milli * uni:
                out[(a, b)] = (inter, uni, (inter * 1000) // uni)
    return out


def test_ppjoin_equals_bruteforce_with_pruning_cases():
    from dug_ray.stages.dedup import ppjoin_pairs
    texts = [
        "aa bb cc dd",          # 0
        "aa bb cc ee",          # 1: jac 3/5 with 0 -> kept
        "aa zz yy xx",          # 2: jac 1/7 with 0 -> pruned
        "bb cc dd",             # 3: jac 3/4 with 0 -> kept
        "qq rr",                # 4: disjoint
        "qq rr",                # 5: identical to 4 -> jac 1
    ]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts})).repartition(3)
    out = ppjoin_pairs(ds).to_pandas()
    got = {(r.doc_a, r.doc_b): (r.inter, r.uni, r.jac_milli)
           for r in out.itertuples()}
    assert got == _jac_bruteforce(texts)
    assert got[(4, 5)] == (2, 2, 1000)
    assert (0, 2) not in got

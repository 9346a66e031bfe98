"""Round-5 session-58l: personalized PageRank, leakage-free target
encoding, burstiness coefficient — hand-computed pins."""

from __future__ import annotations

import hashlib
import math
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

import dug_ray.queries as q


def test_personalized_pagerank_chain():
    # S:a -> x -> y, seeds = {S:a}: all teleport mass pins to S:a;
    # hand-run the 3 integer rounds (scale 1e12, damping 85/100)
    from dug_ray.stages.graph import personalized_pagerank
    triples = ray.data.from_arrow(pa.table({
        "subj": ["S:a", "x"], "pred": ["p", "p"], "obj": ["x", "y"]}))
    out = personalized_pagerank(triples, seed_prefix="S:",
                                iterations=3).to_pandas()
    got = dict(zip(out["node"], out["rank_mass"]))
    assert got == {"S:a": 150_000_000_000,
                   "x": 127_500_000_000,
                   "y": 108_375_000_000}


def test_target_encoding_out_of_fold():
    # one priority, keys 0..9, price = 1000*(key+1); replicate the
    # md5 folds and the out-of-fold milli-dollar means
    keys = list(range(10))
    df = pd.DataFrame({
        "o_orderkey": keys,
        "o_orderpriority": ["1-URGENT"] * 10,
        "o_totalprice": [1000.0 * (k + 1) for k in keys],
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["target_encoding"](d).to_pandas()
    folds = {k: int(hashlib.md5(str(k).encode()).hexdigest()[:8],
                    16) % 5 for k in keys}
    S = sum(1000 * (k + 1) for k in keys)
    for _, r in out.iterrows():
        ks = [k for k in keys if folds[k] == r.fold]
        sf = sum(1000 * (k + 1) for k in ks)
        assert r.n == len(ks)
        assert r.enc_milli == math.floor(
            1000 * ((S - sf) / (10 - len(ks))))


def test_burstiness_periodic_vs_bursty():
    # type "tick": gaps [10, 10] s -> sd 0 -> B = -1; type "burst":
    # gaps [1, 99] -> hand formula
    rows = [(0, 1, 0, "tick"), (1, 1, 10, "tick"), (2, 1, 20, "tick"),
            (3, 2, 0, "burst"), (4, 2, 1, "burst"),
            (5, 2, 100, "burst")]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "sec",
                                     "event_type"])
    df["ts"] = pd.to_datetime("2024-01-01") + \
        pd.to_timedelta(df["sec"], unit="s")
    df["value"] = 1.0
    df["props"] = "{}"
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(
            df[["event_id", "user_id", "ts", "event_type", "value",
                "props"]]),
            os.path.join(d, "events.parquet"))
        out = q.QUERIES["burstiness_coeff"](d).to_pandas()
    g = {r.event_type: (r.n_gaps, r.b_micro) for r in out.itertuples()}
    assert g["tick"] == (2, -1_000_000)
    n, s, s2 = 2, 100, 1 + 99 * 99
    var = float(n * s2 - s * s) / float(n * n)
    sd, mean = math.sqrt(var), float(s) / float(n)
    assert g["burst"] == (2, math.floor(
        1000000 * ((sd - mean) / (sd + mean))))

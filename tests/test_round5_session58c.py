"""Round-5 session-58c: zigzag-varint footprint audit, Hilbert layout
keys, rank-biased precision — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import dug_ray.queries as q


def test_varint_audit_byte_rungs():
    # zigzag doubles the value: 0->1B, 63->1B (126<128), 64->2B (128),
    # 2**13->3B (2**14 hits the 2-byte bound exactly -> next rung)
    df = pd.DataFrame({
        "l_orderkey": [0, 63, 64, 2 ** 13],          # 1+1+2+3 = 7 bytes
        "l_partkey": [1, 1, 1, 1],                   # 4 bytes
        "l_suppkey": [2 ** 20, 2 ** 20, 0, 0],       # 4+4+1+1 = 10
        "l_linenumber": pd.array([1, 2, 3, 4], dtype="int32"),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "lineitem.parquet"))
        out = q.QUERIES["varint_audit"](d).to_pandas()
    got = dict(zip(out["col"], out["total_bytes"]))
    assert got == {"l_orderkey": 7, "l_partkey": 4, "l_suppkey": 10,
                   "l_linenumber": 4}
    r = out[out["col"] == "l_suppkey"].iloc[0]
    assert r.avg_milli == 2500  # 10 bytes / 4 values
    assert r.saved_ppm == (1_000_000 * (32 - 10)) // 32


def _xy2d_ref(x, y):
    # scalar reference implementation of the classic xy2d (n=256)
    d, s = 0, 128
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = 255 - x, 255 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_keys_match_reference_walk():
    # custkeys 0..1023 cover a 256x4 strip; engine must equal the
    # scalar reference at every point, and consecutive hkeys must map
    # to grid-adjacent cells (the Hilbert locality property)
    df = pd.DataFrame({"c_custkey": range(1024)})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "customer.parquet"))
        out = q.QUERIES["hilbert_keys"](d).to_pandas()
    for _, r in out.head(40).iterrows():
        assert r.hkey == _xy2d_ref(int(r.x), int(r.y))
    # locality: where hkeys are curve-consecutive (diff==1), the cells
    # must be 4-adjacent (the strip skips curve segments outside it)
    s = out.sort_values("hkey")
    consec = s["hkey"].diff().iloc[1:] == 1
    dx = s["x"].diff().abs().iloc[1:]
    dy = s["y"].diff().abs().iloc[1:]
    assert consec.any()
    assert ((dx + dy)[consec] == 1).all()


def test_rbp_eval_geometric_weights():
    # term "fast": ranks [1,2,3] with rel [1,0,1] (doc1 tf=1 at rank 2)
    rows = [(0, "s", "fast fast fast"),
            (1, "s", "fast b"),
            (2, "s", "fast fast " + " ".join(["b"] * 14))] + \
           [(i, "s", "c c") for i in range(3, 7)]
    df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    df["lang"] = "en"
    df["n_chars"] = df["text"].str.len()
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        out = q.QUERIES["rbp_eval"](d).to_pandas()
    r = out[out["term"] == "fast"].iloc[0]
    w = lambda k: math.floor(1000000 * (1 - 0.8) * math.pow(0.8, k - 1))
    assert (r.n_hits, r.rbp_micro) == (2, w(1) + w(3))
    assert r.resid_micro == math.floor(1000000 * math.pow(0.8, 10))

"""Round-5 session-58d: spatial grid join, range-splitter balance,
WOE/IV binning — hand-computed pins."""

from __future__ import annotations

import hashlib
import math
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import dug_ray.queries as q


def _h(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 1024


def test_grid_join_nearest_in_ring():
    # one customer, three suppliers; recompute the md5 grid walk by
    # hand and pin the winner = min (d2, suppkey) among ring candidates
    custs = [1, 2, 3]
    sups = [10, 11, 12, 13]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(
            pd.DataFrame({"c_custkey": custs})),
            os.path.join(d, "customer.parquet"))
        pq.write_table(pa.Table.from_pandas(
            pd.DataFrame({"s_suppkey": sups})),
            os.path.join(d, "supplier.parquet"))
        out = q.QUERIES["grid_join"](d).to_pandas()
    # reference: brute-force the same semantics
    exp = {}
    for c in custs:
        cx, cy = _h(f"cx{c}"), _h(f"cy{c}")
        best = None
        for s in sups:
            sx, sy = _h(f"sx{s}"), _h(f"sy{s}")
            if abs(sx // 64 - cx // 64) <= 1 and \
               abs(sy // 64 - cy // 64) <= 1:
                d2 = (cx - sx) ** 2 + (cy - sy) ** 2
                if best is None or (d2, s) < best:
                    best = (d2, s)
        if best is not None:
            exp[c] = (best[1], best[0])
    got = {int(r.c_custkey): (int(r.s_suppkey), int(r.d2))
           for r in out.itertuples()}
    assert got == exp


def test_splitter_balance_uniform_keys():
    # 16 rows with keys 1..16: splitters at ranks ceil(i*16/8) = 2,4,..
    # -> values 2,4,6,8,10,12,14; partition p holds keys (2p, 2p+1]
    # except p=0 holds {1, 2} -> every partition has exactly 2 rows
    df = pd.DataFrame({"l_orderkey": range(1, 17)})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "lineitem.parquet"))
        out = q.QUERIES["splitter_balance"](d).to_pandas()
    assert list(out["part"]) == list(range(8))
    assert list(out["n_rows"]) == [2] * 8
    assert list(out["dev_ppm"]) == [0] * 8


def test_woe_iv_two_bins():
    # bin 0: 3 pos / 1 neg; bin 1: 1 pos / 3 neg (totals 4/4)
    prices = [10.0] * 4 + [60_000.0] * 4
    status = ["F", "F", "F", "O", "F", "O", "O", "O"]
    df = pd.DataFrame({"o_orderstatus": status,
                       "o_totalprice": prices})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["woe_iv"](d).to_pandas()
    assert list(out["bin"]) == [0, 1]
    r0 = out.iloc[0]
    lnr = math.log((3 * 4) / (1 * 4))
    assert r0.woe_micro == math.floor(1000000 * lnr)
    assert r0.iv_micro == math.floor(
        1000000 * ((3 / 4 - 1 / 4) * lnr))
    r1 = out.iloc[1]
    lnr1 = math.log((1 * 4) / (3 * 4))
    assert r1.woe_micro == math.floor(1000000 * lnr1)  # negative, floors
    assert r1.iv_micro == math.floor(
        1000000 * ((1 / 4 - 3 / 4) * lnr1))

"""Round-5 session-58i: Hill tail index, Shannon code lengths, PSI
drift — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import dug_ray.queries as q


def test_hill_tail_pareto_like():
    # 102 orders: prices 2^(i/20) dollars spread a clean exponential
    # tail; recompute the exact floored-log sum by hand
    prices = [math.pow(2, i / 20) for i in range(102)]
    df = pd.DataFrame({"o_totalprice": prices})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["hill_tail"](d).to_pandas()
    cents = sorted((int(math.floor(p * 100)) for p in prices),
                   reverse=True)
    xk1 = cents[100]
    s = sum(int(math.floor(1000000 * math.log(x / xk1)))
            for x in cents[:100])
    r = out.iloc[0]
    assert (r.k, r.threshold_cents, r.sum_ln_micro) == (100, xk1, s)
    assert r.alpha_micro == (1_000_000_000_000 * 100) // s


def test_shannon_code_lengths():
    # corpus "aaab": n(a)=3, n(b)=1, N=4: len(a)=ceil(ln(4/3)/ln2)=1,
    # len(b)=ceil(ln4/ln2)=2
    df = pd.DataFrame({"doc_id": [0], "source": ["s"],
                       "text": ["aaab"]})
    df["lang"] = "en"
    df["n_chars"] = 4
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        out = q.QUERIES["shannon_code"](d).to_pandas()
    got = {r.c: (r.n, r.len_bits, r.bits_total)
           for r in out.itertuples()}
    assert got == {"a": (3, 1, 3), "b": (1, 2, 2)}


def test_psi_drift_shifted_distribution():
    # days 0..3 (split at day 2): early orders cheap (bin 0), late
    # orders expensive (bin 9) plus overlap in bin 0
    early = [("2024-01-01", 10.0)] * 8 + [("2024-01-02", 10.0)] * 2
    late = [("2024-01-03", 99.0)] * 6 + [("2024-01-04", 10.0)] * 4
    df = pd.DataFrame(early + late,
                      columns=["o_orderdate", "o_totalprice"])
    df["o_orderdate"] = pd.to_datetime(df["o_orderdate"])
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["psi_drift"](d).to_pandas()
    # mp = 99 -> bin = p*10//100: 10 -> bin 1, 99 -> bin 9
    # bin 1: n_a=10, n_b=4 (both >0, term negative); bin 9: n_a=0 -> skip
    assert list(out["bin"]) == [1]
    r = out.iloc[0]
    assert (r.n_a, r.n_b) == (10, 4)
    lnr = math.log((4 * 10) / (10 * 10))
    assert r.term_micro == math.floor(
        1000000 * ((4 / 10 - 10 / 10) * lnr))

"""Round-5 session-58k: predicate-selectivity audit, Pearson matrix,
variance-ratio test — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import dug_ray.queries as q


def test_selectivity_audit_correlated_predicates():
    # 4 rows; P1 (R) on rows 0,1; P2 (F) on rows 0,1 (perfectly
    # correlated with P1); P3 (qty>=25) on row 0 only
    df = pd.DataFrame({
        "l_returnflag": ["R", "R", "N", "N"],
        "l_linestatus": ["F", "F", "O", "O"],
        "l_quantity": [30.0, 10.0, 30.0, 10.0],
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "lineitem.parquet"))
        out = q.QUERIES["selectivity_audit"](d).to_pandas()
    g = {r.combo: (r.n_actual, r.est_ppm, r.actual_ppm, r.err_ppm)
         for r in out.itertuples()}
    # rf_ls: est = 0.5*0.5 = 250000, actual = 500000 (correlated!)
    assert g["rf_ls"] == (2, 250000, 500000, 250000)
    # rf_qty: est = 0.5*0.5, actual = 1/4
    assert g["rf_qty"] == (1, 250000, 250000, 0)
    est3 = math.floor(1000000 * (1.0 * (2 / 4) * (2 / 4) * (2 / 4)))
    assert g["rf_ls_qty"] == (1, est3, 250000, abs(est3 - 250000))


def test_pearson_matrix_perfect_and_zero():
    # qty = [1,2,3,4]; price doubles qty exactly -> r = 1;
    # disc constant-ish alternating avoids zero variance
    df = pd.DataFrame({
        "l_quantity": [1.0, 2.0, 3.0, 4.0],
        "l_extendedprice": [2.0, 4.0, 6.0, 8.0],
        "l_discount": [0.001, 0.002, 0.001, 0.002],
        "l_tax": [0.002, 0.001, 0.002, 0.001],
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "lineitem.parquet"))
        out = q.QUERIES["pearson_matrix"](d).to_pandas()
    g = {(r.col_a, r.col_b): r.r_micro for r in out.itertuples()}

    def r_micro(xs, ys):
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(v * v for v in xs)
        syy = sum(v * v for v in ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        r = (n * sxy - sx * sy) / (
            math.sqrt(float(n * sxx - sx * sx))
            * math.sqrt(float(n * syy - sy * sy)))
        return math.floor(1000000 * r)

    # perfect correlation floors to 999999 when the sqrt product lands
    # a hair above the numerator — the exact mirrored expression decides
    exp_qp = r_micro([1, 2, 3, 4], [2, 4, 6, 8])
    assert g[("qty", "price")] == exp_qp
    assert exp_qp in (999999, 1_000_000)
    # disc vs tax: milli values [1,2,1,2] vs [2,1,2,1] -> r = -1
    exp_dt = r_micro([1, 2, 1, 2], [2, 1, 2, 1])
    assert g[("disc", "tax")] == exp_dt
    assert exp_dt in (-1_000_000, -999999)
    assert len(g) == 6


def test_variance_ratio_random_walkish():
    # daily counts 10,11,10,11,10,11,10,11: d1 = ±1 (mean 0ish),
    # d5 = ±1; hand-replicate the exact integer-sum formula
    xs = [10, 11, 10, 11, 10, 11, 10, 11]
    dates = sum(([f"2024-01-{i + 1:02d}"] * x
                 for i, x in enumerate(xs)), [])
    df = pd.DataFrame({"o_orderdate": pd.to_datetime(dates)})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["variance_ratio"](d).to_pandas()
    d1 = [b - a for a, b in zip(xs, xs[1:])]
    dk = [b - a for a, b in zip(xs, xs[5:])]
    n1, nk = len(d1), len(dk)
    s1, s1_2 = sum(d1), sum(v * v for v in d1)
    sk, sk_2 = sum(dk), sum(v * v for v in dk)
    var1 = (n1 * s1_2 - s1 * s1) / (n1 * n1)
    vark = (nk * sk_2 - sk * sk) / (nk * nk)
    exp = math.floor(1000000 * (vark / (5 * var1)))
    r = out.iloc[0]
    assert (r.n_1, r.n_k, r.vr_micro) == (n1, nk, exp)

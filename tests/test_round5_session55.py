"""Round-5 session-55: hubness, diff-in-diff, dominant period —
hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import dug_ray.queries as q


def test_hubness_complete_graph_case():
    # 4 vectors, K=3 -> every vector is in every other's top-3
    emb = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(
            [[1.0, 0.0], [1.0, 0.01], [0.0, 1.0], [-1.0, 0.0]],
            pa.list_(pa.float32()))})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(emb, os.path.join(d, "embeddings.parquet"))
        out = q.QUERIES["hubness_audit"](d).to_pandas()
    got = {r.k_occ: r.n_vectors for r in out.itertuples()}
    assert got == {3: 4}


def _events_by_day(day_counts):
    days = [d for d, c in day_counts.items() for _ in range(c)]
    return pd.DataFrame({"ts": pd.to_datetime(days, unit="D")})


def test_diff_in_diff_weekend_lift_change():
    # span 0..6, mid 3; weekend days 2,3; day2=4, day3=8, rest 1
    ev = _events_by_day({0: 1, 1: 1, 2: 4, 3: 8, 4: 1, 5: 1, 6: 1})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(ev),
                       os.path.join(d, "events.parquet"))
        out = q.QUERIES["diff_in_diff"](d).to_pandas()
    assert out.iloc[0].to_dict() == {
        "m_h1_wd": 1000, "m_h1_we": 4000, "m_h2_wd": 1000,
        "m_h2_we": 8000, "did_milli": 4000}


def test_dominant_period_three_day_cycle():
    # [5,1,1] x 3 -> lag 3 wins, r = 1728/2592 = 666666 ppm
    counts = {dd: (5 if dd % 3 == 0 else 1) for dd in range(9)}
    ev = _events_by_day(counts)
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(ev),
                       os.path.join(d, "events.parquet"))
        out = q.QUERIES["dominant_period"](d).to_pandas()
    assert out.iloc[0].to_dict() == {
        "n_days": 9, "best_lag": 3, "r_ppm": 666666}

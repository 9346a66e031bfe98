"""Round-5 session-95: first-mention bias, L-moments, Hoover index —
hand-computed pins."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_first_mention_bias_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s95fm_")
    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a b a", "x y"],
        "lang": ["en", "en"], "source": ["s", "s"],
        "n_chars": [5, 3]})
    df.to_parquet(os.path.join(d, "documents.parquet"))
    out = q.QUERIES["first_mention_bias"](d).to_pandas() \
        .set_index("cls")
    # repeated: only 'a' at rel 0; hapax: b@500, x@0, y@1000
    assert (int(out.loc["repeated", "n"]),
            int(out.loc["repeated", "mean_pos_milli"])) == (1, 0)
    assert (int(out.loc["hapax", "n"]),
            int(out.loc["hapax", "mean_pos_milli"])) == (3, 500)


def test_l_moments_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s95lm_")
    pd.DataFrame({"o_totalprice": [1.00, 2.00, 4.00]}).to_parquet(
        os.path.join(d, "orders.parquet"))
    out = q.QUERIES["l_moments"](d).to_pandas().iloc[0]
    # dollars [1,2,4]: B1=10, B2=4; l2 = 1 exactly, tau3 = 1/3
    assert (int(out["n"]), int(out["l1_milli"]),
            int(out["l2_milli"]), int(out["t3_milli"])) \
        == (3, 2333, 1000, 333)


def test_hoover_hand_pin():
    import dug_ray.queries as q
    d = tempfile.mkdtemp(prefix="s95hv_")
    pd.DataFrame({"o_totalprice": [1.00, 2.00, 6.00]}).to_parquet(
        os.path.join(d, "orders.parquet"))
    out = q.QUERIES["hoover_index"](d).to_pandas().iloc[0]
    # cents [100,200,600]: num = 600+300+900 = 1800
    assert (int(out["n"]), int(out["hoover_ppm"])) == (3, 333_333)

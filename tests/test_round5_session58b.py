"""Round-5 session-58b: Dunning G² collocations, Harman S-stemmer
vocabulary reduction, Page–Hinkley drift — hand-computed pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import dug_ray.queries as q


def _write_docs(d, rows):
    df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    df["lang"] = "en"
    df["n_chars"] = df["text"].str.len()
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "documents.parquet"))


def test_dunning_llr_hand_contingency():
    # bigrams: doc0 -> (a b), (b a), (a b); doc1 -> (c d). N=4.
    # "a b": k11=2, r1=2, c1=2 -> k12=k21=0, k22=2;
    # G2 = 2*(2 ln(8/4) + 0 + 0 + 2 ln(8/4)) = 8 ln 2
    rows = [(0, "s", "a b a b"), (1, "s", "c d")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["dunning_llr"](d).to_pandas()
    assert list(out["bigram"])[:1] == ["a b"]
    r = out.iloc[0]
    assert (r.n, r.r1, r.c1) == (2, 2, 2)
    c = 2 * math.log(2 * 4 / (2 * 2))
    assert r.g2_micro == math.floor(1000000 * 2 * (c + 0.0 + 0.0 + c))
    # the singleton bigrams: k11=1 r1=1 c1=1 k22=3 -> 2*(ln4 + 3 ln(4/3))
    s = out[out["bigram"] == "c d"].iloc[0]
    exp = math.floor(1000000 * 2 * (
        1 * math.log(1 * 4 / (1 * 1)) + 0.0 + 0.0
        + 3 * math.log(3 * 4 / (3 * 3))))
    assert s.g2_micro == exp


def test_sstem_vocab_harman_rules():
    # cities->city (merges with raw "city"), goes->goe, runs->run,
    # bus/press unchanged (us/ss guards): 6 types -> 5 stems
    rows = [(0, "s", "cities goes runs bus press city")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["sstem_vocab"](d).to_pandas()
    r = out.iloc[0]
    assert (r.n_types, r.n_stems, r.merged, r.reduction_ppm) == \
        (6, 5, 1, 166666)


def test_page_hinkley_mean_shift_alarm():
    # daily counts 10, 10, 100: dev = -500, -500, +59500 milli;
    # cum = -500, -1000, 58500; running min -1000 -> ph = 0, 0, 59500
    dates = (["2024-01-01"] * 10 + ["2024-01-02"] * 10
             + ["2024-01-03"] * 100)
    df = pd.DataFrame({"o_orderdate": pd.to_datetime(dates)})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["page_hinkley"](d).to_pandas()
    assert list(out["x"]) == [10, 10, 100]
    assert list(out["cum_milli"]) == [-500, -1000, 58500]
    assert list(out["ph_milli"]) == [0, 0, 59500]
    assert list(out["alarm"]) == [0, 0, 1]

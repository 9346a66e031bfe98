"""Round-5 session-18: RRF fusion, Cohen's kappa."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_rrf_union_semantics_and_sentinels():
    import dug_ray.queries as q
    # doc 1 contains both terms, doc 2 only 'fast', doc 3 only 'sort'
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["fast sort", "fast x", "sort y"],
        "lang": ["en"] * 3, "source": ["s"] * 3, "n_chars": [9, 6, 6]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        out = (q.QUERIES["rrf_fusion"](d).to_pandas()
               .set_index("doc_id"))
    assert set(out.index) == {1, 2, 3}
    r1 = out.loc[1]
    assert r1["rank_fast"] >= 1 and r1["rank_sort"] >= 1
    assert r1["rrf"] == 1.0 / (60.0 + r1["rank_fast"]) \
        + 1.0 / (60.0 + r1["rank_sort"])
    r2 = out.loc[2]
    assert r2["rank_sort"] == -1
    assert r2["rrf"] == 1.0 / (60.0 + r2["rank_fast"])
    r3 = out.loc[3]
    assert r3["rank_fast"] == -1


def test_langid_kappa_perfect_agreement_is_million():
    # direct formula check on a synthetic confusion matrix via the same
    # integer identity the query uses
    def kappa_ppm(cm):
        n = sum(cm.values())
        agree = sum(v for (a, b), v in cm.items() if a == b)
        classes = {c for k in cm for c in k}
        row = {c: sum(v for (a, _), v in cm.items() if a == c)
               for c in classes}
        col = {c: sum(v for (_, b), v in cm.items() if b == c)
               for c in classes}
        s = sum(row[c] * col[c] for c in classes)
        num, den = (n * agree - s) * 1_000_000, n * n - s
        return num // den if num >= 0 else -((-num) // den)

    assert kappa_ppm({("en", "en"): 10, ("fr", "fr"): 10}) == 1_000_000
    # chance-level agreement -> kappa 0
    assert kappa_ppm({("en", "en"): 5, ("en", "fr"): 5,
                      ("fr", "en"): 5, ("fr", "fr"): 5}) == 0
    # worse than chance -> negative, truncated toward zero
    assert kappa_ppm({("en", "fr"): 10, ("fr", "en"): 10}) == -1_000_000

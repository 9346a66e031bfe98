"""Round-5 session-10: rank distributions, Z-order keys, langid
confusion, association rules."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(d, name, df):
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, f"{name}.parquet"))


def test_length_percentile_tie_aware():
    import dug_ray.queries as q
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "lang": ["en"] * 4,
        "text": [""] * 4, "source": ["s"] * 4,
        "n_chars": [10, 20, 20, 30]})
    with tempfile.TemporaryDirectory() as d:
        _write(d, "documents", df)
        out = (q.QUERIES["length_percentile"](d).to_pandas()
               .set_index("doc_id"))
    # percent_rank = strictly-smaller / (n-1); cume_dist = <= / n
    assert out.loc[1, "pr_milli"] == 0
    assert out.loc[2, "pr_milli"] == (1 * 1000) // 3
    assert out.loc[3, "pr_milli"] == (1 * 1000) // 3  # tie shares rank
    assert out.loc[4, "pr_milli"] == 1000
    assert out.loc[1, "cd_milli"] == 250
    assert out.loc[2, "cd_milli"] == 750  # ties count together
    assert out.loc[4, "cd_milli"] == 1000


def test_zorder_interleaves_bits():
    import dug_ray.queries as q
    df = pd.DataFrame({
        "event_id": [1, 2],
        "user_id": [0b101, 0b11],
        "ts": [pd.Timestamp("2024-01-03"), pd.Timestamp("2024-01-01")],
        "event_type": ["v", "v"], "value": [0.0, 0.0], "props": ["", ""]})
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", df)
        out = (q.QUERIES["zorder_keys"](d).to_pandas()
               .set_index("event_id"))

    def morton(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert out.loc[1, "zval"] == morton(0b101, 3)
    assert out.loc[2, "zval"] == morton(0b11, 1)
    assert out.loc[1, "zbucket"] == out.loc[1, "zval"] >> 8


def test_assoc_rules_support_confidence_lift():
    import dug_ray.queries as q
    # users: 1 {a,b}, 2 {a,b}, 3 {a}, 4 {b,c}
    rows = [(1, "a"), (1, "b"), (1, "a"),  # duplicate a collapses
            (2, "a"), (2, "b"), (3, "a"), (4, "b"), (4, "c")]
    df = pd.DataFrame(rows, columns=["user_id", "event_type"])
    df["event_id"] = range(len(df))
    df["ts"] = pd.Timestamp("2024-01-01")
    df["value"] = 0.0
    df["props"] = ""
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", df)
        out = q.QUERIES["assoc_rules"](d).to_pandas()
    r = {(x.ante, x.cons): x for x in out.itertuples()}
    ab = r[("a", "b")]
    # supp(a,b)=2, supp(a)=3, supp(b)=3, n_users=4
    assert ab.supp == 2
    assert ab.conf_milli == (2 * 1000) // 3
    assert ab.lift_ppm == (2 * 1_000_000 * 4) // (3 * 3)
    assert ("a", "c") not in r  # never co-occur
    bc = r[("b", "c")]
    assert bc.supp == 1 and bc.conf_milli == (1 * 1000) // 3

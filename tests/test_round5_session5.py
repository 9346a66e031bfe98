"""Round-5 session-5: unpivot round-trip, order-independence of
table_checksum, and the SCD2 interval contract."""

from __future__ import annotations

import pandas as pd
import ray.data

from dug_ray.stages.integrity import table_checksum
from dug_ray.stages.rollup import unpivot


def test_unpivot_melts_wide_to_long():
    wide = pd.DataFrame({"id": [1, 2], "a": [10, 20], "b": [30, 40]})
    out = unpivot(ray.data.from_pandas(wide), ["id"], ["a", "b"]) \
        .to_pandas().sort_values(["id", "measure"]).reset_index(drop=True)
    assert len(out) == 4
    assert out.loc[(out["id"] == 2) & (out["measure"] == "b"),
                   "value"].iloc[0] == 40
    # melt preserves every (id, measure) cell exactly once
    assert set(zip(out["id"], out["measure"])) == \
        {(1, "a"), (1, "b"), (2, "a"), (2, "b")}


def test_table_checksum_order_and_partition_independent():
    df = pd.DataFrame({
        "grp": ["x", "x", "y", "x", "y"],
        "a": [1, 2, 3, 4, 5],
        "b": ["p", "q", "r", "s", "t"],
    })
    shuffled = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
    one = table_checksum(ray.data.from_pandas(df), "grp", ["a", "b"],
                         num_buckets=2).to_pandas()
    # different row order AND different block split must give the same sums
    two = table_checksum(
        ray.data.from_pandas(shuffled).repartition(3), "grp", ["a", "b"],
        num_buckets=4).to_pandas()
    m1 = one.set_index("grp").sort_index()
    m2 = two.set_index("grp").sort_index()
    pd.testing.assert_frame_equal(m1, m2)
    assert m1.loc["x", "n_rows"] == 3 and m1.loc["y", "n_rows"] == 2
    # a single changed cell changes the group checksum
    df2 = df.copy()
    df2.loc[0, "b"] = "P"
    three = table_checksum(ray.data.from_pandas(df2), "grp", ["a", "b"],
                           num_buckets=2).to_pandas().set_index("grp")
    assert three.loc["x", "checksum"] != m1.loc["x", "checksum"]
    assert three.loc["y", "checksum"] == m1.loc["y", "checksum"]
